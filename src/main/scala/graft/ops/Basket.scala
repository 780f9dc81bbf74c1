package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-pair association rules (E-59) — market-basket analysis:
  * support, confidence and lift for every co-occurring item pair.
  * This is the order-2 slice of Apriori, which is where most practical
  * basket analyses stop (and the only slice that needs no iterative
  * candidate generation).
  *
  * Scale shape: the pair expansion is a self-join on the BASKET key —
  * O(k²) rows per basket, bounded by basket size, never a corpus-wide
  * cross (the umbrella plan gate would catch that). Item counts join
  * back on item keys; the basket count is a 1-row broadcast. Rules are
  * directional (a→b and b→a both emitted — confidence is asymmetric).
  */
object Basket {

  /** @param baskets rows of (basketCol, itemCol); duplicates collapse
    * @return (a, b, c_ab, support, confidence, lift)
    */
  def associationRules(baskets: DataFrame, basketCol: String,
      itemCol: String): DataFrame = {
    val b = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("item"))
      .distinct()
    val nB = b.select(countDistinct(col("bk")).as("n_baskets"))
    val itemCnt = b.groupBy("item").agg(count(lit(1)).as("c_item"))
    val pairs = b.select(col("bk"), col("item").as("a"))
      .join(b.select(col("bk"), col("item").as("b")), "bk")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    pairs
      .join(itemCnt.select(col("item").as("a"), col("c_item").as("c_a")), "a")
      .join(itemCnt.select(col("item").as("b"), col("c_item").as("c_b")), "b")
      .crossJoin(broadcast(nB))
      .select(col("a"), col("b"), col("c_ab"),
        (col("c_ab") / col("n_baskets")).as("support"),
        (col("c_ab") / col("c_a")).as("confidence"),
        (col("c_ab") * col("n_baskets") / (col("c_a") * col("c_b")))
          .as("lift"))
  }
}
