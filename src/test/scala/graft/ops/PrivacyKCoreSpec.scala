package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivacyKCoreSpec extends AnyFunSuite with SparkFixture {

  test("kAnonymize suppresses rare quasi-identifier groups, keeps common ones intact") {
    import spark.implicits._
    val df = (Seq.fill(5)(("US", "A")) ++ Seq.fill(3)(("US", "B")) ++
      Seq.fill(1)(("FR", "A"))).zipWithIndex
      .map { case ((n, s), i) => (i.toLong, n, s) }
      .toDF("id", "nation", "seg")
    val got = Privacy.kAnonymize(df, Seq("nation", "seg"), k = 3)
    val groups = got.groupBy("nation", "seg").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(groups == Map(("US", "A") -> 5L, ("US", "B") -> 3L),
      s"rare (FR,A) must be suppressed, common kept whole: $groups")
    // every surviving group still satisfies k
    assert(groups.values.forall(_ >= 3))
  }

  test("basket rules: closed-form support/confidence/lift on a crafted basket set") {
    import spark.implicits._
    // 4 baskets: {x,y} {x,y} {x} {z} → c_xy=2, supp=0.5,
    // conf(x→y)=2/3, conf(y→x)=1, lift=2·4/(3·2)=4/3
    val b = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"),
      (4L, "z")).toDF("bk", "item")
    val got = Basket.associationRules(b, "bk", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == Set(("x", "y"), ("y", "x")))
    val (cab, supp, confXY, lift) = got(("x", "y"))
    assert(cab == 2L && supp == 0.5 && math.abs(confXY - 2.0 / 3) < 1e-12)
    assert(math.abs(lift - 4.0 / 3) < 1e-12)
    assert(got(("y", "x"))._3 == 1.0, "confidence is directional")
  }

  test("kCore peels a pendant chain but keeps the clique; converges to fixpoint") {
    import spark.implicits._
    // K4 clique {1,2,3,4} (degree 3 inside) + chain 4-5-6 hanging off
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    // k=3: round 1 peels 6 (deg 1) and 5 (deg 2); 4 has deg 4 and
    // stays; rounds 2-3 remove nothing more (fixpoint = the clique)
    val got = KCore.refine(edges, k = 3, rounds = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L))
    // one round is NOT enough when peeling cascades: k=2 on a pure
    // chain 1-2-3-4 peels ends one round at a time
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val chainE = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val oneRound = KCore.refine(chainE, k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    val twoRounds = KCore.refine(chainE, k = 2, rounds = 2)
      .collect().map(_.getLong(0)).toSet
    assert(oneRound == Set(2L, 3L) && twoRounds == Set.empty[Long],
      s"cascade: $oneRound then $twoRounds")
  }
}
