package graft.glove

import graft.text.{Cooc, Cooccurrence, Vocabulary}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** GloVe distributed trainer (SURVEY T-6; Pennington/Socher/Manning,
  * EMNLP 2014). Minimizes
  *
  *   J = Σ_{ij} f(X_ij) (wᵢᵀw̃ⱼ + bᵢ + b̃ⱼ − ln X_ij)²,
  *   f(x) = (x/xMax)^alpha for x < xMax else 1
  *
  * with AdaGrad, over the sparse co-occurrence matrix built by
  * [[graft.text.Cooccurrence]]. Defaults follow the canonical toolkit:
  * xMax=100, alpha=0.75, lr=0.05, output = W + W̃.
  *
  * Execution model (SURVEY §3 entry 3):
  *  - vocab + co-occurrence are ordinary Spark jobs (tokenize → count →
  *    flatMap kernel → reduce), the matrix cached MEMORY_AND_DISK;
  *  - each training iteration broadcasts current parameters, computes
  *    per-partition AdaGrad updates locally (Hogwild-style local SGD over
  *    each partition's records), then `treeAggregate`s parameter deltas
  *    back to the driver where they are averaged and applied.
  *
  * Determinism: seeded init, fixed partitioning and sorted records per
  * partition make a run bit-reproducible for a fixed parallelism (SURVEY
  * §5.3 — quality gates, not hash gates: reduction order of floats is
  * parallelism-dependent by design).
  *
  * Scale path: this broadcast loop carries 2·V·(dim+1) floats per
  * iteration — fine to V ≈ a few 100k. For larger vocabularies use
  * [[GloveBlockTrainer]] (parameters stay distributed; each iteration is
  * a join-exchange expressed in the DataFrame API).
  */
class Glove(
    val dim: Int = 50,
    val window: Int = 5,
    val minCount: Long = 5,
    val xMax: Double = 100.0,
    val alpha: Double = 0.75,
    val learningRate: Double = 0.05,
    val iterations: Int = 25,
    val numPartitions: Int = 32,
    val seed: Long = 42L,
    /** None = auto: broadcast while 2·V·(dim+1) parameters fit
      * comfortably (< ~16M doubles ≈ 128 MB); block-partitioned
      * ([[GloveBlockTrainer]]) beyond. Some(true/false) forces a path.
      */
    val distributed: Option[Boolean] = None,
    /** Canonical `--symmetric` flag: false = left-context-only windows. */
    val symmetric: Boolean = true,
    /** Canonical `--max-vocab`: keep only the top-N ranked words. */
    val maxVocab: Option[Long] = None,
    /** Canonical distance semantics: OOV tokens still occupy window
      * distance (Cooccurrence.distanceOverOriginalPositions). Default
      * false = distances re-measured over kept tokens.
      */
    val distanceOverOriginalPositions: Boolean = false) extends Serializable {

  /** Hyperparameters persisted with the model (GloveModel.save/load). */
  private def trainParams: Map[String, String] = Map(
    "window" -> window.toString, "minCount" -> minCount.toString,
    "xMax" -> xMax.toString, "alpha" -> alpha.toString,
    "learningRate" -> learningRate.toString,
    "iterations" -> iterations.toString, "seed" -> seed.toString,
    "symmetric" -> symmetric.toString,
    "maxVocab" -> maxVocab.map(_.toString).getOrElse(""),
    "distanceOverOriginalPositions" -> distanceOverOriginalPositions.toString)

  def fit(documents: DataFrame, textCol: String = "text"): GloveModel = {
    val spark = documents.sparkSession
    import spark.implicits._

    // Stage 1: vocabulary (dense 0-based ids by count desc, word asc).
    val vocabDf = Vocabulary.build(documents, minCount, textCol, maxVocab)
    val v = vocabDf.count().toInt
    require(v > 0, s"empty vocabulary (minCount=$minCount)")

    val useBlock = distributed.getOrElse(2L * v * (dim + 1) > 16_000_000L)
    if (useBlock) {
      // Large-V path: the vocabulary NEVER touches the driver — tokens
      // are mapped to ids by join (Cooccurrence.matrixViaJoin) and
      // parameters stay distributed (GloveBlockTrainer).
      val vocab0 = vocabDf
        .select(col("w"), (col("id") - 1).cast("int").as("id0"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val docsWithId = documents.withColumn("__gid", monotonically_increasing_id())
      val cooc: Dataset[Cooc] = Cooccurrence
        .matrixViaJoin(docsWithId, vocab0, window, "__gid", textCol, symmetric,
          distanceOverOriginalPositions)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val trainer = new GloveBlockTrainer(dim, xMax, alpha, learningRate,
        iterations, numPartitions, seed)
      val (vecs, lossHistory) = trainer.train(cooc, v)
      cooc.unpersist()
      val embeddings = vocab0
        .join(vecs, vocab0("id0") === vecs("id"))
        .select(col("w").as("word"), col("id"), col("vec"))
      vocab0.unpersist()
      new GloveModel(embeddings, dim, lossHistory, trainParams)
    } else {
      // Small-V path: broadcast vocabulary + flatMap kernel.
      val vocabRows = vocabDf.select("w", "id").as[(String, Long)].collect()
      val vocab: Map[String, Int] = vocabRows.map { case (w, id) => (w, id.toInt - 1) }.toMap
      val words: Array[String] = {
        val arr = new Array[String](vocab.size)
        vocab.foreach { case (w, i) => arr(i) = w }
        arr
      }

      // Stage 2: co-occurrence matrix, partitioned deterministically and
      // sorted within partitions so local SGD order is reproducible.
      // (Stage 3 of the canonical toolkit — `shuffle` — is subsumed by
      // the hash repartition itself.)
      val cooc: Dataset[Cooc] = Cooccurrence.matrix(documents, vocab, window,
          textCol, symmetric, distanceOverOriginalPositions)
        .repartition(numPartitions, col("i"), col("j"))
        .sortWithinPartitions("i", "j")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nnz = cooc.count() // materialize
      // Stage 4 (small V): broadcast + per-partition AdaGrad + delta merge.
      val trained = GloveTrainer.train(
        cooc, v, dim, xMax, alpha, learningRate, iterations, seed)
      cooc.unpersist()

      // Output vectors: W + W̃ (GloVe §4.2).
      val out = (0 until v).map { i =>
        val vec = new Array[Float](dim)
        var k = 0
        while (k < dim) {
          vec(k) = (trained.wMain(i * dim + k) + trained.wCtx(i * dim + k)).toFloat
          k += 1
        }
        (words(i), i, vec)
      }
      val embeddings = spark.createDataFrame(out).toDF("word", "id", "vec")
      new GloveModel(embeddings, dim, trained.lossHistory, trainParams)
    }
  }
}

/** Final parameters + loss telemetry from a training run. */
private[glove] case class TrainedParams(
    wMain: Array[Double], wCtx: Array[Double],
    bMain: Array[Double], bCtx: Array[Double],
    lossHistory: Seq[Double])

private[glove] object GloveTrainer {

  /** Broadcast + per-partition local AdaGrad + treeAggregate of deltas. */
  def train(
      cooc: Dataset[Cooc], v: Int, dim: Int,
      xMax: Double, alpha: Double, lr: Double,
      iterations: Int, seed: Long): TrainedParams = {

    val sc = cooc.sparkSession.sparkContext
    val rng = new java.util.Random(seed)
    val scale = 0.5 / dim
    def init(n: Int): Array[Double] = Array.fill(n)((rng.nextDouble() - 0.5) * scale)

    var wMain = init(v * dim); var wCtx = init(v * dim)
    var bMain = new Array[Double](v); var bCtx = new Array[Double](v)
    // AdaGrad squared-gradient accumulators (init 1.0, as in the canonical
    // toolkit, so the first step size is exactly lr).
    var gwMain = Array.fill(v * dim)(1.0); var gwCtx = Array.fill(v * dim)(1.0)
    var gbMain = Array.fill(v)(1.0); var gbCtx = Array.fill(v)(1.0)

    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    val coocRdd = cooc.rdd // cached parent; rdd reuse is cheap

    var it = 0
    while (it < iterations) {
      val bW = sc.broadcast((wMain, wCtx, bMain, bCtx, gwMain, gwCtx, gbMain, gbCtx))
      // Each partition: copy params, run sequential AdaGrad over its
      // records, emit (delta, weight=#records, loss).
      val agg = coocRdd.mapPartitions { iter =>
        val (w1, w2, b1, b2, g1, g2, gb1, gb2) = bW.value
        val lw1 = w1.clone(); val lw2 = w2.clone()
        val lb1 = b1.clone(); val lb2 = b2.clone()
        val lg1 = g1.clone(); val lg2 = g2.clone()
        val lgb1 = gb1.clone(); val lgb2 = gb2.clone()
        var n = 0L; var loss = 0.0
        iter.foreach { c =>
          val i = c.i; val j = c.j
          val f = if (c.x < xMax) math.pow(c.x / xMax, alpha) else 1.0
          var dotv = lb1(i) + lb2(j)
          var k = 0
          val oi = i * dim; val oj = j * dim
          while (k < dim) { dotv += lw1(oi + k) * lw2(oj + k); k += 1 }
          val diff = dotv - math.log(c.x)
          val fdiff = f * diff
          loss += 0.5 * fdiff * diff
          // AdaGrad updates (clip fdiff like the canonical toolkit to
          // keep early iterations stable).
          val g = if (fdiff > 100.0) 100.0 else if (fdiff < -100.0) -100.0 else fdiff
          k = 0
          while (k < dim) {
            val gi = g * lw2(oj + k); val gj = g * lw1(oi + k)
            lg1(oi + k) += gi * gi; lg2(oj + k) += gj * gj
            lw1(oi + k) -= lr * gi / math.sqrt(lg1(oi + k))
            lw2(oj + k) -= lr * gj / math.sqrt(lg2(oj + k))
            k += 1
          }
          lgb1(i) += g * g; lgb2(j) += g * g
          lb1(i) -= lr * g / math.sqrt(lgb1(i))
          lb2(j) -= lr * g / math.sqrt(lgb2(j))
          n += 1L
        }
        // Delta vs broadcast state, packed in one array to aggregate once.
        val d = new Array[Double](2 * w1.length + 2 * b1.length +
          2 * g1.length + 2 * gb1.length)
        var p = 0
        def pack(local: Array[Double], base: Array[Double]): Unit = {
          var q = 0
          while (q < base.length) { d(p) = local(q) - base(q); p += 1; q += 1 }
        }
        pack(lw1, w1); pack(lw2, w2); pack(lb1, b1); pack(lb2, b2)
        pack(lg1, g1); pack(lg2, g2); pack(lgb1, gb1); pack(lgb2, gb2)
        Iterator.single((d, n, loss, if (n > 0) 1L else 0L))
      }.treeReduce { (a, b) =>
        val (da, na, la, pa) = a; val (db, nb, lb, pb) = b
        var q = 0
        while (q < da.length) { da(q) += db(q); q += 1 }
        (da, na + nb, la + lb, pa + pb)
      }
      bW.destroy()

      // Average deltas over the partitions that actually did work
      // (empty partitions contribute a zero delta and must not dilute).
      val (sumDelta, totalN, totalLoss, nonEmpty) = agg
      val inv = 1.0 / math.max(1L, nonEmpty)
      var p = 0
      def unpack(base: Array[Double]): Unit = {
        var q = 0
        while (q < base.length) { base(q) += sumDelta(p) * inv; p += 1; q += 1 }
      }
      unpack(wMain); unpack(wCtx); unpack(bMain); unpack(bCtx)
      unpack(gwMain); unpack(gwCtx); unpack(gbMain); unpack(gbCtx)
      losses += (if (totalN == 0) 0.0 else totalLoss / totalN)
      it += 1
    }
    TrainedParams(wMain, wCtx, bMain, bCtx, losses.toSeq)
  }
}
