package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkFixture {

  private lazy val docs = Tables.table(spark, sf001, "documents")

  /** UNTRUNCATED exact near-dup ground truth with Q24 semantics
    * (token-set Jaccard >= threshold, |n_a−n_b| <= 1, one side >= 30
    * tokens). Q24 itself LIMITs 50, so it cannot serve as a subset
    * oracle here.
    */
  private def exactPairsAbove(threshold: Double): Set[(Long, Long)] = {
    val d = docs.select(
      col("doc_id"),
      array_distinct(split(col("text"), " ")).as("s"),
      size(split(col("text"), " ")).as("n"))
    val a = d.as("a"); val b = d.as("b")
    val jac = size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
      size(array_union(col("a.s"), col("b.s")))
    a.join(b, col("a.doc_id") < col("b.doc_id") && abs(col("a.n") - col("b.n")) <= 1)
      .filter(jac >= threshold && (col("a.n") >= 30 || col("b.n") >= 30))
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private lazy val exactHalf: Set[(Long, Long)] = exactPairsAbove(0.5)

  test("exact dedup: keeper assignment flags content duplicates") {
    val out = Dedup.exactAssignKeepers(docs).cache()
    assert(out.count() == docs.count())
    // keeper of a keeper is itself; is_dup consistent with keeper
    assert(out.filter((col("doc_id") === col("keeper")) === col("is_dup")).count() == 0)
    // synthetic duplicates (same text, new ids) dedup to the original id
    val dup = docs.limit(5).union(
      docs.limit(5).withColumn("doc_id", col("doc_id") + 100000))
    val dd = Dedup.exactAssignKeepers(dup)
    assert(dd.filter(col("is_dup")).count() == 5)
    assert(dd.filter(col("is_dup")).select(max("keeper")).collect()(0).getLong(0) < 100000)
    assert(dd.filter(col("group_size") === 2).count() == 10)
  }

  test("MinHash-LSH + recheck reproduces the exact near-dup pair set (untruncated)") {
    // candidates + recheck with Q24 predicates but NO limit, against the
    // exact all-pairs ground truth — this is the load-bearing recall
    // property that justifies sharing Q24's oracle.
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
      bands = 64, rowsPerBand = 2)
    val sets = docs.select(
      col("doc_id"),
      array_distinct(split(col("text"), " ")).as("s"),
      size(split(col("text"), " ")).as("n"))
    val jac = size(array_intersect(col("sa"), col("sb"))).cast("double") /
      size(array_union(col("sa"), col("sb")))
    val found = cands
      .join(sets.select(col("doc_id").as("id_a"), col("s").as("sa"), col("n").as("na")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("s").as("sb"), col("n").as("nb")), "id_b")
      .filter(abs(col("na") - col("nb")) <= 1 &&
        (col("na") >= 30 || col("nb") >= 30) && jac >= 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == exactHalf,
      s"missed: ${(exactHalf -- found).take(5)}...; spurious: ${(found -- exactHalf).take(5)}")
  }

  test("band-group-sliced LSH candidates equal the single-join candidate set") {
    // the m100 working-set discipline: bands processed in eager groups
    // with per-group persist/unpersist. A pair qualifies iff SOME band
    // bucket matches, and band partitioning is exact, so the union of
    // per-group candidates must be SET-EQUAL to the single self-join —
    // forced here by a tiny row budget (docs × 64 bands ≫ 1000)
    val hset = sort_array(transform(
      array_distinct(split(col("text"), " ")), e => xxhash64(e)))
    def cands(target: Long): Set[(Long, Long)] =
      Dedup.minhashCandidatesFromHashedSets(docs, "doc_id", hset,
          bands = 64, rowsPerBand = 2, targetBandedRows = target)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = cands(Long.MaxValue)
    val sliced = cands(1000L)
    assert(single.nonEmpty)
    assert(sliced == single,
      s"missed: ${(single -- sliced).take(5)}; spurious: ${(sliced -- single).take(5)}")
  }

  test("set-graph nearDupComponents equals member-graph clustering over expanded pairs") {
    import org.apache.spark.sql.functions._
    val setCol = Dedup.tokenSet(col("text"))
    val viaSets = Dedup.nearDupComponents(docs, "doc_id", setCol,
        threshold = 0.5, bands = 64, rowsPerBand = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.minhashNearDupPairsFromSets(docs, "doc_id", setCol,
      threshold = 0.5, bands = 64, rowsPerBand = 2)
    val viaMembers = ConnectedComponents.components(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSets == viaMembers)
    assert(viaSets.nonEmpty, "fixture should contain near-dup clusters")
  }

  test("native minhash_signature is bit-equal to the composed HOF formulation") {
    graft.functions.GraftFunctions.register(spark)
    val hashed = docs.select(col("doc_id"),
      transform(array_distinct(split(col("text"), " ")), e => xxhash64(e)).as("set_"))
    val rows = hashed.orderBy("doc_id").select(
      call_function("minhash_signature", col("set_"), lit(32)).as("native"),
      transform(sequence(lit(0), lit(31)),
        i => array_min(transform(col("set_"), t => xxhash64(i, t)))).as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("native sorted_long_jaccard equals string-set Jaccard on all doc pairs") {
    graft.functions.GraftFunctions.register(spark)
    val d = docs.limit(60).select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("s"),
      sort_array(transform(array_distinct(split(col("text"), " ")),
        e => xxhash64(e))).as("hs"))
    val a = d.as("a"); val b = d.as("b")
    val strJac = size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
      size(array_union(col("a.s"), col("b.s")))
    val rows = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(strJac.as("sj"),
        call_function("sorted_long_jaccard", col("a.hs"), col("b.hs")).as("hj"))
      .collect()
    assert(rows.length == 60 * 59 / 2)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("native simhash64 is bit-equal to the relational tf-weighted formulation") {
    val rel = Dedup.simhash(docs).withColumnRenamed("simhash", "rel_sh")
    val nat = Dedup.simhashNative(docs).withColumnRenamed("simhash", "nat_sh")
    val joined = rel.join(nat, "doc_id").cache()
    assert(joined.count() == docs.count())
    assert(joined.filter(col("rel_sh") =!= col("nat_sh")).count() == 0)
  }

  test("SimHash: identical texts collide; precision 1.0 after recheck") {
    val sh = Dedup.simhash(docs.limit(20).union(
      docs.limit(20).withColumn("doc_id", col("doc_id") + 100000)))
    val byText = sh.withColumn("orig", col("doc_id") % 100000)
      .groupBy("orig").agg(countDistinct("simhash").as("n")).collect()
    assert(byText.forall(_.getLong(1) == 1), "same text must give same simhash")
    val out = ExtensionQueries.extSimhashNearDup(spark, sf001)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.nonEmpty)
    assert(out.subsetOf(exactHalf), s"false positives: ${out -- exactHalf}")
  }

  test("SimHash segmented candidates equal brute-force pairs at the same radius") {
    val sub = docs.limit(120)
    val sh = Dedup.simhash(sub).cache()
    val maxHam = 12
    val brute = {
      val a = sh.as("a"); val b = sh.as("b")
      a.join(b, col("a.doc_id") < col("b.doc_id"))
        .withColumn("ham", bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
        .filter(col("ham") <= maxHam)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val seg = Dedup.simhashCandidatesSegmented(sh, maxHam)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(seg == brute, s"missed: ${brute -- seg}; spurious: ${seg -- brute}")
  }

  test("shingles produce n-grams and handle short docs") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b c d"), (2L, "x y"), (3L, ""))).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L).isEmpty && got(3L).isEmpty)
  }

  test("n-gram near-dup detects suffix-append duplicates on a synthetic corpus") {
    // token-set Jaccard saturates on a small vocabulary (most long docs
    // share all words) — 3-gram shingles still discriminate. Build
    // originals + 'xx dup'-suffixed copies and require every copy pair
    // found at jac3 >= 0.4 while unrelated shuffled docs are not.
    val rng = new scala.util.Random(3L)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val originals = (0 until 30).map { i =>
      (i.toLong, (0 until 40).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val copies = originals.map { case (id, t) => (id + 1000L, t + " dup") }
    val corpus = spark.createDataFrame(originals ++ copies).toDF("doc_id", "text")
    val d = corpus.select(
      col("doc_id"),
      array_distinct(Dedup.shingles(col("text"), 3)).as("g"))
    val a = d.as("a"); val b = d.as("b")
    val jac3 = size(array_intersect(col("a.g"), col("b.g"))).cast("double") /
      size(array_union(col("a.g"), col("b.g")))
    val found = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .filter(jac3 >= 0.4)
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = originals.map { case (id, _) => (id, id + 1000L) }.toSet
    assert(planted.subsetOf(found), s"missed: ${planted -- found}")
  }

  test("containment finds planted subset pairs the symmetric metric misses") {
    // doc 100 is a strict subset of doc 1 (half its distinct tokens):
    // containment(100→1) = 1.0 while jaccard = 0.5 — below a 0.9
    // near-dup bar. Distinct filler tokens per doc keep other pairs out.
    val base = (0 until 40).map(i => s"w$i")
    val docs = spark.createDataFrame(Seq(
      (1L, base.mkString(" ")),                       // full set, 40 tokens
      (100L, base.take(28).mkString(" ")),            // subset, 28 tokens
      (2L, (0 until 40).map(i => s"x$i").mkString(" ")),
      (3L, (0 until 40).map(i => s"y$i").mkString(" "))))
      .toDF("doc_id", "text")
    val got = Dedup.containmentNearDups(docs, "doc_id",
        Dedup.tokenSet(col("text")), tau = 0.9, sizeRatio = 1.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((100L, 1L, 1.0)), s"got $got")
    // sanity: the pair's Jaccard is 28/40 = 0.7 — a 0.9 Jaccard pass
    // would indeed have missed it
    assert(28.0 / 40.0 < 0.9)
  }
}
