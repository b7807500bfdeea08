package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Hand-computed pins for the round-4 pipeline additions: substring
  * scrub, cross-group span overlap, context packing, quota rebalancing,
  * and the centroid-distance embedding outlier gate.
  */
class PackingAndScrubSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("scrubDupPassages deletes exactly the cross-doc span tokens") {
    val df = docs(
      1L -> "a b c d",  // "a b" occurs in docs 1 and 2 → scrub both
      2L -> "x a b y",
      3L -> "z z",      // intra-doc only: "z z" occurs in ONE doc
      4L -> "q",        // short docs are whole-doc spans: 4 and 5 are
      5L -> "q")        // duplicates → both scrub to empty
    val out = Contamination.scrubDupPassages(df, "doc_id", "text",
      n = 2, minDocs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(out == Set(
      (1L, 4L, 2L, "c d"),
      (2L, 4L, 2L, "x y"),
      (3L, 2L, 0L, "z z"),
      (4L, 1L, 1L, ""),
      (5L, 1L, 1L, "")))
  }

  test("scrubDupPassages keepFirst retains one copy per duplicated span") {
    val df = docs(
      1L -> "a b c d",  // keeper of "a b" (min doc id) → untouched
      2L -> "x a b y",  // loses "a b"
      3L -> "a b",      // whole-doc span "a b"? no — len==n? n=2: sliding
                        //  gives exactly "a b"; not the keeper → scrubbed
      4L -> "q",        // keeper of whole-doc span "q"
      5L -> "q")        // scrubbed
    val out = Contamination.scrubDupPassages(df, "doc_id", "text",
      n = 2, minDocs = 2, keepFirst = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(out == Set(
      (1L, 4L, 0L, "a b c d"),
      (2L, 4L, 2L, "x y"),
      (3L, 2L, 2L, ""),
      (4L, 1L, 0L, "q"),
      (5L, 1L, 1L, "")))
  }

  test("scrubDupPassages is partitioning-invariant") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Contamination.scrubDupPassages(df, "doc_id", "text", n = 8)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    assert(run(base) == run(base.repartition(7)))
    spark.catalog.clearCache()
  }

  test("scrubDupPassagesMaximal merges islands and applies min length") {
    // docs 1,2 share the 9-token passage "p1..p9": its 2-gram cover is
    // positions 1..9 in doc 1 (one island, len 9) and 3..11 in doc 2.
    // docs 3,4 share only the isolated 2-gram "b1 b2" (island len 2).
    val df = docs(
      1L -> "p1 p2 p3 p4 p5 p6 p7 p8 p9 u1 u2",
      2L -> "v1 v2 p1 p2 p3 p4 p5 p6 p7 p8 p9",
      3L -> "b1 b2 w1 w2 w3",
      4L -> "x1 b1 b2 x2 x3")
    def run(minLen: Int) = Contamination.scrubDupPassagesMaximal(
      df, "doc_id", "text", n = 2, minDocs = 2, minRepeatLen = minLen)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3)))
      .toMap
    // minLen 5: only the 9-token passage islands qualify
    val atFive = run(5)
    assert(atFive(1L) == (9L, "u1 u2"))
    assert(atFive(2L) == (9L, "v1 v2"))
    assert(atFive(3L) == (0L, "b1 b2 w1 w2 w3"))
    assert(atFive(4L) == (0L, "x1 b1 b2 x2 x3"))
    // minLen 2 (= n): every island qualifies — equals the cover scrub
    val atTwo = run(2)
    assert(atTwo(3L) == (2L, "w1 w2 w3"))
    assert(atTwo(4L) == (2L, "x1 x2 x3"))
    // minLen 10: even the long passage survives
    val atTen = run(10)
    assert(atTen(1L) == (0L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 u1 u2"))
  }

  test("property: 8-gram cover scrub removes a superset of the maximal " +
    "scrub at any minRepeatLen; equal at minRepeatLen <= n") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def removedMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3)))
        .toMap
    val cover = removedMap(Contamination.scrubDupPassages(
      base, "doc_id", "text", n = 8, minDocs = 2))
    val maxAt8 = removedMap(Contamination.scrubDupPassagesMaximal(
      base, "doc_id", "text", n = 8, minDocs = 2, minRepeatLen = 8))
    val maxAt16 = removedMap(Contamination.scrubDupPassagesMaximal(
      base, "doc_id", "text", n = 8, minDocs = 2, minRepeatLen = 16))
    assert(cover.keySet == maxAt8.keySet && cover.keySet == maxAt16.keySet)
    cover.foreach { case (id, (nRemCover, _)) =>
      // cover ⊇ maximal: the region filter can only retain MORE tokens
      assert(maxAt8(id)._1 <= nRemCover, s"doc $id at minLen 8")
      assert(maxAt16(id)._1 <= maxAt8(id)._1, s"doc $id monotone in minLen")
      // at minLen <= n, every island (min length >= the shortest dup
      // span) passes except sub-n whole-doc spans — those docs differ
      // only when a short doc's whole-text span is under 8 tokens
      if (maxAt8(id) != cover(id))
        assert(cover(id)._2.isEmpty || cover(id)._1 < 8L,
          s"doc $id: minLen-8 maximal differs from cover on a long doc")
    }
    assert(cover.exists { case (id, (nRem, _)) => nRem > maxAt16(id)._1 },
      "corpus has no island shorter than 16 — property vacuous")
    spark.catalog.clearCache()
  }

  test("scrub invariants on real docs: subsequence, keeper dominance") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val orig = base.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .toMap
    def run(keepFirst: Boolean) =
      Contamination.scrubDupPassages(base, "doc_id", "text", n = 8,
        minDocs = 2, keepFirst = keepFirst)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
    val boiler = run(keepFirst = false)
    val keepF = run(keepFirst = true)
    def isSubseq(sub: Array[String], sup: Array[String]): Boolean = {
      var i = 0
      sup.foreach { t => if (i < sub.length && sub(i) == t) i += 1 }
      i == sub.length
    }
    orig.foreach { case (id, toks) =>
      val (nb, rb, cb) = boiler(id)
      val (nk, rk, ck) = keepF(id)
      assert(nb == toks.length && nk == toks.length)
      assert(rb >= 0 && rb <= nb && rk >= 0 && rk <= nk)
      // clean text is always an order-preserving subsequence of the doc
      assert(isSubseq(cb.split(" ").filter(_.nonEmpty), toks))
      assert(isSubseq(ck.split(" ").filter(_.nonEmpty), toks))
      // the keeper form never removes more than the boilerplate form
      assert(rk <= rb, s"doc $id: keepFirst removed $rk > default $rb")
    }
    spark.catalog.clearCache()
  }

  test("lmFluencyScore: mean corpus bigram frequency, integer-exact") {
    val df = docs(1L -> "a b a b", 2L -> "a b", 3L -> "z")
    // corpus occurrences: "a b" x3 (two in doc1, one in doc2), "b a" x1,
    // whole-doc span "z" x1
    val out = Relevance.lmFluencyScore(df, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, 3L, 2333L), // (3 + 1 + 3) * 1000 div 3
      (2L, 1L, 3000L),
      (3L, 1L, 1000L)))
    spark.catalog.clearCache()
  }

  test("groupOverlapMatrix counts distinct shared spans per group pair") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("A", "a b c"), ("A", "d e"),
      ("B", "a b"), ("B", "d e"),
      ("C", "b c d")).toDF("source", "text")
    val out = Contamination.groupOverlapMatrix(df, "text", "source", n = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // A spans {ab, bc, de}; B {ab(whole-doc of "a b"? no: len==n → sliding
    // gives "a b"), de}; C {bc, cd} → A∩B = {ab, de}, A∩C = {bc}, B∩C = ∅
    assert(out == Set(("A", "B", 2L), ("A", "C", 1L)))
  }

  test("packByBudget assigns shard by start offset; stats track overflow") {
    val s = spark
    import s.implicits._
    // one stratum, token counts 3, 4, 2, 6 → starts 0, 3, 7, 9 with
    // budget 5 → shards 0, 0, 1, 1
    val df = Seq(
      ("g1", 1L, "t t t"), ("g1", 2L, "t t t t"),
      ("g1", 3L, "t t"), ("g1", 4L, "t t t t t t"),
      ("g1", 5L, null)) // null text never enters the token stream
      .toDF("src", "doc_id", "text")
    val packed = Packing.packByBudget(df, "doc_id", "text", Seq("src"), 5L)
    val rows = packed.collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(rows == Set(
      (1L, 3L, 0L, 0L), (2L, 4L, 3L, 0L),
      (3L, 2L, 7L, 1L), (4L, 6L, 9L, 1L)))
    val stats = Packing.shardStats(packed, Seq("src"), 5L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // shard 0: ends at 7 → overflow 2; shard 1: ends at 15 → overflow 5
    assert(stats == Set((0L, 2L, 7L, 2L), (1L, 2L, 8L, 5L)))
  }

  test("packGlobalByBudget == single-stratum window pack, any partitioning") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // reference: the naive window formulation over one constant stratum
    val viaWindow = Packing.packByBudget(
      base.withColumn("one", org.apache.spark.sql.functions.lit("c")),
      "doc_id", "text", Seq("one"), 512L)
      .select("doc_id", "n_tok", "start_off", "shard_id")
      .collect().map(key).toSet
    val viaPrefix = Packing.packGlobalByBudget(base, "doc_id", "text", 512L)
      .collect().map(key).toSet
    val viaPrefixRepart = Packing.packGlobalByBudget(
      base.repartition(13), "doc_id", "text", 512L)
      .collect().map(key).toSet
    assert(viaPrefix == viaWindow)
    assert(viaPrefixRepart == viaWindow)
    spark.catalog.clearCache()
  }

  test("packByBudget refuses an unstratified (single-task) pack") {
    val df = docs(1L -> "a")
    intercept[IllegalArgumentException] {
      Packing.packByBudget(df, "doc_id", "text", Seq.empty, 512L)
    }
  }

  test("packShuffled: per-shard permutation, partitioning-invariant, " +
    "seed-sensitive") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Packing.packShuffled(df, "doc_id", "text", Seq("lang", "source"),
        2048L, seed)
        .select("lang", "source", "doc_id", "shard_id", "shard_key",
          "shuffled_pos")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
    val a = run(base, 7L)
    // pure function of (seed, data): identical under any partitioning
    assert(run(base.repartition(13), 7L).toSet == a.toSet)
    // within every (stratum, shard), shuffled_pos is a 1..n permutation
    a.groupBy(t => (t._1, t._2, t._4)).foreach { case (k, rows) =>
      assert(rows.map(_._6).sorted.toSeq == (1L to rows.length).toSeq,
        s"not a permutation in $k")
    }
    // all docs of a shard agree on the shard's visit key
    a.groupBy(t => (t._1, t._2, t._4))
      .foreach { case (k, rows) =>
        assert(rows.map(_._5).distinct.length == 1, s"shard_key split in $k") }
    // a different seed reorders at least one shard's docs
    val b = run(base, 8L)
    val posA = a.map(t => (t._1, t._2, t._3) -> t._6).toMap
    assert(b.exists(t => posA((t._1, t._2, t._3)) != t._6),
      "seed change did not move any document")
  }

  test("packShuffled excludes null-stratum rows (review fix: concat_ws " +
    "would silently alias them)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "t t", Option("l1"), Option("s1")),
      (2L, "t t", None, Option("s1")),
      (3L, "t t", Option("l1"), None))
      .toDF("doc_id", "text", "lang", "source")
    val out = Packing.packShuffled(df, "doc_id", "text",
      Seq("lang", "source"), 8L, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("quotaSample keeps the hash-order prefix, stable under quota growth") {
    val s = spark
    import s.implicits._
    val df = (1L to 10L).map(i => (i, "s")).toDF("doc_id", "lang")
    def picked(quota: Long): Set[Long] =
      Sampling.quotaSample(df, "doc_id", "lang", Map.empty, quota)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // expected = top-quota ids by (polyhash(id), id) — the op's contract,
    // recomputed here from the JVM mirror of the hash
    val expect3 = (1L to 10L)
      .sortBy(i => (DedupOps.polyHashJvm(i.toString, 131L), i))
      .take(3).toSet
    assert(picked(3) == expect3)
    assert(picked(3).subsetOf(picked(7)))
    assert(picked(20) == (1L to 10L).toSet)
    // partitioning-invariant
    val re = Sampling.quotaSample(df.repartition(5), "doc_id", "lang",
      Map.empty, 3L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(re == expect3)
  }

  test("centroidOutliers: nearest cell, floored-micro sim, tie to low cell") {
    val s = spark
    import s.implicits._
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(
      (1L, Seq(1f, 0f)),      // cell 0, sim 1.0
      (2L, Seq(3f, 4f)),      // cell 1, sim 4/5 exactly (|v| = 5)
      (3L, Seq(-1f, 0f)),     // best is cell 1 at sim 0 → outlier
      (4L, Seq(1f, 1f)))      // tie 707106/707106 → cell 0
      .toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(df, "vec_id", "embedding",
      cents, minSimMicro = 100000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(out == Set(
      (1L, 0L, 1000000L, false),
      (2L, 1L, 800000L, false),
      (3L, 1L, 0L, true),
      (4L, 0L, 707106L, false)))
  }

  test("centroidOutliers: zero-norm vector is pinned to sim 0 / outlier, " +
    "not NaN (ADVICE r4)") {
    val s = spark
    import s.implicits._
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(
      (1L, Seq(0f, 0f)),     // zero vector: 0/0 would be NaN → pinned 0
      (2L, Seq(2f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(df, "vec_id", "embedding",
      cents, minSimMicro = 100000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    assert(out == Set((1L, 0L, true), (2L, 1000000L, false)))
    // the all-zero-centroid edge pins the other operand's guard
    val zc = Similarity.centroidOutliers(df, "vec_id", "embedding",
      Array(Array(0.0, 0.0)), minSimMicro = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(zc == Set((1L, 0L), (2L, 0L)))
  }

  test("clusterPrune: drops the most-prototypical permille of each cell, " +
    "rank deterministic under repartitioning") {
    val s = spark
    import s.implicits._
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // cell 0: ids 1-4 at descending sim; cell 1: ids 5-6
    val df = Seq(
      (1L, Seq(1f, 0f)),        // sim 1000000 — most prototypical
      (2L, Seq(5f, 1f)),        // sim ~980580
      (3L, Seq(2f, 1f)),        // sim ~894427
      (4L, Seq(1f, 1f)),        // sim 707106 (tie → cell 0)
      (5L, Seq(0f, 2f)),        // cell 1, sim 1000000
      (6L, Seq(1f, 3f)))        // cell 1, sim ~948683
      .toDF("vec_id", "embedding")
    // 300‰ of 4 = ⌊1.2⌋ = 1 dropped in cell 0; ⌊0.6⌋ = 0 in cell 1
    val out = Similarity.clusterPrune(df.repartition(3), "vec_id",
      "embedding", cents, prunePermille = 300L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(out(1L) == ((0L, 1L, false)))   // pruned: rank 1 of cell 0
    assert(out(2L) == ((0L, 2L, true)))
    assert(out(3L) == ((0L, 3L, true)))
    assert(out(4L) == ((0L, 4L, true)))
    assert(out(5L) == ((1L, 1L, true)))    // cell 1 prunes nobody
    assert(out(6L) == ((1L, 2L, true)))
    // permille edges: 0 keeps everything, 1000 drops everything
    val all = Similarity.clusterPrune(df, "vec_id", "embedding", cents, 0L)
      .collect().map(_.getBoolean(4))
    assert(all.forall(identity))
    val none = Similarity.clusterPrune(df, "vec_id", "embedding", cents,
      1000L).collect().map(_.getBoolean(4))
    assert(none.forall(!_))
  }
}
