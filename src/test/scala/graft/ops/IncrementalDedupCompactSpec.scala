package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins for index maintenance (`IncrementalDedup.compactIndex` /
  * `bucketSaturation`): appends can push a bucket past the write-time
  * cap (the cap is per-write); the gauge reports it; compaction rewrites
  * `bands/` applying the cap globally, after which the index matches
  * EXACTLY like a fresh `writeIndex` over the union of every written
  * batch.
  */
class IncrementalDedupCompactSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("incdedup_compact").toString

  private val textA = "all these corpus documents share exactly the same content"
  private val textB = "completely different prose about catalyst physical plans"

  test("append past the cap -> gauge reports it -> compact -> match " +
    "output equals a fresh capped build") {
    val s = spark
    import s.implicits._
    val cap = 4L
    val corpus = ((1L to 3L).map(_ -> textA) :+ (4L -> textB))
      .toDF("doc_id", "text")
    val day1 = Seq(5L -> textA, 6L -> textA, 7L -> textB)
      .toDF("doc_id", "text")
    val idx = tmp()
    IncrementalDedup.writeIndex(corpus, "doc_id", "text", idx,
      maxBucketSize = cap)
    // each append respects the cap within itself (2 <= 4), but the
    // textA buckets now hold 5 rows across the two writes
    IncrementalDedup.appendBatch(day1, "doc_id", "text", idx,
      maxBucketSize = cap)
    val overBefore = IncrementalDedup.bucketSaturation(spark, idx, cap)
      .agg(org.apache.spark.sql.functions.sum("over_cap")).collect()(0)
      .getLong(0)
    assert(overBefore > 0L, "appends must have saturated a bucket")

    val batch = Seq(100L -> textA, 101L -> textB).toDF("doc_id", "text")
    def matches(path: String): Set[(Long, Long, Long)] =
      IncrementalDedup.matchBatch(batch, "doc_id", "text", path)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    // pre-compact the over-cap textA bucket still matches (5 neighbors)
    assert(matches(idx).count(_._1 == 100L) == 5)

    IncrementalDedup.compactIndex(spark, idx, cap)
    val overAfter = IncrementalDedup.bucketSaturation(spark, idx, cap)
      .agg(org.apache.spark.sql.functions.sum("over_cap")).collect()(0)
      .getLong(0)
    assert(overAfter == 0L)

    val fresh = tmp()
    IncrementalDedup.writeIndex(corpus.union(day1), "doc_id", "text",
      fresh, maxBucketSize = cap)
    val got = matches(idx)
    assert(got == matches(fresh))
    // the saturated textA cluster is gone; textB's pair survives
    assert(got.count(_._1 == 100L) == 0)
    assert(got.count(_._1 == 101L) == 2)
    spark.catalog.clearCache()
  }

  test("mergeIndexes over sharded builds equals a fresh build over the " +
    "union, including the global cap") {
    val s = spark
    import s.implicits._
    val cap = 4L
    // two id-disjoint shards; textA saturates only across them
    val shard1 = ((1L to 3L).map(_ -> textA) :+ (4L -> textB))
      .toDF("doc_id", "text")
    val shard2 = Seq(5L -> textA, 6L -> textA, 7L -> textB)
      .toDF("doc_id", "text")
    val idx1 = tmp(); val idx2 = tmp(); val merged = tmp()
    IncrementalDedup.writeIndex(shard1, "doc_id", "text", idx1,
      maxBucketSize = cap)
    IncrementalDedup.writeIndex(shard2, "doc_id", "text", idx2,
      maxBucketSize = cap)
    IncrementalDedup.mergeIndexes(spark, Seq(idx1, idx2), merged, cap)
    val fresh = tmp()
    IncrementalDedup.writeIndex(shard1.union(shard2), "doc_id", "text",
      fresh, maxBucketSize = cap)
    val batch = Seq(100L -> textA, 101L -> textB).toDF("doc_id", "text")
    def matches(path: String): Set[(Long, Long, Long)] =
      IncrementalDedup.matchBatch(batch, "doc_id", "text", path)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val got = matches(merged)
    assert(got == matches(fresh))
    // the cross-shard textA saturation is enforced by the merge's
    // global cap (each shard alone kept its textA bucket)
    assert(got.count(_._1 == 100L) == 0)
    assert(got.count(_._1 == 101L) == 2)
    spark.catalog.clearCache()
  }

  test("compact swap crash windows recover: half-swapped state rolls " +
    "forward (complete next) or back (incomplete next)") {
    val s = spark
    import s.implicits._
    val cap = 4L
    val corpus = ((1L to 3L).map(_ -> textA) :+ (4L -> textB))
      .toDF("doc_id", "text")
    val batch = Seq(100L -> textA, 101L -> textB).toDF("doc_id", "text")
    def matches(path: String): Set[(Long, Long, Long)] =
      IncrementalDedup.matchBatch(batch, "doc_id", "text", path)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet

    // ---- roll FORWARD: crash happened between the two renames, with
    // the new bands complete — bands/ missing, old at bands__old, the
    // _SUCCESS-complete rewrite at bands__compacting
    val idx = tmp()
    IncrementalDedup.writeIndex(corpus, "doc_id", "text", idx,
      maxBucketSize = cap)
    val expected = matches(idx)
    val f = java.nio.file.Paths.get(idx)
    java.nio.file.Files.move(f.resolve("bands"),
      f.resolve("bands__old"))
    // the "new" copy: a real complete rewrite (same content — corpus
    // was never over cap, so compaction is the identity here)
    val idx2 = tmp()
    IncrementalDedup.writeIndex(corpus, "doc_id", "text", idx2,
      maxBucketSize = cap)
    java.nio.file.Files.move(java.nio.file.Paths.get(idx2, "bands"),
      f.resolve("bands__compacting"))
    IncrementalDedup.compactIndex(spark, idx, cap)
    assert(matches(idx) == expected)
    assert(!java.nio.file.Files.exists(f.resolve("bands__old")))
    assert(!java.nio.file.Files.exists(f.resolve("bands__compacting")))

    // ---- roll BACK: bands/ missing, old present, next has no _SUCCESS
    // (crash mid-write after an earlier crash mid-swap)
    val idx3 = tmp()
    IncrementalDedup.writeIndex(corpus, "doc_id", "text", idx3,
      maxBucketSize = cap)
    val f3 = java.nio.file.Paths.get(idx3)
    java.nio.file.Files.move(f3.resolve("bands"), f3.resolve("bands__old"))
    java.nio.file.Files.createDirectory(f3.resolve("bands__compacting"))
    java.nio.file.Files.writeString(
      f3.resolve("bands__compacting").resolve("part-garbage"), "junk")
    IncrementalDedup.compactIndex(spark, idx3, cap)
    assert(matches(idx3) == expected)

    // ---- nothing to recover from fails loudly, destroying nothing
    val idx4 = tmp()
    val e = intercept[java.io.IOException] {
      IncrementalDedup.compactIndex(spark, idx4, cap)
    }
    assert(e.getMessage.contains("no complete copy"))
    spark.catalog.clearCache()
  }
}
