package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins for the persisted MinHash band index (`IncrementalDedup`):
  * batch-vs-index matching must agree exactly with the ad-hoc LSH join
  * restricted to cross-split pairs; appends make docs findable; the
  * write-time bucket cap drops degenerate buckets from the index.
  */
class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    java.nio.file.Files.createTempDirectory("incdedup").toString

  private def corpusDocs = {
    val s = spark
    import s.implicits._
    // 1/2 near-identical, 3 unrelated, 4 identical to 1
    Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and once",
      3L -> "completely different content about spark catalyst plans here",
      4L -> "the quick brown fox jumps over the lazy dog again and again"
    ).toDF("doc_id", "text")
  }

  // NOTE on "est_milli identical": this is a 1 - ~2^-32-per-component
  // identity, not a structural one — matchBatch compares the stored
  // 32-bit signature RESIDUES while minHashLshPairs compares full
  // 64-bit components, so a residue collision between two distinct
  // components would make matchBatch count one extra agreement. On
  // equal shingle sets the residues are exactly equal, so the identity
  // is exact there; a divergence on a near-pair here would be a
  // once-in-2^32 residue collision, not (necessarily) a regression.
  test("matchBatch equals the ad-hoc LSH join restricted to cross-split " +
    "pairs (est_milli identical)") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      10L -> "the quick brown fox jumps over the lazy dog again and again",
      11L -> "totally novel text that matches nothing in the corpus at all"
    ).toDF("doc_id", "text")
    val idx = tmp()
    IncrementalDedup.writeIndex(corpusDocs, "doc_id", "text", idx)
    val got = IncrementalDedup.matchBatch(batch, "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    // reference: ad-hoc pairs over the union, keeping batch-vs-corpus only
    val adhoc = DedupOps.minHashLshPairs(
        corpusDocs.union(batch), "doc_id", "text")
      .collect().flatMap { r =>
        val (a, b, e) = (r.getLong(0), r.getLong(1), r.getLong(2))
        if (a >= 10L && b < 10L) Some((a, b) -> e)
        else if (b >= 10L && a < 10L) Some((b, a) -> e)
        else None
      }.toMap
    assert(got == adhoc)
    assert(got.keySet.map(_._1).contains(10L))
    assert(!got.keySet.map(_._1).contains(11L))
    assert(got((10L, 1L)) == 1000L) // identical doc ⇒ full agreement
  }

  test("appendBatch makes appended docs findable by later batches") {
    val s = spark
    import s.implicits._
    val idx = tmp()
    IncrementalDedup.writeIndex(corpusDocs, "doc_id", "text", idx)
    val day1 = Seq(
      20L -> "fresh unique day one text with no duplicates anywhere yet"
    ).toDF("doc_id", "text")
    assert(IncrementalDedup.matchBatch(day1, "doc_id", "text", idx)
      .count() == 0L)
    IncrementalDedup.appendBatch(day1, "doc_id", "text", idx)
    val day2 = Seq(
      30L -> "fresh unique day one text with no duplicates anywhere yet"
    ).toDF("doc_id", "text")
    val m = IncrementalDedup.matchBatch(day2, "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.toSeq == Seq((30L, 20L, 1000L)))
  }

  test("write-time bucket cap drops degenerate buckets: a batch doc " +
    "duplicating a saturated cluster finds nothing") {
    val s = spark
    import s.implicits._
    val text = "all these corpus documents share exactly the same content"
    val corpus = (1L to 8L).map(i => i -> text).toDF("doc_id", "text")
    val idx = tmp()
    IncrementalDedup.writeIndex(corpus, "doc_id", "text", idx,
      maxBucketSize = 4L)
    val batch = Seq(100L -> text).toDF("doc_id", "text")
    assert(IncrementalDedup.matchBatch(batch, "doc_id", "text", idx)
      .count() == 0L)
    // uncapped index finds all 8
    val idx2 = tmp()
    IncrementalDedup.writeIndex(corpus, "doc_id", "text", idx2)
    assert(IncrementalDedup.matchBatch(batch, "doc_id", "text", idx2)
      .count() == 8L)
  }
}
