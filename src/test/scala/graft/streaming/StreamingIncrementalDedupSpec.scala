package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The streaming near-dup gate (`StreamingDedup.nearDupStream`) must emit
  * exactly the batch `IncrementalDedup.matchBatch` pairs on the same
  * inputs — including docs arriving in different micro-batches — and
  * must not re-emit a pair.
  */
class StreamingIncrementalDedupSpec extends AnyFunSuite
    with BeforeAndAfterAll {

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

  test("stream equals batch matchBatch; duplicate arrivals don't re-emit") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "completely different content about spark catalyst plans here"
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("incdedup_stream").toString
    graft.ops.IncrementalDedup.writeIndex(corpus, "doc_id", "text", idx)

    val b1 = Seq(Doc(10L,
      "the quick brown fox jumps over the lazy dog again and again"))
    val b2 = Seq(
      Doc(11L, "novel text matching nothing in the persisted corpus index"),
      // identical content to doc 10 — its own pairs, emitted once
      Doc(12L,
        "the quick brown fox jumps over the lazy dog again and again"))

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Doc]
    val out = StreamingDedup.nearDupStream(mem.toDF(), "doc_id", "text", idx)
    val q = out.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      // re-send batch 1: the pair (10, 1) must not be emitted again
      mem.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = s.sql(
        "SELECT new_id, dup_of, est_milli FROM neardup_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    val batch = graft.ops.IncrementalDedup.matchBatch(
        (b1 ++ b2).map(d => d.doc_id -> d.text).toDF("doc_id", "text"),
        "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.map(t => (t._1, t._2)).distinct.length ==
      streamed.length, "a pair was re-emitted")
    assert(streamed.exists(t => t._1 == 10L && t._2 == 1L && t._3 == 1000L))
    assert(!streamed.exists(_._1 == 11L))
  }

  test("checkpoint restart: emitted-pair state survives; re-sent docs " +
    "stay suppressed, new dups still emit") {
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "completely different content about spark catalyst plans here"
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("incdedup_ckpt_idx").toString
    graft.ops.IncrementalDedup.writeIndex(corpus, "doc_id", "text", idx)
    val dir = java.nio.file.Files
      .createTempDirectory("incdedup_ckpt").toString
    val inDir = s"$dir/in"; val ckpt = s"$dir/ckpt"; val outDir = s"$dir/out"
    val dupText =
      "the quick brown fox jumps over the lazy dog again and again"
    val inSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    def startQuery() = {
      val in = s.readStream.schema(inSchema).json(inDir)
      StreamingDedup.nearDupStream(in, "doc_id", "text", idx)
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    Seq(10L -> dupText).toDF("doc_id", "text")
      .write.mode("append").json(inDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // restart from the checkpoint: the pair (10, 1) sits in the
    // dropDuplicates state — a re-sent doc 10 must emit nothing, while
    // a new duplicate doc still matches
    Seq(10L -> dupText, 20L -> dupText).toDF("doc_id", "text")
      .write.mode("append").json(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val outSchema = StructType(Seq(
      StructField("new_id", LongType), StructField("dup_of", LongType),
      StructField("est_milli", LongType)))
    val out = s.read.schema(outSchema).json(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(out.count(_._1 == 10L) == 1,
      s"re-sent doc must not re-emit its pair across the restart: $out")
    assert(out.toSet == Set((10L, 1L), (20L, 1L)), s"unexpected: $out")
  }
}
