package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

case class Doc(doc_id: Long, text: String)

/** Streaming exact dedup must keep exactly the batch operator's winners
  * (first arrival = min doc id when fed in id order), including
  * duplicates that span a micro-batch boundary.
  */
class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("stream keeps batch keepers across micro-batch boundaries") {
    val s = spark
    import s.implicits._
    val batch1 = Seq(Doc(1, "alpha"), Doc(2, "beta"), Doc(3, "alpha"))
    val batch2 = Seq(Doc(4, "beta"), Doc(5, "gamma"), Doc(6, "alpha"))

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Doc]
    val out = StreamingDedup.exactDedupStream(mem.toDF(), "text")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = s.sql("SELECT doc_id FROM dedup_stream").collect()
      .map(_.getLong(0)).toSet
    assert(streamed == Set(1L, 2L, 5L),
      "dup spanning the batch boundary (doc 4/6) must be suppressed")

    // equals the batch operator's keep decision on the same corpus
    val batchKeep = graft.ops.DedupOps.exactDedup(
      (batch1 ++ batch2).toDF(), "doc_id", "text", byDigest = true)
      .filter($"doc_id" === $"keep_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batchKeep)
  }

  test("watermarked variant suppresses near-in-time duplicates") {
    val s = spark
    import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(mins: Int) =
      new java.sql.Timestamp(t0.getTime + mins * 60000L)
    val rows = Seq(
      (1L, "alpha", ts(0)), (2L, "alpha", ts(1)), (3L, "beta", ts(2)))

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = mem.toDF().toDF("doc_id", "text", "ts")
    val out = StreamingDedup
      .exactDedupStreamWithinWatermark(df, "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()

    val kept = s.sql("SELECT doc_id FROM dedup_wm").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), "in-window duplicate must be suppressed")
  }
}
