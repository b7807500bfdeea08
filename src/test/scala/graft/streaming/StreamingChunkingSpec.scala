package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** `Chunking.chunkByTokens` is a pure narrow transformation, so it must
  * run unchanged on a streaming frame (ingestion-time chunking) and emit
  * exactly the batch chunks — no state, no watermark, append mode.
  */
class StreamingChunkingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("streaming chunks == batch chunks across micro-batches") {
    val s = spark
    import s.implicits._
    val b1 = Seq(Doc(1L, "a b c d e f g"), Doc(2L, "x"))
    val b2 = Seq(Doc(3L, "p q r s t"), Doc(4L, "  "))

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Doc]
    val out = graft.ops.Chunking.chunkByTokens(mem.toDF(), "doc_id",
      "text", chunkTokens = 3, overlapTokens = 1)
    val q = out.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = s.sql("SELECT * FROM chunk_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(t => (t._1, t._2))
    val batch = graft.ops.Chunking.chunkByTokens(
        (b1 ++ b2).map(d => d.doc_id -> d.text).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 3, overlapTokens = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(t => (t._1, t._2))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }
}
