package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.{Contamination, DedupOps}

case class TrainDoc(doc_id: Long, text: String)

/** Streaming benchmark decontamination: the Bloom bitset is built ONCE
  * from the static benchmark and broadcast; each micro-batch's docs
  * shingle and probe it statelessly, with the per-doc hit aggregation
  * as an ordinary streaming agg. Pin: the stream's final per-doc
  * (n_spans, n_hit_bloom) equals the batch `bloomContaminationReport`
  * on the same corpus — including a contaminated doc arriving in a
  * later micro-batch than its clean twin.
  */
class StreamingDecontamSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("streaming bloom probe equals the batch report per doc") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val bench = Seq((100L, "the quick brown fox jumps over it"),
      (101L, "pack my box with five dozen jugs")).toDF("doc_id", "text")
    val b1 = Seq(TrainDoc(1L, "a clean doc with fresh words only"),
      TrainDoc(2L, "the quick brown fox jumps over it today"))
    val b2 = Seq(TrainDoc(3L, "pack my box with five dozen jugs indeed"),
      TrainDoc(4L, "another clean one entirely novel text"))
    val n = 5

    // static side: distinct bench spans → bitset (same sizing rule as
    // the report: 32 bits/span)
    val benchSh = DedupOps.shingleIndex(bench, "doc_id", "text", n)
      .select(col("sh")).distinct()
    val m = math.max(1024L, 32L * benchSh.count())
    val bloom = Contamination.buildBloomBits(benchSh, m, 3)

    val mem = MemoryStream[TrainDoc]
    val probed = Contamination.probeBloom(
      DedupOps.shingleIndex(mem.toDF(), "doc_id", "text", n),
      "doc_id", bloom)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("bhit")).as("n_hit_bloom"))
    val q = probed.writeStream.format("memory").queryName("decontam_stream")
      .outputMode("complete").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = s.sql(
      "SELECT doc_id, n_spans, n_hit_bloom FROM decontam_stream")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val batch = Contamination.bloomContaminationReport(
      (b1 ++ b2).toDF(), bench, "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
    assert(streamed == batch)
    // non-vacuous: the benchmark twins hit, the clean docs do not
    assert(streamed(2L)._2 > 0L && streamed(3L)._2 > 0L)
    assert(streamed(1L)._2 == 0L && streamed(4L)._2 == 0L)
  }
}
