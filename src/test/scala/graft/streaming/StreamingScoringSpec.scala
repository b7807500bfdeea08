package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.{Bpe, Dsir, QualityModel}

case class ScoreDoc(doc_id: Long, text: String)

/** The trained scoring gates — quality perceptron, DSIR importance,
  * BPE token stats — are stateless broadcast passes, so they run
  * UNCHANGED on streams in append mode (no state, no watermark, no
  * modes to reason about). With the committed artifacts loaded once
  * and broadcast, per-doc stream outputs must equal the batch outputs
  * row for row — the property that lets the curation ladder's scoring
  * stages gate an INGEST stream, not just a static corpus.
  */
class StreamingScoringSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val docs = Seq(
    ScoreDoc(1L, "customer window filter join batch"),
    ScoreDoc(2L, "the quick brown fox"),
    ScoreDoc(3L, "scan scan scan scan scan scan"),
    ScoreDoc(4L, "merge sort hash table spark data"))

  /** Drive `op` over a two-batch stream of `docs`, return the appended
    * rows keyed by doc id.
    */
  private def streamRows(name: String, op: DataFrame => DataFrame)
      : Map[Long, Seq[Any]] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[ScoreDoc]
    val q = op(mem.toDF()).writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    s.sql(s"SELECT * FROM $name").collect()
      .map(r => r.getLong(0) -> r.toSeq.toSeq).toMap
  }

  private def batchRows(op: DataFrame => DataFrame): Map[Long, Seq[Any]] = {
    val s = spark
    import s.implicits._
    op(docs.toDF()).collect().map(r => r.getLong(0) -> r.toSeq.toSeq).toMap
  }

  test("quality model scores a stream identically to batch") {
    val w = QualityModel.loadWeights(spark, QualityModel.weightsPath)
    val op = (d: DataFrame) =>
      QualityModel.scoreDocs(d, "doc_id", "text", w)
    assert(streamRows("q_stream", op) == batchRows(op))
  }

  test("dsir importance scores a stream identically to batch") {
    val w = Dsir.loadWeights(spark, Dsir.weightsPath)
    val op = (d: DataFrame) => Dsir.scoreDocs(d, "doc_id", "text", w)
    assert(streamRows("dsir_stream", op) == batchRows(op))
  }

  test("bpe token stats score a stream identically to batch") {
    val m = Bpe.loadMerges(spark, Bpe.mergesPath)
    val op = (d: DataFrame) => Bpe.tokenStats(d, "doc_id", "text", m)
    assert(streamRows("bpe_stream", op) == batchRows(op))
  }
}
