package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.{Quantiles, Sketches}

case class Tok(tok: String)
case class Gv(g: String, v: Long)

/** The sketch ops are plain declarative aggregations, so they run
  * UNCHANGED as Structured Streaming queries (complete mode) — no
  * streaming-specific operator needed. These pins hold the property
  * that makes sketches the incremental profile at scale: after any
  * prefix of micro-batches, the stream's state equals the batch sketch
  * of everything ingested so far (counts sum cell-wise for CMS and the
  * quantile histogram, registers max cell-wise for HLL).
  */
class StreamingSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("cms sketch streams: state after each batch == batch sketch of " +
      "the prefix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val b1 = Seq("a", "a", "b", "c").map(Tok)
    val b2 = Seq("a", "c", "c", "d").map(Tok)
    val mem = MemoryStream[Tok]
    val out = Sketches.cmsSketch(mem.toDF(), "tok", width = 64, depth = 3)
    val q = out.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    def state() = s.sql("SELECT r, pos, cnt FROM cms_stream").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def batchOf(xs: Seq[Tok]) =
      Sketches.cmsSketch(xs.toDF(), "tok", width = 64, depth = 3)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(state() == batchOf(b1))
      mem.addData(b2: _*)
      q.processAllAvailable()
      assert(state() == batchOf(b1 ++ b2))
    } finally q.stop()
  }

  test("quantile histogram streams; quantiles read off the final state " +
      "match the batch report") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rnd = new scala.util.Random(13)
    val b1 = Seq.tabulate(500)(i => Gv("g", math.abs(rnd.nextLong()) % 90000L))
    val b2 = Seq.tabulate(500)(i => Gv("g", math.abs(rnd.nextLong()) % 90000L))
    val mem = MemoryStream[Gv]
    val out = Quantiles.quantileSketch(mem.toDF(), "v", Seq("g"))
    val q = out.writeStream.format("memory").queryName("qsk_stream")
      .outputMode("complete").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = s.sql("SELECT g, qb, cnt FROM qsk_stream")
    // rank extraction on the streamed cells == the full batch report
    val est = Quantiles.rankPick(streamed, Seq("g"), "qb", Seq(500, 990))
      .withColumn("est_v", Quantiles.repCol("__picked"))
      .select("g", "q_permille", "est_v")
      .collect().map(_.toSeq).toSet
    val batch = Quantiles.quantileReport((b1 ++ b2).toDF(), "v", Seq("g"),
      Seq(500, 990))
      .select("g", "q_permille", "est_v")
      .collect().map(_.toSeq).toSet
    assert(est == batch)
  }

  test("hll sparse registers stream; estimate off the final state " +
      "matches the batch report") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val b1 = Seq.tabulate(3000)(i => Tok(s"k$i"))
    val b2 = Seq.tabulate(3000)(i => Tok(s"k${i + 1500}")) // 50% overlap
    val mem = MemoryStream[Tok]
    val out = Sketches.hllRegistersSparse(mem.toDF(), "tok")
    val q = out.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = s.sql("SELECT bucket, r FROM hll_stream").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchRegs = Sketches.hllSketch((b1 ++ b2).toDF(), "tok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 > 0L).toMap
    assert(streamed == batchRegs)
  }
}
