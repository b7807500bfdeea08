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

  test("windowed quantile sketch: watermark-closed windows equal the " +
      "batch sketch per window; quantiles read off the cells") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rnd = new scala.util.Random(29)
    def ts(minute: Int) = new java.sql.Timestamp(minute * 60000L)
    // two event-time hours; batch 2's hour-0 stragglers arrive before
    // the watermark passes, the hour-0 window closes only after batch 3
    val b1 = Seq.tabulate(300)(i =>
      (ts(rnd.nextInt(50)), math.abs(rnd.nextLong()) % 70000L))
    val b2 = Seq.tabulate(300)(i =>
      (ts(55 + rnd.nextInt(60)), math.abs(rnd.nextLong()) % 70000L))
    val b3 = Seq((ts(240), 17L)) // advances the watermark past hour 0/1
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val out = StreamingSessions.windowedQuantileSketch(
      mem.toDF().toDF("ts", "v"), "ts", "v",
      width = "1 hour", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("wq_stream")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      mem.addData(b3: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = s.sql(
      "SELECT window_start, qb, cnt FROM wq_stream").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1)) -> r.getLong(2))
      .toMap
    // batch reference over everything in the CLOSED windows (hours 0-1)
    val batch = StreamingSessions.windowedQuantileSketch(
      (b1 ++ b2).toDF("ts", "v"), "ts", "v", width = "1 hour")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch)
    // per-window p50 off the streamed cells matches the batch report
    val cells = s.sql("SELECT CAST(window_start AS STRING) AS g, qb, cnt " +
      "FROM wq_stream")
    val p50 = Quantiles.rankPick(cells, Seq("g"), "qb", Seq(500))
      .withColumn("est_v", Quantiles.repCol("__picked"))
      .select("g", "est_v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p50.size == 2)
    val batchRep = Quantiles.quantileReport(
      (b1 ++ b2).toDF("ts", "v")
        .withColumn("g", org.apache.spark.sql.functions.expr(
          "CAST(window(ts, '1 hour').start AS STRING)")),
      "v", Seq("g"), Seq(500))
      .select("g", "est_v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p50 == batchRep)
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
