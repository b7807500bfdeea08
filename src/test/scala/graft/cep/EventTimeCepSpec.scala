package graft.cep

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

case class TsEv(user_id: Long, event_id: Long, event_type: String,
    value: Long, ts: java.sql.Timestamp)

/** Event-time streaming CEP: events arriving *out of event-time order*
  * (within the watermark delay) must match exactly as if processed in
  * event-time order.
  */
class EventTimeCepSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
  private def tsMs(ms: Long) = new java.sql.Timestamp(ms)

  test("out-of-order arrival within the watermark matches in-order batch") {
    val s = spark
    import s.implicits._

    // event-time order for user 1: signup@10 then purchase@11 (strict
    // pair). They ARRIVE in reverse order, in different micro-batches.
    val query = CepQuery(
      Pattern.Combine(Contiguity.Strict,
        Pattern.spat("a", "signup", "True"),
        Pattern.spat("b", "purchase", "True")),
      Vector("signup" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value"),
        "click" -> Vector("event_id", "value")))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[TsEv]
    val out = StreamingCep.matchPatternEventTime(
      mem.toDF(), query, spec, "ts", "5 seconds")
    val q = out.writeStream.format("memory").queryName("cep_et")
      .outputMode("append").start()
    try {
      // purchase@11 arrives before signup@10
      mem.addData(TsEv(1, 2, "purchase", 5, ts(11)))
      q.processAllAvailable()
      mem.addData(TsEv(1, 1, "signup", 0, ts(10)))
      q.processAllAvailable()
      // watermark rides 5s behind max ts — push it past 11 so both release
      mem.addData(TsEv(9, 99, "click", 0, ts(30)))
      q.processAllAvailable()
      // and once more so the timeout-driven drain definitely ran
      mem.addData(TsEv(9, 100, "click", 0, ts(40)))
      q.processAllAvailable()
    } finally q.stop()

    val matches = s.sql("SELECT * FROM cep_et").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector,
        r.getSeq[Long](2).toVector)).toSet
    assert(matches == Set((1L, Vector(1L), Vector(2L))),
      s"got $matches")
  }

  test("sub-second out-of-order events sort by millisecond event time") {
    val s = spark
    import s.implicits._
    val query = CepQuery(
      Pattern.Combine(Contiguity.Strict,
        Pattern.spat("a", "signup", "True"),
        Pattern.spat("b", "purchase", "True")),
      Vector("signup" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value"),
        "click" -> Vector("event_id", "value")))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[TsEv]
    val out = StreamingCep.matchPatternEventTime(
      mem.toDF(), query, spec, "ts", "5 seconds")
    val q = out.writeStream.format("memory").queryName("cep_et_ms")
      .outputMode("append").start()
    try {
      // same second, 200ms apart, arriving reversed with DESCENDING order
      // ids — only true millisecond event time puts signup first
      mem.addData(TsEv(1, 1, "purchase", 5, tsMs(10800)))
      mem.addData(TsEv(1, 2, "signup", 0, tsMs(10200)))
      q.processAllAvailable()
      mem.addData(TsEv(9, 99, "click", 0, ts(30)))
      q.processAllAvailable()
      mem.addData(TsEv(9, 100, "click", 0, ts(40)))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.sql("SELECT * FROM cep_et_ms").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector,
        r.getSeq[Long](2).toVector)).toSet
    assert(got == Set((1L, Vector(2L), Vector(1L))), s"got $got")
  }

  test("events later than the watermark delay are dropped, not reordered") {
    val s = spark
    import s.implicits._
    val query = CepQuery(
      Pattern.spat("a", "signup", "True"),
      Vector("signup" -> Vector("event_id", "value"),
        "click" -> Vector("event_id", "value")))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[TsEv]
    val out = StreamingCep.matchPatternEventTime(
      mem.toDF(), query, spec, "ts", "5 seconds")
    val q = out.writeStream.format("memory").queryName("cep_et_late")
      .outputMode("append").start()
    try {
      mem.addData(TsEv(9, 99, "click", 0, ts(100))) // watermark → 95
      q.processAllAvailable()
      mem.addData(TsEv(1, 1, "signup", 0, ts(50))) // 45s late → dropped
      mem.addData(TsEv(1, 2, "signup", 0, ts(99))) // within delay → kept
      q.processAllAvailable()
      mem.addData(TsEv(9, 100, "click", 0, ts(120))) // drain
      q.processAllAvailable()
    } finally q.stop()
    val got = s.sql("SELECT * FROM cep_et_late").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).toSet
    assert(got == Set((1L, Vector(2L))), s"got $got")
  }
}
