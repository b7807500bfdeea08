package graft.cep

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Heartbeat ergonomics for event-time CEP (ADVICE r8 #3, closed by the
  * round-9 watermark-above-the-filter move): on a DROP-HEAVY member set
  * (the union alphabet excludes most of the stream) the reorder-buffer
  * drain must not depend on in-alphabet traffic — ANY event with a
  * non-null key and ts advances the watermark, including a type that
  * appears in no member pattern and not even in the query schema. The
  * operator guide is on `StreamingCep.etPrepare` /
  * `matchPatternsSharedEventTime`; this spec is the executable form:
  * buffered matches release on a pure heartbeat, and the heartbeat is
  * never fed to a member (it cannot bind or kill runs).
  */
class HeartbeatDrainSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("non-alphabet heartbeat drains a drop-heavy shared member set") {
    val s = spark
    import s.implicits._
    val schema = Vector("signup" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"),
      "error" -> Vector("event_id", "value"))
    // union alphabet {signup, purchase, error}: everything else on the
    // stream is dropped by the pre-NFA union filter
    val qs = Seq(
      "pair" -> CepQuery(
        Pattern.Combine(Contiguity.Strict,
          Pattern.spat("a", "signup", "True"),
          Pattern.spat("b", "purchase", "True")), schema),
      "err" -> CepQuery(Pattern.spat("e", "error", "True"), schema))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[TsEv]
    val out = StreamingCep.matchPatternsSharedEventTime(
      mem.toDF(), qs, spec, tsCol = "ts", delay = "5 seconds")
    val q = out.writeStream.format("memory").queryName("cep_hb")
      .outputMode("append").start()
    def rows() = s.sql("SELECT * FROM cep_hb").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    try {
      // the in-alphabet traffic: one strict pair, then silence in the
      // alphabet — without a heartbeat the buffered pair would wait for
      // the watermark forever
      mem.addData(TsEv(1, 1, "signup", 0, ts(10)))
      mem.addData(TsEv(1, 2, "purchase", 5, ts(11)))
      q.processAllAvailable()
      assert(rows().isEmpty, "nothing may release before the watermark")
      // heartbeats: a type in NO member pattern and NOT in the schema,
      // on an unrelated key — two so the timeout-driven drain definitely
      // ran after the watermark moved past ts=11
      mem.addData(TsEv(999, 901, "telemetry_hb", 0, ts(30)))
      q.processAllAvailable()
      mem.addData(TsEv(999, 902, "telemetry_hb", 0, ts(40)))
      q.processAllAvailable()
    } finally q.stop()
    val got = rows()
    assert(got == Set(("pair", 1L, "1;2")), s"got $got")
    // implied by the exact-set assert, stated for the reader: the
    // heartbeats bound nothing and killed nothing — no row references
    // events 901/902 and the pair survived the non-alphabet traffic
  }
}
