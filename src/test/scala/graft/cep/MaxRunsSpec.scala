package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import GoldenUtil._
import Pattern._

/** The state-explosion safety valve: nd-relaxed run sets past the cap fail
  * loudly; bounded patterns run unaffected under the same cap.
  */
class MaxRunsSpec extends AnyFunSuite {

  test("nd-relaxed growth trips the cap; capped strict run is unaffected") {
    val stream = eventsOf(Seq.fill(30)((1, 0)): _*)
    val nd = CepQuery(
      lpatInf("a", "e", "name == 1", Contiguity.NdRelaxed, 1), schemaINP)
    val exNd = new Executor(DstCompiler.compile(nd), nd.strategy, Some(100))
    exNd.reset()
    val e = intercept[IllegalStateException] {
      stream.foreach(exNd.feed)
    }
    assert(e.getMessage.contains("maxRuns=100"))

    val strict = CepQuery(
      lpat("a", "e", "name == 1", Contiguity.Strict, 2, 2), schemaINP)
    val exS = new Executor(DstCompiler.compile(strict), strict.strategy,
      Some(100))
    exS.reset()
    val out = stream.flatMap(exS.feed)
    assert(out.length == 29) // sliding pairs, never near the cap
  }
}

/** The DEFAULT state valve (VERDICT r8 #4): unbounded-loop patterns get
  * `SparkCep.DefaultUnboundedMaxRuns` when the caller passes no explicit
  * cap — resolution rules unit-tested here, the trip proven end-to-end
  * through the Catalyst exec path with the conf lowered.
  */
class DefaultMaxRunsSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions._

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val schema = Vector("click" -> Vector("event_id", "value"),
    "purchase" -> Vector("event_id", "value"))
  private val unbounded = CepQuery(
    lpatInf("a", "click", "True", Contiguity.Relaxed, 1), schema)
  private val bounded = CepQuery(
    lpat("a", "click", "True", Contiguity.Strict, 2, 2), schema)

  test("resolution: explicit wins; unbounded defaults; bounded gets none") {
    assert(SparkCep.resolveMaxRuns(spark, Seq(unbounded), Some(7))
      == Some(7))
    assert(SparkCep.resolveMaxRuns(spark, Seq(unbounded), None)
      == Some(SparkCep.DefaultUnboundedMaxRuns))
    assert(SparkCep.resolveMaxRuns(spark, Seq(bounded), None).isEmpty)
    // a shared set defaults if ANY member is unbounded
    assert(SparkCep.resolveMaxRuns(spark, Seq(bounded, unbounded), None)
      == Some(SparkCep.DefaultUnboundedMaxRuns))
    // nested unbounded loops are seen through groups
    val nested = CepQuery(GpatInf(Gpat(bounded.patseq), 1), schema)
    assert(SparkCep.resolveMaxRuns(spark, Seq(nested), None)
      == Some(SparkCep.DefaultUnboundedMaxRuns))
    // conf <= 0 disables the default (reference semantics restored)
    spark.conf.set(SparkCep.DefaultUnboundedMaxRunsKey, "0")
    try assert(SparkCep.resolveMaxRuns(spark, Seq(unbounded), None).isEmpty)
    finally spark.conf.unset(SparkCep.DefaultUnboundedMaxRunsKey)
  }

  test("default valve trips end-to-end on a hot key, no explicit cap") {
    // one key, every event a taking click, NoSkip relaxed lpat-inf:
    // live runs grow ~linearly with events, so 200 events blow a cap of
    // 50 — with maxRunsPerKey = None, only the conf-driven default stands
    // between this and unbounded state
    val events = spark.range(200).select(
      lit(1L).as("user_id"), col("id").as("event_id"),
      lit("click").as("event_type"), (col("id") % 10).as("value"))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    spark.conf.set(SparkCep.DefaultUnboundedMaxRunsKey, "50")
    try {
      val e = intercept[Exception] {
        SparkCep.matchPatternExec(events, unbounded, spec).count()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("maxRuns=50")),
        s"default cap did not trip: $e")
    } finally spark.conf.unset(SparkCep.DefaultUnboundedMaxRunsKey)
  }
}
