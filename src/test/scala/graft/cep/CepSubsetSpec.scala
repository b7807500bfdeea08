package graft.cep

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SQL:2016 `SUBSET` union variables: parse/render round-trip, the
  * rejection surface, both measure tiers over unions (positional
  * concat/min/max and the IN-guarded join), member-order independence,
  * empty unions, `ALL ROWS PER MATCH`, and the batch==stream gate.
  */
class CepSubsetSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val schema: Vector[(String, Vector[String])] = Vector(
    "signup" -> Vector("event_id", "value"),
    "click" -> Vector("event_id", "value"),
    "purchase" -> Vector("event_id", "value"))
  private val spec = SparkCep.CepSpec(Some("user_id"), "event_id",
    "event_type", Seq("value"))

  private val funnelTail =
    "PARTITION BY user_id ORDER BY event_id TYPE event_type " +
      "DEFINE s AS signup; c AS click; p AS purchase WITHIN 8"

  // --------------------------------------------------------------- parse

  test("SUBSET parses and render round-trips (multiple subsets)") {
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,2} -> p) " +
        "MEASURES COUNT(u) AS n_u, SUM(w.value) AS w_sum " +
        "SUBSET u = (c, p), w = (s, p) " + funnelTail, schema)
    assert(st.subsets == Vector(
      "u" -> Vector("c", "p"), "w" -> Vector("s", "p")))
    assert(CepSql.parseStatement(CepSql.render(st), schema) == st)
  }

  test("rejections") {
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](
        CepSql.parseStatement(sql, schema))
      assert(e.getMessage.contains(frag),
        s"message '${e.getMessage}' lacks '$frag'")
    }
    val base = "PATTERN (s -> c{1,2} -> p) MEASURES COUNT(u) AS n_u "
    bad(base + "SUBSET u = (c, p), u = (s) " + funnelTail, "duplicate")
    bad(base + "SUBSET c = (s, p) " + funnelTail, "collides")
    bad(base + "SUBSET u = (c, ghost) " + funnelTail, "no DEFINE")
    bad(base + "SUBSET u = (c, c) " + funnelTail, "repeats")
    bad(base + "SUBSET u = c " + funnelTail, "parenthesised")
    bad("PATTERN (s -> c{1,2} -> p) MEASURES COUNT(u) AS u " +
      "SUBSET u = (c, p) " + funnelTail, "collides with a SUBSET")
    bad("PATTERN (s -> c{1,2} -> p) MEASURES COUNT(ghost) AS n " +
      funnelTail, "no DEFINE or SUBSET")
    // a negation-guard-only name binds nothing — meaningless in a union
    bad("PATTERN (s ->!fby(x) p) MEASURES COUNT(u) AS n_u " +
      "SUBSET u = (s, x) PARTITION BY user_id ORDER BY event_id " +
      "TYPE event_type DEFINE s AS signup; p AS purchase; x AS click",
      "never binds")
  }

  // ------------------------------------------------------ batch semantics

  private def funnelFixture = {
    val s = spark
    import s.implicits._
    // user 9: signup(1) click(2,v=10) click(3,v=4) purchase(4,v=7)
    //   runs start at s=1; relaxed combines cannot skip a MATCHING
    //   click, so the c bindings are [2] (loop stops, click 3 then
    //   ignored while waiting for p) and [2,3] — two matches at p=4
    Vector(
      Ev(9L, 1L, "signup", 1L), Ev(9L, 2L, "click", 10L),
      Ev(9L, 3L, "click", 4L), Ev(9L, 4L, "purchase", 7L)).toDF()
  }

  test("union measures: both tiers over u = (c, p)") {
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,2} -> p) " +
        "MEASURES COUNT(u) AS n_u, FIRST(u) AS u_first, " +
        "LAST(u) AS u_last, SUM(u.value) AS u_sum, MIN(u.value) AS " +
        "u_min, AVG(u.value) AS u_avg SUBSET u = (c, p) " + funnelTail,
      schema)
    val got = CepMeasures.run(funnelFixture, st)
      .orderBy("u_first", "n_u").collect().toVector
      .map(r => (0 until r.length).map(r.getLong).toVector)
    assert(got == Vector(
      Vector(9L, 2L, 2L, 4L, 17L, 7L, 8L),   // c=[2] p=4: 10+7
      Vector(9L, 3L, 2L, 4L, 21L, 4L, 7L)))  // c=[2,3] p=4: 10+4+7
  }

  test("member order does not matter: union is in stream order") {
    def run(sub: String) = {
      val st = CepSql.parseStatement(
        "PATTERN (s -> c{1,2} -> p) " +
          s"MEASURES FIRST(u) AS u_first, LAST(u) AS u_last $sub " +
          funnelTail, schema)
      CepMeasures.run(funnelFixture, st).orderBy("u_first", "u_last")
        .collect().toVector.map(r => (r.getLong(1), r.getLong(2)))
    }
    assert(run("SUBSET u = (c, p)") == run("SUBSET u = (p, c)"))
  }

  test("possibly-empty union: COUNT 0 / NULL aggregates survive") {
    val s = spark
    import s.implicits._
    val df = Vector(
      Ev(5L, 1L, "signup", 1L), Ev(5L, 2L, "purchase", 6L)).toDF()
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{0,2} -> p) " +
        "MEASURES COUNT(u) AS n_u, SUM(u.value) AS u_sum " +
        "SUBSET u = (c) " + funnelTail, schema)
    val got = CepMeasures.run(df, st).collect().toVector
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got == Vector((5L, 0L, None)))
  }

  test("ALL ROWS PER MATCH: running union measures over the classifier") {
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,1} -> p) " +
        "MEASURES COUNT(u) AS n_u, SUM(u.value) AS u_sum " +
        "SUBSET u = (c, p) ALL ROWS PER MATCH " + funnelTail, schema)
    val s = spark
    import s.implicits._
    val df = Vector(
      Ev(9L, 1L, "signup", 1L), Ev(9L, 2L, "click", 10L),
      Ev(9L, 4L, "purchase", 7L)).toDF()
    val got = CepMeasures.run(df, st).orderBy("event_id")
      .collect().toVector.map(r =>
        (r.getString(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got == Vector(
      ("s", 1L, 0L, None),        // running: no union rows yet
      ("c", 2L, 1L, Some(10L)),
      ("p", 4L, 2L, Some(17L))))
  }

  // ------------------------------------------------------------ streaming

  test("streaming union measures == batch (micro-batched stream)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260819L)
    val types = Vector("signup", "click", "purchase", "view")
    val evs = (1 to 120).map { i =>
      Ev(1L + rnd.nextInt(3), i.toLong, types(rnd.nextInt(4)),
        rnd.nextInt(50).toLong)
    }
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,2} -> p) " +
        "MEASURES COUNT(u) AS n_u, FIRST(u) AS u_first, " +
        "SUM(u.value) AS u_sum, AVG(u.value) AS u_avg " +
        "SUBSET u = (c, p) " + funnelTail, schema)

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingCep.matchPatternMeasures(mem.toDF(), st, spec)
    val q = out.writeStream.format("memory").queryName("cep_subset_stream")
      .outputMode("append").start()
    try {
      evs.grouped(40).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    def rowKey(r: Row): Vector[Option[Long]] =
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i))).toVector
    val streamed = s.sql("SELECT * FROM cep_subset_stream").collect()
      .map(rowKey).toVector.sortBy(_.toString)
    val batch = CepMeasures.run(evs.toDF(), st, spec).collect()
      .map(rowKey).toVector.sortBy(_.toString)
    assert(streamed.nonEmpty, "fixture produced no matches")
    assert(streamed == batch)
  }
}
