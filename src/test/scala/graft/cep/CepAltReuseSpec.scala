package graft.cep

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import SparkCep.CepSpec

/** SQL:2016 same-variable alternation (`CepSql.parseStatement`'s
  * rename + auto-SUBSET desugar): a name binding once in each of
  * several TOP-LEVEL branches compiles as per-branch hidden names
  * (`__b<i>_<name>`, same DEFINE) merged by a SUBSET under the original
  * name, so MEASURES over the shared name see whichever branch bound —
  * the union trick PERMUTE's desugaring already uses. Everything
  * outside the supported scope (ONE ROW + MEASURES, event DEFINEs, no
  * registers/CLASSIFIER/user-SUBSET overlap) rejects loudly.
  */
class CepAltReuseSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val schema: Vector[(String, Vector[String])] = Vector(
    "S" -> Vector("id", "v"), "C" -> Vector("id", "v"),
    "X" -> Vector("id", "v"))
  private val spec = CepSpec(Some("k"), "id", "t", Seq("v"))

  private def eventsDf(rows: (Long, Long, String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("k", "id", "t", "v")
  }

  private val sql =
    "PATTERN (s -> c | s -> x) " +
      "MEASURES FIRST(s) AS s_id, FIRST(s.v) AS s_v, " +
      "COUNT(c) AS n_c, COUNT(x) AS n_x, SUM(s.v * 2) AS s_v2 " +
      "DEFINE s AS S; c AS C; x AS X"

  test("desugar shape: hidden per-branch names + auto-SUBSET under the " +
    "original; render round-trips the desugared form") {
    val st = CepSql.parseStatement(sql, schema)
    val names = SparkCep.patternNames(st.query.patseq)
    assert(names.toSet == Set("__b0_s", "__b1_s", "c", "x"))
    assert(st.subsetMap == Map("s" -> Vector("__b0_s", "__b1_s")))
    // both hidden defs carry s's DEFINE (event type S)
    st.query.patseq match {
      case Pattern.Alt(l, r) =>
        def headEvent(p: Pattern): String = p match {
          case c: Pattern.Combine => headEvent(c.left)
          case s: Pattern.Spat    => s.event
          case other              => fail(s"unexpected $other")
        }
        assert(headEvent(l) == "S" && headEvent(r) == "S")
      case other => fail(s"expected Alt, got $other")
    }
    val again = CepSql.parseStatement(CepSql.render(st), schema)
    assert(again == st, CepSql.render(st))
  }

  test("measures over the shared name see whichever branch bound " +
    "(hand-computed); batch == streaming fold") {
    val st = CepSql.parseStatement(sql, schema)
    // S(1,v=5), C(2,v=7), X(3,v=2): branch 0 matches (s=1, c=2),
    // branch 1 matches (s=1, x=3) — two matches, s bound in both
    val df = eventsDf(
      (1L, 1L, "S", 5L), (1L, 2L, "C", 7L), (1L, 3L, "X", 2L))
    def g(r: Row, n: String): Any =
      if (r.isNullAt(r.fieldIndex(n))) null else r.getLong(r.fieldIndex(n))
    val out = CepMeasures.run(df, st, spec).orderBy("n_x")
      .collect().map(r => (g(r, "s_id"), g(r, "s_v"), g(r, "n_c"),
        g(r, "n_x"), g(r, "s_v2"))).toVector
    assert(out == Vector(
      (1L, 5L, 1L, 0L, 10L),
      (1L, 5L, 0L, 1L, 10L)))
    // the streaming fold agrees (the same subsets drive evalMeasure)
    val viaC = Map(
      "__b0_s" -> Vector(Event("S", Vector("id" -> 1L, "v" -> 5L))),
      "c" -> Vector(Event("C", Vector("id" -> 2L, "v" -> 7L))))
    assert(st.measures.map(m =>
      CepMeasures.evalItem(m, viaC, "id", st.subsetMap)) ==
      Vector(Some(1L), Some(5L), Some(1L), Some(0L), Some(10L)))
  }

  test("shared-prefix use case end-to-end: signup then (click | error), " +
    "every signup measured regardless of branch") {
    val st = CepSql.parseStatement(sql, schema)
    // key 2 has only the error branch; key 3 only the click branch
    val df = eventsDf(
      (2L, 10L, "S", 3L), (2L, 11L, "X", 1L),
      (3L, 20L, "S", 9L), (3L, 21L, "C", 4L))
    val byKey = CepMeasures.run(df, st, spec).collect()
      .map(r => (r.getLong(r.fieldIndex("k")),
        r.getLong(r.fieldIndex("s_v")),
        r.getLong(r.fieldIndex("n_c")),
        r.getLong(r.fieldIndex("n_x")))).toSet
    assert(byKey == Set((2L, 3L, 0L, 1L), (3L, 9L, 1L, 0L)))
  }

  test("streaming measures == batch across micro-batch boundaries " +
    "(the hidden per-branch names ride the NFA and run-state codec)") {
    val s = spark
    import s.implicits._
    val evSpec = SparkCep.CepSpec(Some("user_id"), "event_id",
      "event_type", Seq("value"))
    val st = CepSql.parseStatement(
      "PATTERN (s -> c | s -> x) " +
        "MEASURES FIRST(s) AS s_id, FIRST(s.value) AS s_v, " +
        "COUNT(c) AS n_c, COUNT(x) AS n_x " +
        "DEFINE s AS signup; c AS click; x AS error WITHIN 5",
      Vector("signup" -> Vector("event_id", "value"),
        "click" -> Vector("event_id", "value"),
        "error" -> Vector("event_id", "value")))
    val rnd = new scala.util.Random(20260824L)
    val types = Vector("signup", "click", "error", "view")
    val evs = (1 to 120).map { i =>
      Ev(1L + rnd.nextInt(3), i.toLong, types(rnd.nextInt(4)),
        rnd.nextInt(50).toLong)
    }
    implicit val sqlCtx = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev]
    val q = StreamingCep.matchPatternMeasures(mem.toDF(), st, evSpec)
      .writeStream.format("memory").queryName("alt_reuse_stream")
      .outputMode("append").start()
    try {
      evs.grouped(30).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    def rowKey(r: Row): Vector[Option[Long]] =
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i))).toVector
    val streamed = s.sql("SELECT * FROM alt_reuse_stream").collect()
      .map(rowKey).toVector.sortBy(_.toString)
    val batch = CepMeasures.run(evs.toDF(), st, evSpec).collect()
      .map(rowKey).toVector.sortBy(_.toString)
    assert(streamed.nonEmpty, "fixture produced no matches")
    assert(streamed == batch)
  }

  test("unsupported shapes reject loudly with the scope in the message") {
    def bad(s: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        CepSql.parseStatement(s, schema)
      }
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !~ '$frag'")
    }
    // no MEASURES
    bad("PATTERN (s -> c | s -> x) DEFINE s AS S; c AS C; x AS X",
      "add MEASURES")
    // ALL ROWS
    bad("PATTERN (s -> c | s -> x) MEASURES COUNT(c) AS n " +
      "ALL ROWS PER MATCH DEFINE s AS S; c AS C; x AS X",
      "would surface the hidden per-branch")
    // CLASSIFIER
    bad("PATTERN (s -> c | s -> x) MEASURES CLASSIFIER() AS w " +
      "DEFINE s AS S; c AS C; x AS X", "CLASSIFIER() would print")
    // LET registers on the reused name
    bad("PATTERN (s -> c | s -> x) MEASURES COUNT(c) AS n " +
      "DEFINE s AS S LET R = 0 THEN R + v; c AS C; x AS X",
      "LET/aggregate registers")
    // a DEFINE aggregate targeting the reused name: the desugared
    // register lands in the target's vars, so the LET check fires
    bad("PATTERN (s -> c | s -> x) MEASURES COUNT(c) AS n " +
      "DEFINE s AS S; c AS C WHERE SUM(s.v) < 9; x AS X",
      "LET/aggregate registers")
    // user SUBSET over the reused name
    bad("PATTERN (s -> c | s -> x) MEASURES COUNT(u) AS n " +
      "SUBSET u = (s, c) DEFINE s AS S; c AS C; x AS X",
      "a user SUBSET names 's'")
    // twice WITHIN one branch stays the generic loud error
    bad("PATTERN (s s | x) MEASURES COUNT(x) AS n " +
      "DEFINE s AS S; x AS X", "appears 2 times")
    // nested-alternation reuse stays the generic loud error
    bad("PATTERN ((s c | s x)?) MEASURES COUNT(c) AS n " +
      "DEFINE s AS S; c AS C; x AS X", "appears 2 times")
  }
}
