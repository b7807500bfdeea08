package graft.cep

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import SparkCep.CepSpec

/** SQL:2016 targeted `CLASSIFIER(U)` — U a pattern variable or SUBSET:
  * the name of the LAST row mapped to (a member of) U, NULL when none
  * is. ONE ROW = final semantics; ALL ROWS RUNNING = among the rows so
  * far; streaming = the emission fold restricted to the members.
  */
class CepClassifierTargetSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    "P" -> Vector("id", "v"))

  private def eventsDf(rows: (Long, Long, String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("k", "id", "t", "v")
  }

  test("ONE ROW: CLASSIFIER(var) and CLASSIFIER(subset) pick the " +
    "last mapped member; NULL when the target never binds") {
    val st = CepSql.parseStatement(
      "PATTERN (s -> (c{2,2} | p)) " +
        "MEASURES CLASSIFIER() AS all_cl, CLASSIFIER(s) AS s_cl, " +
        "CLASSIFIER(c) AS c_cl, CLASSIFIER(u) AS u_cl " +
        "SUBSET u = (c, p) " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE s AS S; c AS C; p AS P", schema)
    assert(CepSql.parseStatement(CepSql.render(st), schema) == st)
    // key 1 matches via the c-branch; key 2 via the p-branch
    val df = eventsDf(
      (1L, 1L, "S", 0L), (1L, 2L, "C", 5L), (1L, 3L, "C", 7L),
      (2L, 10L, "S", 0L), (2L, 11L, "P", 2L))
    def g(r: Row, c: String): String =
      if (r.isNullAt(r.fieldIndex(c))) "-" else r.getString(r.fieldIndex(c))
    val out = CepMeasures.run(df, st).orderBy("k").collect().map(r =>
      (r.getLong(r.fieldIndex("k")), g(r, "all_cl"), g(r, "s_cl"),
        g(r, "c_cl"), g(r, "u_cl"))).toVector
    assert(out == Vector(
      (1L, "c", "s", "c", "c"),
      (2L, "p", "s", "-", "p")))
  }

  test("ALL ROWS: RUNNING CLASSIFIER(U) is the last mapped member so " +
    "far (NULL before one binds); FINAL is over the whole match") {
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,2} -> p) " +
        "MEASURES CLASSIFIER(c) AS run_c, FINAL CLASSIFIER(c) AS fin_c " +
        "ALL ROWS PER MATCH PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE s AS S; c AS C; p AS P", schema)
    val df = eventsDf(
      (1L, 1L, "S", 0L), (1L, 2L, "C", 5L), (1L, 3L, "P", 2L))
    val out = CepMeasures.run(df, st).orderBy("id").collect().map { r =>
      (r.getLong(r.fieldIndex("id")),
        if (r.isNullAt(r.fieldIndex("run_c"))) "-"
        else r.getString(r.fieldIndex("run_c")),
        r.getString(r.fieldIndex("fin_c")))
    }.toVector
    assert(out == Vector(
      (1L, "-", "c"), (2L, "c", "c"), (3L, "c", "c")))
  }

  test("streaming: the targeted fold equals batch across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val spec = CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    val st = CepSql.parseStatement(
      "PATTERN (s -> (c{2,2} | p)) " +
        "MEASURES CLASSIFIER(u) AS outcome, CLASSIFIER(c) AS c_cl " +
        "SUBSET u = (c, p) " +
        "DEFINE s AS signup; c AS click; p AS purchase WITHIN 6",
      Vector("signup" -> Vector("event_id", "value"),
        "click" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value")))
    val rnd = new scala.util.Random(20260820L)
    val types = Vector("signup", "click", "purchase", "view")
    val evs = (1 to 120).map { i =>
      Ev(1L + rnd.nextInt(4), i.toLong, types(rnd.nextInt(4)),
        rnd.nextInt(50).toLong)
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev]
    val q = StreamingCep.matchPatternMeasures(mem.toDF(), st, spec)
      .writeStream.format("memory").queryName("cep_cl_target")
      .outputMode("append").start()
    try {
      evs.grouped(30).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    def shape(rows: Array[Row]) = rows.map { r =>
      (r.getLong(r.fieldIndex("user_id")),
        r.getString(r.fieldIndex("outcome")),
        if (r.isNullAt(r.fieldIndex("c_cl"))) "-"
        else r.getString(r.fieldIndex("c_cl")))
    }.toVector.sorted
    val streamed = shape(s.sql("SELECT * FROM cep_cl_target").collect())
    val batch = shape(CepMeasures.run(evs.toDF(), st, spec).collect())
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.exists(_._3 == "-") && streamed.exists(_._3 == "c"),
      "fixture should exercise both the bound and unbound target arms")
  }

  test("rejections: unknown target, attribute, arithmetic") {
    intercept[IllegalArgumentException] {
      CepSql.parseStatement(
        "PATTERN (s) MEASURES CLASSIFIER(nope) AS x " +
          "PARTITION BY k ORDER BY id TYPE t DEFINE s AS S", schema)
    }
    intercept[IllegalArgumentException] {
      CepSql.parseStatement(
        "PATTERN (s) MEASURES CLASSIFIER(s.v) AS x " +
          "PARTITION BY k ORDER BY id TYPE t DEFINE s AS S", schema)
    }
    intercept[IllegalArgumentException] {
      CepSql.parseStatement(
        "PATTERN (s) MEASURES CLASSIFIER(s) + 1 AS x " +
          "PARTITION BY k ORDER BY id TYPE t DEFINE s AS S", schema)
    }
  }
}
