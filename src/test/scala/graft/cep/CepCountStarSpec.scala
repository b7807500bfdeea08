package graft.cep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SQL:2016 `COUNT(*)` / `COUNT(name.*)` in MEASURES (parse-side
  * sugar): `COUNT(name.*)` ≡ positional `COUNT(name)`; `COUNT(*)`
  * desugars to the sum of per-name positional counts (plain `COUNT(n)`
  * for a one-name pattern), so it rides the batch tier, the ALL ROWS
  * running windows, and the streaming emission fold without any new
  * machinery.
  */
class CepCountStarSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("COUNT(*) desugars to the per-name count sum; COUNT(name.*) " +
    "to the positional count; render prints the desugared form") {
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,2} -> p) " +
        "MEASURES COUNT(*) AS n_rows, COUNT(c.*) AS n_c " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE s AS S; c AS C; p AS P", schema)
    // c{1,2} names three variables: the sum form
    assert(st.measures.head.isInstanceOf[CepMeasures.ExprMeasure])
    val r = CepSql.render(st)
    assert(r.contains("COUNT(s) + COUNT(c) + COUNT(p) AS n_rows"))
    assert(r.contains("COUNT(c) AS n_c"))
    assert(CepSql.parseStatement(r, schema) == st)
    // one-name pattern: plain positional count
    val one = CepSql.parseStatement(
      "PATTERN (c{1,3}) MEASURES COUNT(*) AS n " +
        "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C", schema)
    assert(one.measures == Vector(
      CepMeasures.Measure(CepMeasures.Fn.Count, "c", None, "n")))
  }

  test("COUNT(*) excludes GROUP labels from the desugared sum (labels " +
    "bind no events)") {
    val st = CepSql.parseStatement(
      "PATTERN ((s c){1,}:g) MEASURES COUNT(*) AS n " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE s AS S; c AS C; g AS GROUP UNTIL v > 90", schema)
    val r = CepSql.render(st)
    assert(r.contains("COUNT(s) + COUNT(c) AS n") && !r.contains("COUNT(g)"))
    // S(1) C(2): one group iteration, two bound rows
    val df = eventsDf((1L, 1L, "S", 0L), (1L, 2L, "C", 5L))
    val out = CepMeasures.run(df, st).collect()
      .map(_.getLong(1)).toVector
    assert(out == Vector(2L))
  }

  test("batch: COUNT(*) is the match's row count") {
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,2} -> p) " +
        "MEASURES COUNT(*) AS n_rows, COUNT(c.*) AS n_c " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE s AS S; c AS C; p AS P", schema)
    // S C C P: two matches (1-click and 2-click arms) — 3 and 4 rows
    val df = eventsDf((1L, 1L, "S", 0L), (1L, 2L, "C", 5L),
      (1L, 3L, "C", 7L), (1L, 4L, "P", 2L))
    val out = CepMeasures.run(df, st).orderBy("n_rows").collect()
      .map(r => (r.getLong(r.fieldIndex("n_rows")),
        r.getLong(r.fieldIndex("n_c")))).toVector
    assert(out == Vector((3L, 1L), (4L, 2L)))
  }

  test("ALL ROWS: RUNNING COUNT(*) counts the match's rows so far") {
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,1} -> p) MEASURES COUNT(*) AS n_sofar " +
        "ALL ROWS PER MATCH PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE s AS S; c AS C; p AS P", schema)
    val df = eventsDf((1L, 1L, "S", 0L), (1L, 2L, "C", 5L),
      (1L, 3L, "P", 2L))
    val out = CepMeasures.run(df, st).orderBy("id").collect()
      .map(r => r.getLong(r.fieldIndex("n_sofar"))).toVector
    assert(out == Vector(1L, 2L, 3L))
  }

  test("streaming: the desugared sum rides the emission fold") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id",
      "event_type", Seq("value"))
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,2} -> p) MEASURES COUNT(*) AS n_rows " +
        "DEFINE s AS signup; c AS click; p AS purchase WITHIN 6",
      Vector("signup" -> Vector("event_id", "value"),
        "click" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value")))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev]
    val q = StreamingCep.matchPatternMeasures(mem.toDF(), st, spec)
      .writeStream.format("memory").queryName("cep_count_star")
      .outputMode("append").start()
    val evs = Seq(Ev(1L, 1L, "signup", 0L), Ev(1L, 2L, "click", 5L),
      Ev(1L, 3L, "click", 7L), Ev(1L, 4L, "purchase", 2L))
    try {
      evs.grouped(2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = s.sql("SELECT n_rows FROM cep_count_star").collect()
      .map(_.getLong(0)).toVector.sorted
    assert(streamed == Vector(3L, 4L))
  }
}
