package graft.cep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import SparkCep.CepSpec

/** SQL:2016 `{- x -}` output exclusion (`CepSql` unit production +
  * `CepMeasures.allRows`): the excluded unit matches, binds and feeds
  * MEASURES normally — only its rows are omitted from `ALL ROWS PER
  * MATCH` output. Pinned: the running/final aggregates on SURVIVING
  * rows still include the excluded rows' contributions (the filter sits
  * ABOVE the window computation and Catalyst cannot push a classifier
  * predicate below a window partitioned by (key, match_no)).
  */
class CepExclusionSpec extends AnyFunSuite with BeforeAndAfterAll {

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
  private val spec = CepSpec(Some("k"), "id", "t", Seq("v"))

  private def eventsDf(rows: (Long, Long, String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("k", "id", "t", "v")
  }

  private val exclSql =
    "PATTERN (s -> {- c{1,2} -} -> p) " +
      "MEASURES COUNT(c) AS n_c, SUM(c.v) AS c_sum " +
      "ALL ROWS PER MATCH PARTITION BY k ORDER BY id TYPE t " +
      "DEFINE s AS S; c AS C; p AS P"

  test("parse records the exclusion; render round-trips it") {
    val st = CepSql.parseStatement(exclSql, schema)
    assert(st.excluded == Vector("c"))
    // the lowered pattern is IDENTICAL to the unexcluded one — matching
    // is unaffected
    val plain = CepSql.parseStatement(exclSql.replace("{- c{1,2} -}",
      "c{1,2}"), schema)
    assert(st.query == plain.query)
    assert(CepSql.parseStatement(CepSql.render(st), schema) == st)
  }

  test("exclusion requires ALL ROWS PER MATCH") {
    val e = intercept[IllegalArgumentException] {
      CepSql.parseStatement(
        "PATTERN (s {- c -} p) MEASURES COUNT(c) AS n_c " +
          "DEFINE s AS S; c AS C; p AS P", schema)
    }
    assert(e.getMessage.contains("ALL ROWS PER MATCH"))
    // and `parse` (the CepQuery-only surface) never sees one: it
    // requires ONE ROW semantics, so the same rejection fires
    intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN (s {- c -} p) DEFINE s AS S; c AS C; p AS P",
        schema)
    }
  }

  test("excluded rows are omitted from output but still feed running " +
    "and final measures on surviving rows") {
    val st = CepSql.parseStatement(
      "PATTERN (s -> {- c{2,2}~ -} -> p) " +
        "MEASURES COUNT(c) AS n_c, SUM(c.v) AS c_sum, " +
        "FINAL SUM(c.v) AS fin_sum " +
        "ALL ROWS PER MATCH PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE s AS S; c AS C; p AS P", schema)
    // one match: s(1) c(2,v=5) c(3,v=9) p(4)
    val df = eventsDf((1L, 1L, "S", 0L), (1L, 2L, "C", 5L),
      (1L, 3L, "C", 9L), (1L, 4L, "P", 2L))
    val out = CepMeasures.run(df, st).orderBy("id").collect().map { r =>
      (r.getString(r.fieldIndex("classifier")),
        r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("n_c")),
        if (r.isNullAt(r.fieldIndex("c_sum"))) -1L
        else r.getLong(r.fieldIndex("c_sum")),
        r.getLong(r.fieldIndex("fin_sum")))
    }.toVector
    // the two c rows are GONE; the p row's running count/sum and the s
    // row's FINAL sum prove the excluded rows fed the windows
    assert(out == Vector(
      ("s", 1L, 0L, -1L, 14L),
      ("p", 4L, 2L, 14L, 14L)))
  }

  test("unknown excluded name rejected loudly") {
    val st = CepSql.parseStatement(exclSql, schema)
    val df = eventsDf((1L, 1L, "S", 0L))
    val e = intercept[IllegalArgumentException] {
      CepMeasures.allRows(
        SparkCep.matchPatternExec(df, st.query, spec), df, st.query,
        spec, st.measures, excluded = Set("nope"))
    }
    assert(e.getMessage.contains("not a pattern name"))
  }

  test("lexer: '{-' / '-}' do not collide with quantifier braces or '->'") {
    // a quantifier brace immediately after an excluded unit, and an
    // arrow right before '-}' would be the confusable neighborhoods
    val st = CepSql.parseStatement(
      "PATTERN (s {- c{1,2} -} -> p) " +
        "MEASURES COUNT(c) AS n_c ALL ROWS PER MATCH " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE s AS S; c AS C; p AS P", schema)
    assert(st.excluded == Vector("c"))
    intercept[IllegalArgumentException] {
      CepSql.parseStatement(
        "PATTERN (s {- (c p) -}) ALL ROWS PER MATCH " +
          "PARTITION BY k ORDER BY id TYPE t " +
          "DEFINE s AS S; c AS C; p AS P", schema)
    }
  }
}
