package graft.cep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SQL:2016 multi-column `PARTITION BY a, b, …`
  * (`CepMeasures.runMultiKey` + the grammar list production): matching
  * keys on ONE xxhash64 composite column, and the ORIGINAL partition
  * columns are joined back into the output, leading the schema. Pinned:
  * composite-vs-derived-column equivalence (the same query over a
  * caller-concatenated key column yields the same matches), NULL in any
  * partition column drops the row (the null-key contract), spec/shared/
  * streaming rejections, and render round-trip.
  */
class CepMultiKeySpec extends AnyFunSuite with BeforeAndAfterAll {

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
    "C" -> Vector("id", "v"), "P" -> Vector("id", "v"))

  private def eventsDf(rows: (java.lang.Long, String, Long, String, Long)*)
      : DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("u", "region", "id", "t", "v")
  }

  private val sql =
    "PATTERN (a b) MEASURES FIRST(a) AS a_id, LAST(b) AS b_id, " +
      "SUM(b.v) AS b_v " +
      "PARTITION BY u, region ORDER BY id TYPE t " +
      "DEFINE a AS C; b AS C"

  test("parse records the column list; render round-trips; spec is " +
    "rejected with a pointer to run") {
    val st = CepSql.parseStatement(sql, schema)
    assert(st.partitionBy.isEmpty)
    assert(st.partitionByCols == Vector("u", "region"))
    assert(CepSql.render(st).contains("PARTITION BY u, region"))
    assert(CepSql.parseStatement(CepSql.render(st), schema) == st)
    val e = intercept[IllegalArgumentException](st.spec)
    assert(e.getMessage.contains("CepMeasures.run"))
    intercept[IllegalArgumentException] {
      CepSql.parseStatement(sql.replace("u, region", "u, u"), schema)
    }
  }

  test("composite partitions: adjacent pairs within (u, region), " +
    "original columns restored and leading the schema") {
    // u=1 has region x: C C (pair) and region y: C C (pair) interleaved
    // by id — a single-key-u run would see them as NON-adjacent
    val df = eventsDf(
      (1L, "x", 1L, "C", 10L), (1L, "y", 2L, "C", 5L),
      (1L, "x", 3L, "C", 20L), (1L, "y", 4L, "C", 7L),
      (2L, "x", 5L, "C", 1L), (2L, "x", 6L, "P", 9L))
    val st = CepSql.parseStatement(sql, schema)
    val out = CepMeasures.run(df, st)
    assert(out.columns.take(2).toSeq == Seq("u", "region"))
    val got = out.orderBy("u", "region").collect().map { r =>
      (r.getLong(r.fieldIndex("u")), r.getString(r.fieldIndex("region")),
        r.getLong(r.fieldIndex("a_id")), r.getLong(r.fieldIndex("b_id")),
        r.getLong(r.fieldIndex("b_v")))
    }.toVector
    assert(got == Vector(
      (1L, "x", 1L, 3L, 20L),
      (1L, "y", 2L, 4L, 7L)))
  }

  test("equivalence with a caller-derived composite column") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 300L).map { i =>
      (java.lang.Long.valueOf(i % 5), if (i % 3 == 0) "x" else "y", i,
        if (rnd.nextBoolean()) "C" else "P", rnd.nextInt(50).toLong)
    }
    val df = eventsDf(rows: _*)
    val multi = CepMeasures.run(df, CepSql.parseStatement(sql, schema))
      .selectExpr("concat(u, '|', region) AS ck", "a_id", "b_id", "b_v")
    val single = CepMeasures.run(
      df.selectExpr("xxhash64(concat(u, '|', region)) IS NOT NULL AS _d",
        "concat(u, '|', region) AS ck", "id", "t", "v").drop("_d"),
      CepSql.parseStatement(sql.replace(
        "PARTITION BY u, region", "PARTITION BY ck"), schema))
    // the single-key string path outputs the HASH as the key — compare
    // on the measure tuple multiset keyed by original composite
    def shape(d: DataFrame, withKey: Boolean) =
      d.collect().map { r =>
        ((if (withKey) r.getString(r.fieldIndex("ck")) else ""),
          r.getLong(r.fieldIndex("a_id")), r.getLong(r.fieldIndex("b_id")),
          r.getLong(r.fieldIndex("b_v")))
      }.sortBy(t => (t._2, t._3))
    val m = shape(multi, withKey = true)
    val s = shape(single, withKey = false)
    assert(m.map(t => (t._2, t._3, t._4)).toVector ==
      s.map(t => (t._2, t._3, t._4)).toVector)
  }

  test("NULL in any partition column drops the row (null-key contract)") {
    val df = eventsDf(
      (null, "x", 1L, "C", 1L), (null, "x", 2L, "C", 2L),
      (3L, "x", 5L, "C", 1L), (3L, "x", 6L, "C", 9L))
    val st = CepSql.parseStatement(sql, schema)
    val got = CepMeasures.run(df, st).collect().map(r =>
      (r.getLong(r.fieldIndex("u")), r.getLong(r.fieldIndex("b_v"))))
    assert(got.toVector == Vector((3L, 9L)))
  }

  test("multi-key works under ALL ROWS and SHOW EMPTY modes too") {
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY u, region ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    val df = eventsDf((1L, "x", 1L, "P", 0L), (1L, "x", 2L, "C", 5L))
    val out = CepMeasures.run(df, st).orderBy("id").collect().map { r =>
      (r.getString(r.fieldIndex("region")),
        r.getLong(r.fieldIndex("match_no")),
        if (r.isNullAt(r.fieldIndex("classifier"))) "-"
        else r.getString(r.fieldIndex("classifier")),
        r.getLong(r.fieldIndex("n_c")))
    }.toVector
    assert(out == Vector(("x", 1L, "-", 0L), ("x", 2L, "c", 1L)))
  }

  test("rejections: shared scan and unknown column") {
    val e1 = intercept[IllegalArgumentException] {
      CepSql.parseStatements(Seq("m" -> sql), schema)
    }
    assert(e1.getMessage.contains("PARTITION BY"))
    val df = eventsDf((1L, "x", 1L, "C", 1L))
    val e2 = intercept[IllegalArgumentException] {
      CepMeasures.run(df.drop("region"),
        CepSql.parseStatement(sql, schema))
    }
    assert(e2.getMessage.contains("not a column"))
  }
}
