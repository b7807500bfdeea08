package graft.cep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import SparkCep.CepSpec

/** SHOW EMPTY MATCHES and WITH UNMATCHED ROWS consume the match frame
  * twice (seed union + site derivation / output + bound set); without
  * the eager localCheckpoint in `CepMeasures.allRows`/`project` each
  * consumer would re-run the whole NFA sweep below it. Pinned the same
  * way `CepSharedSinglePassSpec` pins `runShared`: the skew gauge fires
  * once per event fed to `CepMatchExec`, so fed events must equal ONE
  * pass however often the result is consumed.
  */
class CepShowEmptySinglePassSpec extends AnyFunSuite
    with BeforeAndAfterAll {

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
    "A" -> Vector("id", "v"), "C" -> Vector("id", "v"))

  private def events(): DataFrame = {
    val rnd = new scala.util.Random(20260818L)
    val s = spark
    import s.implicits._
    (1 to 300).map(i =>
      (1L + rnd.nextInt(5), i.toLong,
        if (rnd.nextBoolean()) "A" else "C", rnd.nextInt(9).toLong))
      .toDF("k", "id", "t", "v")
  }

  private val spec = CepSpec(Some("k"), "id", "t", Seq("v"))

  private def onePass(df: DataFrame, st: CepSql.CepSqlStatement): Long = {
    val acc = CepSkewAccumulator.registered(spark, "se_probe_base")
    SparkCep.matchPatternExec(df, st.query, spec,
      skewAcc = Some(acc)).count()
    val e = acc.value.events
    assert(e > 0L, "probe stream fed no events — probe is vacuous")
    e
  }

  test("SHOW EMPTY (ALL ROWS): one NFA sweep however often the " +
    "result is consumed") {
    val df = events()
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    val base = onePass(df, st)
    val acc = CepSkewAccumulator.registered(spark, "se_probe_show")
    val frames = SparkCep.matchPatternExec(df, st.query, spec,
      skewAcc = Some(acc))
    val out = CepMeasures.allRows(frames, df, st.query, spec,
      st.measures, showEmpty = true)
    out.collect(); out.collect()
    assert(acc.value.events == base,
      s"show-empty fed ${acc.value.events} events, expected $base " +
        "(one sweep)")
  }

  test("SHOW EMPTY (ONE ROW): one NFA sweep") {
    val df = events()
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    val base = onePass(df, st)
    val acc = CepSkewAccumulator.registered(spark, "se_probe_one")
    val frames = SparkCep.matchPatternExec(df, st.query, spec,
      skewAcc = Some(acc))
    val out = CepMeasures.project(frames, df, st.query, spec,
      st.measures, showEmpty = true)
    out.collect(); out.collect()
    assert(acc.value.events == base,
      s"one-row show-empty fed ${acc.value.events} events, expected " +
        s"$base (one sweep)")
  }

  test("WITH UNMATCHED ROWS: one NFA sweep (output + bound set share " +
    "the materialized frame)") {
    val df = events()
    val st = CepSql.parseStatement(
      "PATTERN (c{1,2}) MEASURES COUNT(c) AS n_c " +
        "ALL ROWS PER MATCH WITH UNMATCHED ROWS " +
        "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C", schema)
    val base = onePass(df, st)
    val acc = CepSkewAccumulator.registered(spark, "se_probe_unm")
    val frames = SparkCep.matchPatternExec(df, st.query, spec,
      skewAcc = Some(acc))
    val out = CepMeasures.allRows(frames, df, st.query, spec,
      st.measures, withUnmatched = true)
    out.collect(); out.collect()
    assert(acc.value.events == base,
      s"unmatched fed ${acc.value.events} events, expected $base " +
        "(one sweep)")
  }
}
