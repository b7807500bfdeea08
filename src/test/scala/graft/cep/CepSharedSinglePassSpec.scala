package graft.cep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import SparkCep.CepSpec
import graft.ops.CacheLease

/** `CepMeasures.runShared` executes the shared NFA sweep exactly ONCE,
  * however many members there are and however the caller consumes the
  * returned frames.
  *
  * Without materialization each member frame carries its own copy of the
  * full `CepMultiMatchExec` subtree; ReuseExchange dedupes the scan and
  * key shuffle BELOW the operator, but the sweep itself re-runs k times,
  * each time matching all k patterns — k× the cost of one shared pass,
  * invisible on small data, a scale-killer at 100×. The probe is the
  * skew gauge: `CepMultiMatchExec` fires `skewAcc.add` once per event
  * fed (never per (event × query)), so `Stats.events` after consuming
  * every member equals the single-pass feed count iff the sweep ran
  * once. Accumulators only over-count on task retries, which a healthy
  * local run has none of — an exact-equality probe here, not a bound.
  */
class CepSharedSinglePassSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val stmts = CepSql.parseStatements(Seq(
    "m1" -> ("PATTERN (s p) MEASURES FIRST(s) AS a, SUM(p.v) AS d " +
      "DEFINE s AS S; p AS P"),
    "m2" -> ("PATTERN (s c) MEASURES FIRST(s) AS a, SUM(c.v) AS d " +
      "DEFINE s AS S; c AS C"),
    "m3" -> ("PATTERN (c p) MEASURES FIRST(c) AS a, SUM(p.v) AS d " +
      "DEFINE c AS C; p AS P")), schema)

  private def events(): DataFrame = {
    val rnd = new scala.util.Random(20260815L)
    val types = Vector("S", "C", "P")
    val rows = (1 to 240).map { i =>
      (1L + rnd.nextInt(6), i.toLong, types(rnd.nextInt(3)),
        rnd.nextInt(9).toLong)
    }
    val s = spark
    import s.implicits._
    rows.toDF("k", "id", "t", "v")
  }

  /** Events one shared pass feeds (post-pushdown), measured directly on
    * the shared operator with no measure projection above it.
    */
  private def singlePassEvents(df: DataFrame): Long = {
    val acc = CepSkewAccumulator.registered(spark, "probe_base")
    SparkCep.matchPatternsShared(df,
      stmts.map { case (n, st) => n -> st.query }, spec,
      skewAcc = Some(acc)).count()
    val e = acc.value.events
    assert(e > 0L, "probe stream fed no events — probe is vacuous")
    e
  }

  test("default (localCheckpoint): one sweep total, consumed as a " +
    "union and re-consumed per member") {
    val df = events()
    val onePass = singlePassEvents(df)
    val acc = CepSkewAccumulator.registered(spark, "probe_lc")
    val members =
      CepMeasures.runShared(df, stmts, spec, skewAcc = Some(acc))
    // eager localCheckpoint: the sweep already ran, exactly once
    assert(acc.value.events == onePass,
      s"materialization ran ${acc.value.events} events, expected $onePass")
    // consuming every member — unioned AND individually — adds nothing
    members.map(_._2).reduce(_ unionByName _).collect()
    members.foreach(_._2.collect())
    assert(acc.value.events == onePass,
      s"consumption re-ran the sweep: ${acc.value.events} != $onePass")
  }

  test("lease (persist): one sweep total across separate per-member " +
    "actions, zero after release until re-consumed") {
    val df = events()
    val onePass = singlePassEvents(df)
    val acc = CepSkewAccumulator.registered(spark, "probe_lease")
    val lease = new CacheLease
    try {
      val members = CepMeasures.runShared(df, stmts, spec,
        lease = Some(lease), skewAcc = Some(acc))
      // persist is lazy: nothing ran yet
      assert(acc.value.events == 0L, "lease path executed eagerly")
      // first consumer materializes the cache — one sweep; the rest hit it
      members.foreach(_._2.collect())
      members.map(_._2).reduce(_ unionByName _).collect()
      assert(acc.value.events == onePass,
        s"lease path swept ${acc.value.events} events, expected $onePass")
    } finally lease.close()
  }

  test("anchored members ride the shared scan: ^ and $ members equal " +
    "their solo runs (isLast threads through the multi-exec; the " +
    "anchored members also disable the union prefilter)") {
    val anchored = CepSql.parseStatements(Seq(
      "first" -> ("PATTERN (^ s -> p) MEASURES FIRST(s) AS a, " +
        "SUM(p.v) AS d DEFINE s AS S; p AS P"),
      "last" -> ("PATTERN (s p $) MEASURES FIRST(s) AS a, " +
        "SUM(p.v) AS d DEFINE s AS S; p AS P"),
      "plain" -> ("PATTERN (s c) MEASURES FIRST(s) AS a, " +
        "SUM(c.v) AS d DEFINE s AS S; c AS C")), schema)
    val df = events()
    def canon(d: DataFrame): Vector[String] =
      d.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
        .toVector.sorted
    for ((name, got) <- CepMeasures.runShared(df, anchored, spec)) {
      val st = anchored.find(_._1 == name).get._2
      val solo = canon(CepMeasures.run(df, st, spec))
      assert(canon(got) == solo, s"member $name diverged from solo")
      if (name == "first" || name == "last")
        assert(solo.nonEmpty, s"$name produced no matches — vacuous")
    }
  }

  test("ALL ROWS members ride the shared scan: plain, WITH UNMATCHED " +
    "ROWS and SHOW EMPTY MATCHES members equal their solo runs, and " +
    "the mixed set still sweeps once") {
    val mixed = CepSql.parseStatements(Seq(
      "one" -> ("PATTERN (s p) MEASURES FIRST(s) AS a, SUM(p.v) AS d " +
        "DEFINE s AS S; p AS P"),
      "all" -> ("PATTERN (s c) MEASURES COUNT(c) AS n, SUM(c.v) AS d " +
        "ALL ROWS PER MATCH DEFINE s AS S; c AS C"),
      "unm" -> ("PATTERN (s c) MEASURES COUNT(c) AS n " +
        "ALL ROWS PER MATCH WITH UNMATCHED ROWS " +
        "DEFINE s AS S; c AS C AFTER MATCH SKIP TO NEXT ROW"),
      "empt" -> ("PATTERN (c{0,2}) MEASURES COUNT(c) AS n, " +
        "SUM(c.v) AS d ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW")), schema)
    val df = events()
    // one sweep for the whole mixed set, however the members re-consume
    // their slices (UNMATCHED reads its slice twice, SHOW EMPTY three
    // times — all behind the shared materialization + their own
    // localCheckpoint)
    val accBase = CepSkewAccumulator.registered(spark, "probe_mix_base")
    SparkCep.matchPatternsShared(df,
      mixed.map { case (n, st) => n -> st.query }, spec,
      skewAcc = Some(accBase)).count()
    val onePass = accBase.value.events
    assert(onePass > 0L)
    val acc = CepSkewAccumulator.registered(spark, "probe_mix")
    val members = CepMeasures.runShared(df, mixed, spec,
      skewAcc = Some(acc))
    members.foreach(_._2.collect())
    assert(acc.value.events == onePass,
      s"mixed set swept ${acc.value.events} events, expected $onePass")
    def canon(d: DataFrame): Vector[String] =
      d.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
        .toVector.sorted
    for ((name, got) <- members) {
      val st = mixed.find(_._1 == name).get._2
      val solo = canon(CepMeasures.run(df, st, spec))
      assert(canon(got) == solo, s"member $name diverged from solo")
      assert(solo.nonEmpty, s"member $name matched nothing — vacuous")
    }
  }

  test("shared members still equal solo runs (fix changed cost, not " +
    "semantics)") {
    val df = events()
    def canon(d: DataFrame): Vector[String] =
      d.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
        .toVector.sorted
    for ((name, got) <- CepMeasures.runShared(df, stmts, spec)) {
      val st = stmts.find(_._1 == name).get._2
      assert(canon(got) == canon(CepMeasures.run(df, st, spec)),
        s"member $name diverged from solo")
    }
  }
}
