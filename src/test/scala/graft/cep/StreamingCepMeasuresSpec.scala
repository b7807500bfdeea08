package graft.cep

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming MEASURES (`StreamingCep.matchPatternMeasures`): the
  * emission-time fold must equal the BATCH measures tier
  * (`CepMeasures.run` — the explode/join/aggregate formulation)
  * row-for-row when the same events arrive across micro-batch
  * boundaries, and a partial match must complete across a checkpointed
  * restart with its measures intact. The two tiers compute the same
  * semantics through entirely different machinery (pure fold over bound
  * events vs relational join-back), so the gate is also a
  * cross-validation of both.
  */
class StreamingCepMeasuresSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val st = CepSql.parseStatement(
    "PATTERN (s -> c{1,2} -> p) " +
      "MEASURES FIRST(s) AS s_id, COUNT(c) AS n_c, SUM(c.value) AS c_sum, " +
      "MIN(c.value) AS c_min, AVG(c.value) AS c_avg, " +
      "LAST(c.value) AS c_last, LAST(p) AS p_id, " +
      // offset FIRST/LAST: NULL on the c{1} fork (binding shorter than
      // the offset), the 2nd/2nd-last click on the c{1,2} one
      "FIRST(c.value, 1) AS c_2nd, LAST(c, 1) AS c_pen, " +
      // a measure expression: folds per atom at emission, combined in
      // long arithmetic — batch==stream covers the expression tier too
      "LAST(c.value) - FIRST(c.value) AS c_spread, " +
      // aggregate-ARGUMENT expressions: per-event arithmetic inside the
      // aggregate (AExpr) — the fold and the batch column lowering must
      // agree, including the `/` zero-divisor NULL poison
      "SUM(c.value * c.value) AS c_energy, " +
      "AVG(2 * c.value + 1) AS c_sc, " +
      "MAX(c.value - 25) AS c_hi, " +
      "LAST(p.value / (p.value - 10)) AS p_div, " +
      // DISTINCT aggregates: the fold's .distinct must equal batch's
      // count_distinct/sum_distinct (bucketed so duplicates occur)
      "COUNT(DISTINCT c.value / 3) AS c_db, " +
      "SUM(DISTINCT c.value) AS c_ds " +
      "DEFINE s AS signup; c AS click; p AS purchase WITHIN 8", schema)

  private def rowKey(r: Row): Vector[Option[Long]] =
    (0 until r.length).map(i =>
      if (r.isNullAt(i)) None else Some(r.getLong(i))).toVector

  test("streaming measures == batch measures across micro-batch " +
    "boundaries (seeded stream)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    val types = Vector("signup", "click", "purchase", "view")
    val evs = (1 to 120).map { i =>
      Ev(1L + rnd.nextInt(3), i.toLong, types(rnd.nextInt(4)),
        rnd.nextInt(50).toLong)
    }

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingCep.matchPatternMeasures(mem.toDF(), st, spec)
    assert(out.columns.toVector ==
      "user_id" +: st.measures.map(_.alias))
    val q = out.writeStream.format("memory").queryName("cep_meas_stream")
      .outputMode("append").start()
    try {
      // 4 micro-batches of 30 — plenty of partial matches span boundaries
      evs.grouped(30).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = s.sql("SELECT * FROM cep_meas_stream").collect()
      .map(rowKey).toVector.sortBy(_.toString)
    val batch = CepMeasures.run(evs.toDF(), st, spec).collect()
      .map(rowKey).toVector.sortBy(_.toString)
    assert(streamed.nonEmpty, "fixture produced no matches")
    assert(streamed == batch)
  }

  test("^-anchored streaming measures == batch across micro-batch " +
    "boundaries (the seed-once + firstTake gate rides the codec)") {
    val s = spark
    import s.implicits._
    val stA = CepSql.parseStatement(
      "PATTERN (^ s -> c) MEASURES FIRST(s) AS s_id, LAST(c) AS c_id, " +
        "SUM(c.value) AS c_sum DEFINE s AS signup; c AS click", schema)
    val rnd = new scala.util.Random(20260821L)
    val types = Vector("signup", "click", "purchase")
    val evs = (1 to 90).map { i =>
      Ev(1L + rnd.nextInt(6), i.toLong, types(rnd.nextInt(3)),
        rnd.nextInt(50).toLong)
    }
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingCep.matchPatternMeasures(mem.toDF(), stA, spec)
      .writeStream.format("memory").queryName("cep_meas_anchor")
      .outputMode("append").start()
    try {
      evs.grouped(20).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = s.sql("SELECT * FROM cep_meas_anchor").collect()
      .map(rowKey).toVector.sortBy(_.toString)
    val batch = CepMeasures.run(evs.toDF(), stA, spec).collect()
      .map(rowKey).toVector.sortBy(_.toString)
    assert(streamed.nonEmpty, "fixture produced no anchored matches")
    assert(streamed == batch)
    // '$' is rejected loudly by the streaming measures operator too
    val stEnd = CepSql.parseStatement(
      "PATTERN (s -> c $) MEASURES FIRST(s) AS s_id " +
        "DEFINE s AS signup; c AS click", schema)
    val e = intercept[IllegalArgumentException] {
      StreamingCep.matchPatternMeasures(mem.toDF(), stEnd, spec)
    }
    assert(e.getMessage.contains("batch-only"))
  }

  test("CLASSIFIER() streams: batch==stream over an alternation " +
    "(which branch closed the match), string-typed output column") {
    val s = spark
    import s.implicits._
    // s then EITHER a strict click pair OR a purchase — the classifier
    // is the match's final pattern name ('c' or 'p'), folded at
    // emission (no state beyond the match itself)
    val stC = CepSql.parseStatement(
      "PATTERN (s -> (c{2,2} | p)) MEASURES FIRST(s) AS s_id, " +
        "CLASSIFIER() AS outcome, COUNT(c) AS n_c " +
        "DEFINE s AS signup; c AS click; p AS purchase WITHIN 6", schema)
    val rnd = new scala.util.Random(20260816L)
    val types = Vector("signup", "click", "purchase", "view")
    val evs = (1 to 120).map { i =>
      Ev(1L + rnd.nextInt(4), i.toLong, types(rnd.nextInt(4)),
        rnd.nextInt(50).toLong)
    }
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingCep.matchPatternMeasures(mem.toDF(), stC, spec)
    assert(out.schema("outcome").dataType ==
      org.apache.spark.sql.types.StringType)
    val q = out.writeStream.format("memory").queryName("cep_meas_cl")
      .outputMode("append").start()
    try {
      evs.grouped(30).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    def shape(r: Row): (Long, Long, String, Long) =
      (r.getLong(r.fieldIndex("user_id")),
        r.getLong(r.fieldIndex("s_id")),
        r.getString(r.fieldIndex("outcome")),
        r.getLong(r.fieldIndex("n_c")))
    val streamed = s.sql("SELECT * FROM cep_meas_cl").collect()
      .map(shape).toVector.sorted
    val batch = CepMeasures.run(evs.toDF(), stC, spec).collect()
      .map(shape).toVector.sorted
    assert(streamed.nonEmpty, "fixture produced no matches")
    assert(streamed.exists(_._3 == "c") && streamed.exists(_._3 == "p"),
      "fixture should exercise both branches")
    assert(streamed == batch)
    // the SHARED reporting shape carries it too (round 16): string
    // measures land in the `smeasures` string map — gate-pinned
    // batch==stream in StreamingCepSharedMeasuresSpec; here just the
    // schema contract
    val sharedOut = StreamingCep.matchPatternsSharedMeasures(mem.toDF(),
      Seq("m" -> stC), spec)
    assert(sharedOut.schema("smeasures").dataType ==
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
    // MATCH_NUMBER() stays rejected
    val stMn = CepSql.parseStatement(
      "PATTERN (s -> p) MEASURES MATCH_NUMBER() AS mn " +
        "DEFINE s AS signup; p AS purchase", schema)
    val e2 = intercept[IllegalArgumentException] {
      StreamingCep.matchPatternMeasures(mem.toDF(), stMn, spec)
    }
    assert(e2.getMessage.contains("MATCH_NUMBER"))
  }

  test("empty optional binding streams as COUNT 0 / NULLs, like batch") {
    val s = spark
    import s.implicits._
    val stOpt = CepSql.parseStatement(
      "PATTERN (s c? -> p) " +
        "MEASURES COUNT(c) AS n_c, SUM(c.value) AS c_sum, " +
        "FIRST(p.value) AS p_v " +
        "DEFINE s AS signup; c AS click; p AS purchase", schema)
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingCep.matchPatternMeasures(mem.toDF(), stOpt, spec)
      .writeStream.format("memory").queryName("cep_meas_opt")
      .outputMode("append").start()
    try {
      mem.addData(Ev(7, 1, "signup", 0), Ev(7, 2, "purchase", 9))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.sql("SELECT * FROM cep_meas_opt").collect().toVector
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("n_c")) == 0L)
    assert(r.isNullAt(r.fieldIndex("c_sum")))
    assert(r.getLong(r.fieldIndex("p_v")) == 9L)
  }

  test("measures survive a checkpointed restart (partial match " +
    "completes after restart)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ckpt-meas").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/checkpoint"
    val outDir = s"$dir/out"
    val inSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", LongType)))

    def startQuery() = {
      val in = graft.sources.EventSource.jsonStream(spark, inDir, inSchema)
      StreamingCep.matchPatternMeasures(in, st, spec)
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // batch 1: signup + first click — partial run held in the store
    Seq((1L, 1L, "signup", 0L), (1L, 2L, "click", 7L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // restart: second click + purchase complete two funnel matches
    // (c=[2] and c=[2,3] — the strict {1,2} loop forks)
    Seq((1L, 3L, "click", 4L), (1L, 4L, "purchase", 9L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val outSchema = StructType(
      StructField("user_id", LongType) +:
        st.measures.map(m => StructField(m.alias, LongType)))
    val out = spark.read.schema(outSchema).json(outDir)
      .collect().map(rowKey).toSet
    def v(xs: Option[Long]*): Vector[Option[Long]] = xs.toVector
    def l(x: Long): Option[Long] = Some(x)
    val no = Option.empty[Long]
    assert(out == Set(
      // (user, s_id, n_c, c_sum, c_min, c_avg, c_last, p_id, c_2nd,
      //  c_pen, c_spread, c_energy, c_sc, c_hi, p_div, c_db, c_ds)
      // c=[2]: the offset measures fall off the 1-click binding;
      // arg exprs over v=7: 49, (15)//1, 7-25, p: 9/(9-10); distinct
      // buckets {7/3}={2} → 1, distinct values {7} → 7
      v(l(1), l(1), l(1), l(7), l(7), l(7), l(7), l(4), no, no, l(0),
        l(49), l(15), l(-18), l(-9), l(1), l(7)),
      // c=[2,3] (v 7,4): 2nd click's value 4; 2nd-from-last ordinal 2;
      // arg exprs: 49+16, (15+9)//2, max(-18,-21), 9/(9-10); buckets
      // {2,1} → 2, distinct values {7,4} → 11
      v(l(1), l(1), l(2), l(11), l(4), l(5), l(4), l(4), l(4), l(2),
        l(-3), l(65), l(12), l(-18), l(-9), l(2), l(11))))
  }
}
