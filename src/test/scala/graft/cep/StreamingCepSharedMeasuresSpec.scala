package graft.cep

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** batch == stream gate for the MEASURED shared-scan operator
  * (`StreamingCep.matchPatternsSharedMeasures`): the sf0.001 events
  * table replayed as four ordered micro-batches must reproduce
  * `CepMeasures.runShared` member-for-member — the emission-time
  * measure folds (plain atoms, offsets, SUBSET unions, expressions)
  * over cross-batch state must equal the batch explode→join→aggregate
  * tier value-exactly, through the map-typed uniform output shape.
  *
  * Plus the state-compat pin (the scaladoc's "a checkpoint written by
  * either operator restores into the other"): a checkpoint written by
  * the BINDING-shape shared operator is restored by the MEASURES one
  * mid-match, and the spanning match comes out measured.
  */
class StreamingCepSharedMeasuresSpec extends AnyFunSuite
    with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var sliceDir: String = _
  private var sliceSchema: org.apache.spark.sql.types.StructType = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id", "event_id", "event_type", "value")
    sliceSchema = ev.schema
    val mm = ev.selectExpr("min(event_id)", "max(event_id)").head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    sliceDir = java.nio.file.Files
      .createTempDirectory("cep-shared-meas-gate").toString
    val width = (hi - lo) / 4 + 1
    for (s <- 0 until 4) {
      ev.filter(col("event_id")
        .between(lo + s * width, lo + (s + 1) * width - 1))
        .coalesce(1).write.mode("append").parquet(sliceDir)
    }
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def events = spark.read.parquet(s"$sfDir/events.parquet")
  private val spec = graft.Queries.eventSpec

  // four members on ONE scan, covering every measure tier: plain
  // positional+attribute atoms, FIRST/LAST offsets + SUBSET union,
  // measure expressions, and a ^-ANCHORED member (seed-once state +
  // the firstTake emit gate riding the SHARED codec; its presence also
  // turns the union prefilter off for the whole set — the other
  // members must be unaffected)
  private val members: Seq[(String, CepSql.CepSqlStatement)] = Seq(
    "funnel" -> graft.Queries.cepSqlMeasuresStatement,
    "offset" -> graft.Queries.cepSqlMeasuresOffsetStatement,
    "expr" -> graft.Queries.cepSqlMeasuresExprStatement,
    "anchored" -> graft.Queries.cepSqlAnchorFirstStatement,
    // the round-15 continuation surface: DISTINCT aggregates and
    // aggregate-ARGUMENT expressions fold per match at emission — the
    // shared gate pins them against batch runShared's column lowering
    "distinct" -> graft.Queries.cepSqlDistinctAggStatement,
    // round 16: CLASSIFIER() rides the shared shape's string map
    // (`smeasures`) — the alternation decides which branch names the
    // match's last row
    "outcome" -> CepSql.parseStatement(
      "PATTERN (s -> (c{2,2} | p)) MEASURES FIRST(s) AS s_id, " +
        "CLASSIFIER() AS oc " +
        "DEFINE s AS signup; c AS click; p AS purchase WITHIN 6",
      Vector(
        "signup" -> Vector("event_id", "value"),
        "click" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value"))))

  /** Canonical row repr `qname|key|a1=v1,a2=v2,…` (aliases sorted; NULL
    * prints as `a=∅`; values stringified — longs and strings compare
    * under one shape) for both sides of the gate.
    */
  private def reprOf(qname: String, key: Long,
      vals: Map[String, Option[String]]): String =
    s"$qname|$key|" + vals.toVector.sortBy(_._1)
      .map { case (a, v) => s"$a=${v.getOrElse("∅")}" }
      .mkString(",")

  private def batchReprs: Vector[String] =
    CepMeasures.runShared(events, members, spec).flatMap {
      case (name, df) =>
        val items = members.toMap.apply(name).measures
        df.collect().map { r =>
          val vals = items.map { it =>
            val i = r.fieldIndex(it.alias)
            it.alias -> (if (r.isNullAt(i)) None
              else Some(String.valueOf(r.get(i))))
          }.toMap
          reprOf(name, r.getLong(r.fieldIndex("user_id")), vals)
        }
    }.toVector.sorted

  test("stream shared measures == batch runShared, member for member " +
    "(cross-batch state, all measure tiers)") {
    val batch = batchReprs
    assert(batch.nonEmpty, "fixture produced no matches")
    val streamDf = spark.readStream.schema(sliceSchema)
      .option("maxFilesPerTrigger", "1").parquet(sliceDir)
    val out = StreamingCep.matchPatternsSharedMeasures(streamDf, members,
      spec)
    assert(out.columns.toVector ==
      Vector("qname", "user_id", "measures", "smeasures"))
    val sq = out.writeStream.format("memory").queryName("shared_meas")
      .outputMode("append").start()
    val streamed =
      try {
        sq.processAllAvailable()
        spark.sql("SELECT * FROM shared_meas").collect().map { r =>
          val m = r.getAs[Map[String, Any]]("measures") ++
            r.getAs[Map[String, Any]]("smeasures")
          reprOf(r.getString(r.fieldIndex("qname")),
            r.getLong(r.fieldIndex("user_id")),
            m.map { case (k, v) => k ->
              Option(v).map(String.valueOf) })
        }.toVector.sorted
      } finally sq.stop()
    assert(streamed == batch,
      s"shared measures stream diverged: ${streamed.length} rows vs " +
        s"batch ${batch.length}")
  }

  /** Out-of-order event-time fixture: ts = event_id seconds (event-time
    * order IS the batch order), four slices with a deterministic ~20%
    * displaced one slice later, flush sentinels driving the final
    * watermark past every real event — the `StreamingMultiSharedSpec`
    * construction. Returns (dir, schema, delaySec).
    */
  private def outOfOrderDir(tag: String)
      : (String, org.apache.spark.sql.types.StructType, Long) = {
    val s = spark
    import s.implicits._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), (col("event_id") + 1).cast("timestamp").as("ts"))
    val mm = ev.selectExpr("min(event_id)", "max(event_id)").head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = (hi - lo) / 4 + 1
    val delaySec = width + 10
    val dir = java.nio.file.Files
      .createTempDirectory(s"cep-meas-et-$tag").toString
    val sliced = ev.withColumn("slice",
      org.apache.spark.sql.functions.least(
        org.apache.spark.sql.functions.lit(3L),
        org.apache.spark.sql.functions.floor(
          (col("event_id") - lo) / width) +
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.pmod(
              org.apache.spark.sql.functions.xxhash64(col("event_id")),
              org.apache.spark.sql.functions.lit(5L)) === 0L, 1L)
            .otherwise(0L)))
    for (sl <- 0L until 4L) {
      sliced.filter(col("slice") === sl).drop("slice")
        .orderBy(org.apache.spark.sql.functions.xxhash64(col("event_id")))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    for (k <- 2L to 3L) {
      Seq((-1L, hi + k, "__flush", 9999.0, hi + k * delaySec))
        .toDF("user_id", "event_id", "event_type", "value", "tsec")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("tsec").cast("timestamp").as("ts"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    (dir, spark.read.parquet(dir).schema, delaySec)
  }

  test("event-time single-query measures == batch on out-of-order input " +
    "(expression, aggregate-argument and DISTINCT statements)") {
    for ((tag, st) <- Seq(
        ("expr", graft.Queries.cepSqlMeasuresExprStatement),
        ("aggarg", graft.Queries.cepSqlAggArgStatement),
        ("distinct", graft.Queries.cepSqlDistinctAggStatement))) {
      val batch = CepMeasures.run(events, st, spec).collect().map { r =>
        val vals = st.measures.map(_.alias).map(a => a ->
          (if (r.isNullAt(r.fieldIndex(a))) None
           else Some(String.valueOf(r.getLong(r.fieldIndex(a)))))).toMap
        reprOf("q", r.getLong(r.fieldIndex("user_id")), vals)
      }.toVector.sorted
      assert(batch.nonEmpty, tag)
      val (dir, schema, delaySec) = outOfOrderDir(s"single_$tag")
      val streamDf = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val out = StreamingCep.matchPatternMeasuresEventTime(streamDf, st,
        spec, tsCol = "ts", delay = s"$delaySec seconds")
      val sq = out.writeStream.format("memory")
        .queryName(s"meas_et_single_$tag")
        .outputMode("append").start()
      val streamed =
        try {
          sq.processAllAvailable()
          spark.sql(s"SELECT * FROM meas_et_single_$tag")
            .where(col("user_id") =!= -1L) // the flush sentinels' key
            .collect().map { r =>
              val vals = st.measures.map(_.alias).map(a => a ->
                (if (r.isNullAt(r.fieldIndex(a))) None
                 else Some(String.valueOf(r.getLong(r.fieldIndex(a)))))).toMap
              reprOf("q", r.getLong(r.fieldIndex("user_id")), vals)
            }.toVector.sorted
        } finally sq.stop()
      assert(streamed == batch,
        s"event-time measures diverged ($tag): ${streamed.length} vs " +
          s"${batch.length}")
    }
  }

  test("event-time CLASSIFIER() == batch on out-of-order input " +
    "(string-typed emission through the reorder buffer)") {
    val clSchema: Vector[(String, Vector[String])] = Vector(
      "signup" -> Vector("event_id", "value"),
      "click" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"))
    val st = CepSql.parseStatement(
      "PATTERN (s -> (c{2,2} | p)) MEASURES FIRST(s) AS s_id, " +
        "CLASSIFIER() AS outcome " +
        "DEFINE s AS signup; c AS click; p AS purchase WITHIN 6",
      clSchema)
    def shape(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getLong(r.fieldIndex("user_id")),
        r.getLong(r.fieldIndex("s_id")),
        r.getString(r.fieldIndex("outcome")))
    }.toVector.sorted
    val batch = shape(CepMeasures.run(events, st, spec).collect())
    assert(batch.nonEmpty, "fixture produced no matches")
    val (dir, schema, delaySec) = outOfOrderDir("classifier")
    val streamDf = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val out = StreamingCep.matchPatternMeasuresEventTime(streamDf, st,
      spec, tsCol = "ts", delay = s"$delaySec seconds")
    assert(out.schema("outcome").dataType ==
      org.apache.spark.sql.types.StringType)
    val sq = out.writeStream.format("memory").queryName("meas_et_cl")
      .outputMode("append").start()
    val streamed =
      try {
        sq.processAllAvailable()
        shape(spark.sql("SELECT * FROM meas_et_cl")
          .where(col("user_id") =!= -1L).collect())
      } finally sq.stop()
    assert(streamed == batch,
      s"event-time classifier diverged: ${streamed.length} vs " +
        s"${batch.length}")
  }

  test("event-time shared measures == batch runShared on out-of-order " +
    "input") {
    val batch = batchReprs
    val (dir, schema, delaySec) = outOfOrderDir("shared")
    val streamDf = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val out = StreamingCep.matchPatternsSharedMeasuresEventTime(streamDf,
      members, spec, tsCol = "ts", delay = s"$delaySec seconds")
    val sq = out.writeStream.format("memory").queryName("meas_et_shared")
      .outputMode("append").start()
    val streamed =
      try {
        sq.processAllAvailable()
        spark.sql("SELECT * FROM meas_et_shared")
          .where(col("user_id") =!= -1L)
          .collect().map { r =>
            val m = r.getAs[Map[String, Any]]("measures") ++
              r.getAs[Map[String, Any]]("smeasures")
            reprOf(r.getString(r.fieldIndex("qname")),
              r.getLong(r.fieldIndex("user_id")),
              m.map { case (k, v) => k ->
                Option(v).map(String.valueOf) })
          }.toVector.sorted
      } finally sq.stop()
    assert(streamed == batch,
      s"event-time shared measures diverged: ${streamed.length} vs " +
        s"${batch.length}")
  }

  test("a binding-shape checkpoint restores into the measures operator " +
    "mid-match (shared state compat)") {
    val s = spark
    import s.implicits._
    val schema = Vector("signup" -> Vector("event_id", "value"),
      "click" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"))
    val st = CepSql.parseStatement(
      "PATTERN (a -> c -> p) " +
        "MEASURES FIRST(a) AS a_id, SUM(c.value) + COUNT(c) AS c_code " +
        "DEFINE a AS signup; c AS click; p AS purchase WITHIN 8", schema)
    val stmts = Seq("m" -> st)
    val queries = stmts.map { case (n, x) => n -> x.query }

    val dir = java.nio.file.Files
      .createTempDirectory("shared-meas-compat").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/ckpt"
    def feed(rows: (Long, Long, String, Long)*): Unit =
      rows.toSeq.toDF("user_id", "event_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(inDir)

    val outDir = s"$dir/out"
    // batch 1 through the BINDING operator: signup + click held in state
    // (a file sink — the memory sink refuses checkpoint recovery)
    feed((7L, 1L, "signup", 0L), (7L, 2L, "click", 5L))
    val inSchema = spark.read.parquet(inDir).schema
    def streamIn = spark.readStream.schema(inSchema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q1 = StreamingCep.matchPatternsShared(streamIn, queries, spec)
      .writeStream.format("json").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()

    // restart the SAME checkpoint through the MEASURES operator; the
    // purchase completes the spanning run and emits folded measures
    feed((7L, 3L, "purchase", 9L))
    val q2 = StreamingCep.matchPatternsSharedMeasures(streamIn, stmts, spec)
      .writeStream.format("json").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("qname", StringType), StructField("user_id", LongType),
      StructField("measures", MapType(StringType, LongType))))
    val rows = spark.read.schema(outSchema).json(outDir)
      .where(col("qname").isNotNull).collect().toVector
    assert(rows.length == 1)
    val m = rows.head.getAs[Map[String, Any]]("measures")
    assert(rows.head.getString(rows.head.fieldIndex("qname")) == "m")
    assert(m("a_id") == 1L)
    assert(m("c_code") == 6L) // SUM(c.value)=5 + COUNT(c)=1
  }

  test("rejections: ALL ROWS member, empty MEASURES, nullary measure") {
    val schema = Vector("signup" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"))
    val df = spark.readStream.schema(sliceSchema)
      .option("maxFilesPerTrigger", "1").parquet(sliceDir)
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        StreamingCep.matchPatternsSharedMeasures(df,
          Seq("x" -> CepSql.parseStatement(sql, schema)), spec)
      }
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !~ '$frag'")
    }
    bad("PATTERN (a -> b) MEASURES COUNT(a) AS n ALL ROWS PER MATCH " +
      "DEFINE a AS signup; b AS purchase", "batch-only")
    bad("PATTERN (a -> b) DEFINE a AS signup; b AS purchase",
      "has no MEASURES")
    bad("PATTERN (a -> b) MEASURES MATCH_NUMBER() * 10 + COUNT(a) AS x " +
      "DEFINE a AS signup; b AS purchase", "MATCH_NUMBER() is batch-only")
  }
}
