package graft.cep

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming CEP state must survive a real stop/restart through the
  * checkpointed state store: a partial match started before the restart
  * completes after it, proving the SerRun snapshot/restore round-trip
  * against an on-disk state store (not just cross-batch in-memory state).
  */
class CheckpointRestartSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("partial match completes across a checkpointed restart") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ckpt").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/checkpoint"
    val outDir = s"$dir/out"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", LongType)))

    val q = CepQuery(
      Pattern.Combine(Contiguity.Strict, Pattern.spat("a", "signup", "True"),
        Pattern.spat("b", "purchase", "True")),
      Vector("signup" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value")))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))

    def startQuery() = {
      val in = graft.sources.EventSource.jsonStream(spark, inDir, schema)
      StreamingCep.matchPattern(in, q, spec)
        .selectExpr("user_id", "a[0] as a_id", "b[0] as b_id")
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // batch 1: signup only — leaves a live partial run in the state store
    Seq((1L, 1L, "signup", 0L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // restart from the checkpoint; batch 2 completes the pair
    Seq((1L, 2L, "purchase", 10L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.schema(StructType(Seq(
      StructField("user_id", LongType), StructField("a_id", LongType),
      StructField("b_id", LongType)))).json(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 2L)))
  }

  test("^ anchor across a checkpointed restart: a drained key's step " +
    "counter survives (no re-seed), a fresh key still seeds") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ckpt-anchor").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/checkpoint"
    val outDir = s"$dir/out"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", LongType)))
    val q = CepQuery(
      Pattern.Combine(Contiguity.Strict, Pattern.spat("a", "signup", "True"),
        Pattern.spat("b", "purchase", "True")),
      Vector("signup" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value"),
        "click" -> Vector("event_id", "value")),
      anchorStart = true)
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    def startQuery() = {
      val in = graft.sources.EventSource.jsonStream(spark, inDir, schema)
      StreamingCep.matchPattern(in, q, spec)
        .selectExpr("user_id", "a[0] as a_id", "b[0] as b_id")
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    // batch 1: user 1's FIRST event is a click — the ^-run dies and the
    // run set drains to zero. The GC guard must still keep the key's
    // step counter (state with step>0 is semantics under ^).
    Seq((1L, 1L, "click", 0L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // restart: user 1 now sends signup+purchase — a LOST step counter
    // would re-seed at the signup and emit a bogus match; user 2 is
    // genuinely fresh and must match.
    Seq((1L, 2L, "signup", 0L), (1L, 3L, "purchase", 1L),
      (2L, 10L, "signup", 0L), (2L, 11L, "purchase", 1L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.schema(StructType(Seq(
      StructField("user_id", LongType), StructField("a_id", LongType),
      StructField("b_id", LongType)))).json(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((2L, 10L, 11L)))
  }

  /** Review fix e2e: a checkpoint written by the EVENT-TIME operator
    * while events sit in its reorder buffer must be REFUSED by the
    * arrival-order operator — restoring it would silently drop the
    * buffered events. Measured behavior: Spark's state-store schema
    * check fires FIRST (EventTimeTimeout adds a timeout-timestamp field
    * to the state value schema that NoTimeout lacks), so the restore is
    * already blocked at the store level; the operator's own
    * reorder-buffer guard remains as defense-in-depth should the two
    * variants ever share a timeout mode. This test pins that the
    * cross-variant resume FAILS (either message) rather than silently
    * dropping events.
    */
  test("arrival-order operator refuses an event-time checkpoint with a " +
    "non-empty reorder buffer") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ckpt-cross").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/checkpoint"
    val outDir = s"$dir/out"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", LongType),
      StructField("ts", TimestampType)))

    val q = CepQuery(
      Pattern.Combine(Contiguity.Strict, Pattern.spat("a", "signup", "True"),
        Pattern.spat("b", "purchase", "True")),
      Vector("signup" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value")))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))

    // event-time run: every event stays behind the 1000s watermark delay
    // at stop time, so the state carries a non-empty reorder buffer
    Seq((1L, 1L, "signup", 0L, new java.sql.Timestamp(5000L)))
      .toDF("user_id", "event_id", "event_type", "value", "ts")
      .write.mode("append").parquet(inDir)
    val inEt = spark.readStream.schema(schema).parquet(inDir)
    val q1 = StreamingCep.matchPatternEventTime(inEt, q, spec,
      tsCol = "ts", delay = "1000 seconds")
      .selectExpr("user_id", "a[0] as a_id")
      .writeStream.format("json")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()

    // resume the SAME checkpoint with the arrival-order operator: the
    // guard must fail the batch with the actionable message
    Seq((1L, 2L, "purchase", 10L, new java.sql.Timestamp(6000L)))
      .toDF("user_id", "event_id", "event_type", "value", "ts")
      .write.mode("append").parquet(inDir)
    val inPo = spark.readStream.schema(schema).parquet(inDir)
    val q2 = StreamingCep.matchPattern(inPo, q, spec)
      .selectExpr("user_id", "a[0] as a_id")
      .writeStream.format("json")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("matchPatternEventTime") ||
        m.contains("STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE")),
      s"wrong failure: ${messages(e).mkString(" | ")}")
  }

  private def messagesOf(t: Throwable): Seq[String] =
    if (t == null) Nil
    else Option(t.getMessage).toSeq ++ messagesOf(t.getCause)

  /** withinTime across a checkpointed restart: the in-window pair (50 →
    * 80, span 100) matches after the restart while the out-of-window pair
    * (50 → 200 via user 2) does not — the run's firstTakeTs stamp and the
    * executor clock both survived the state store round trip.
    */
  test("withinTime partial match completes across a checkpointed restart " +
    "and the window still gates") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ckpt-wt").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/checkpoint"
    val outDir = s"$dir/out"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", LongType)))

    val q = CepQuery(
      Pattern.Combine(Contiguity.Relaxed, Pattern.spat("a", "signup", "True"),
        Pattern.spat("b", "purchase", "True")),
      Vector("signup" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value")),
      withinTime = Some(WithinTime("value", 100L)))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))

    def startQuery() = {
      val in = graft.sources.EventSource.jsonStream(spark, inDir, schema)
      StreamingCep.matchPattern(in, q, spec)
        .selectExpr("user_id", "a[0] as a_id", "b[0] as b_id")
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // batch 1: signups only ("value" is the event-time attr): both users
    // leave a TAKEN partial run with firstTakeTs = 50
    Seq((1L, 1L, "signup", 50L), (2L, 1L, "signup", 50L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // restart: user 1 purchases in-window (80 - 50 < 100), user 2 out of
    // window (200 - 50 >= 100)
    Seq((1L, 2L, "purchase", 80L), (2L, 2L, "purchase", 200L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.schema(StructType(Seq(
      StructField("user_id", LongType), StructField("a_id", LongType),
      StructField("b_id", LongType)))).json(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 2L)))
  }

  /** The zero-taken-runs floor gap (round-6 verdict #7 / advice item): a
    * checkpoint written when NO live run has taken used to derive the
    * monotone-clock floor as Long.MinValue on restore, silently
    * re-admitting a rewound clock at exactly a batch boundary. The v3
    * codec persists the floor, so the rewind now fails loudly across the
    * restart — same behavior as within one run of the executor.
    */
  test("rewound clock after a zero-taken-runs checkpoint fails loudly") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ckpt-rewind").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/checkpoint"
    val outDir = s"$dir/out"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", LongType)))

    val q = CepQuery(
      Pattern.Combine(Contiguity.Relaxed, Pattern.spat("a", "signup", "True"),
        Pattern.spat("b", "purchase", "True")),
      Vector("signup" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value")),
      withinTime = Some(WithinTime("value", 100L)))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))

    def startQuery() = {
      val in = graft.sources.EventSource.jsonStream(spark, inDir, schema)
      StreamingCep.matchPattern(in, q, spec)
        .selectExpr("user_id", "a[0] as a_id", "b[0] as b_id")
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // batch 1: a purchase with no preceding signup is IN the pattern
    // alphabet (so it passes the pre-NFA prefilter and advances the
    // executor clock to 500) but starts no run — ZERO taken runs in the
    // state, nothing for the legacy derived floor to reconstruct from
    Seq((1L, 1L, "purchase", 500L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // restart; batch 2 rewinds the clock to 50 — must fail loudly, not
    // silently re-admit the rewound event
    Seq((1L, 2L, "signup", 50L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q2 = startQuery()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(messagesOf(e).exists(_.contains("non-decreasing")),
      s"wrong failure: ${messagesOf(e).mkString(" | ")}")
  }

  /** Shared multi-query operator: EVERY member's partial runs must
    * survive a checkpointed restart — two members each holding a live
    * partial before the stop, both completing after it. Proves the
    * `SharedMultiState` member-sequence round-trip against the on-disk
    * state store.
    */
  test("shared operator: all member partials complete across a restart") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ckpt-multi").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/checkpoint"
    val outDir = s"$dir/out"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", LongType)))
    val evSchema = Vector("signup" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"),
      "click" -> Vector("event_id", "value"))
    // BOTH members relaxed so both hold a live partial at the stop (a
    // strict pair here would be killed by the other member's event in
    // batch 1 and the test would only ever exercise one stored run-set)
    val qs = Seq(
      "sp" -> CepQuery(
        Pattern.Combine(Contiguity.Relaxed,
          Pattern.spat("a", "signup", "True"),
          Pattern.spat("b", "purchase", "True")), evSchema),
      "cc" -> CepQuery(
        Pattern.lpat("a", "click", "True", Contiguity.Relaxed, 2, 2),
        evSchema))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))

    def startQuery(queries: Seq[(String, CepQuery)]) = {
      val in = graft.sources.EventSource.jsonStream(spark, inDir, schema)
      StreamingCep.matchPatternsShared(in, queries, spec)
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // batch 1: one signup (partial for "sp") and one click (partial for
    // "cc") — both members leave live runs in the store
    Seq((1L, 1L, "signup", 0L), (1L, 2L, "click", 0L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q1 = startQuery(qs)
    try q1.processAllAvailable() finally q1.stop()

    // restart; batch 2 completes BOTH partials
    Seq((1L, 3L, "purchase", 10L), (1L, 4L, "click", 0L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q2 = startQuery(qs)
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.schema(StructType(Seq(
      StructField("qname", StringType), StructField("user_id", LongType),
      StructField("binding", StringType)))).json(outDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    // both partials complete after the restart: the relaxed signup→
    // purchase pair (1;3, ignoring the click) and the relaxed click
    // pair (2,4) — a codec bug dropping any member's stored runs loses
    // one of these rows
    assert(out == Set(("sp", 1L, "1;3"), ("cc", 1L, "2,4")),
      s"unexpected completions: $out")
  }

  /** Restarting the shared operator with a DIFFERENT member set must
    * fail with the actionable query-set message, never silently
    * misassign stored member states. REORDERING with the same count is
    * the dangerous case — a count-only check would pass it and decode
    * each pattern's runs into the other executor — so that is what this
    * test restarts with (the dropped-member case fails on the same
    * names check a fortiori).
    */
  test("shared operator refuses a restart with a reordered member set") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ckpt-multi-chg").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/checkpoint"
    val outDir = s"$dir/out"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", LongType)))
    val evSchema = Vector("signup" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"))
    val q1def = "sp" -> CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("a", "signup", "True"),
        Pattern.spat("b", "purchase", "True")), evSchema)
    val q2def = "p" -> CepQuery(
      Pattern.spat("a", "purchase", "True"), evSchema)
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))

    def startQuery(queries: Seq[(String, CepQuery)]) = {
      val in = graft.sources.EventSource.jsonStream(spark, inDir, schema)
      StreamingCep.matchPatternsShared(in, queries, spec)
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    Seq((1L, 1L, "signup", 0L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val run1 = startQuery(Seq(q1def, q2def))
    try run1.processAllAvailable() finally run1.stop()

    Seq((1L, 2L, "purchase", 10L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val run2 = startQuery(Seq(q2def, q1def)) // same members, reordered
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try run2.processAllAvailable() finally run2.stop()
    }
    assert(messagesOf(e).exists(_.contains("query set changed")),
      s"wrong failure: ${messagesOf(e).mkString(" | ")}")
  }

  /** EVENT-TIME shared operator restart: member partials AND the shared
    * reorder buffer (stored as a codec payload) must round-trip the
    * on-disk store. Batch 1 releases a signup into the sp-member's NFA
    * (live partial) and leaves one event buffered behind the watermark;
    * after the restart, later events release the buffered one and
    * complete the pair — wrong buffer decode or a lost member run-set
    * each lose the final match. A reordered member set on the SAME
    * checkpoint must fail with the query-set message (count-equal, so
    * only the names check catches it).
    */
  test("event-time shared operator: partials + buffer survive restart; " +
    "reordered member set refused") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ckpt-multi-et").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/checkpoint"
    val outDir = s"$dir/out"
    val evSchema = Vector("signup" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"),
      "click" -> Vector("event_id", "value"))
    val qs = Seq(
      "sp" -> CepQuery(
        Pattern.Combine(Contiguity.Relaxed,
          Pattern.spat("a", "signup", "True"),
          Pattern.spat("b", "purchase", "True")), evSchema),
      "cc" -> CepQuery(
        Pattern.lpat("a", "click", "True", Contiguity.Relaxed, 2, 2),
        evSchema))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", LongType),
      StructField("ts", TimestampType)))

    def startQuery(queries: Seq[(String, CepQuery)]) = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      StreamingCep.matchPatternsSharedEventTime(in, queries, spec,
        tsCol = "ts", delay = "100 seconds")
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    def file(rows: (Long, Long, String, Long, java.sql.Timestamp)*): Unit =
      rows.toSeq.toDF("user_id", "event_id", "event_type", "value", "ts")
        .coalesce(1).write.mode("append").parquet(inDir)

    // Watermark advancement is driven by DATA batches only (one file per
    // trigger) — the test must not depend on no-data micro-batches racing
    // processAllAvailable. Run 1, three files/batches:
    //   f1: signup@10(k1,#1), click@20(k1,#2)          wm 0 → nothing out
    //   f2: click@250(k9,#3), click@260(k9,#4)         wm 0 (from f1 max
    //       20s − 100s) → k9 events buffered
    //   f3: click@190(k9,#6 — arrives out of order)    wm now 160 (260−100)
    //       → k1's event-time timeout (10s+1ms) fires: s@10, c@20 released
    //       → sp and cc each hold a LIVE PARTIAL; k9 buffers [190, 250,
    //       260] (all ≥ wm 160, so all stay buffered)
    file((1L, 1L, "signup", 0L, ts(10)), (1L, 2L, "click", 0L, ts(20)))
    file((9L, 3L, "click", 0L, ts(250)), (9L, 4L, "click", 0L, ts(260)))
    file((9L, 6L, "click", 0L, ts(190)))
    val q1 = startQuery(qs)
    try q1.processAllAvailable() finally q1.stop()

    // Run 2 from the checkpoint, two files:
    //   fA: purchase@180(k1,#5), click@900(k9,#7)      wm 160 → k1 buffers
    //       the purchase; k9 buffers 900
    //   fB: click@5000(k9,#8)                          wm 800 (900−100) →
    //       k1 timeout releases p@180 → sp completes "1;5" (the partial
    //       crossed the restart in the member run-set); k9 releases
    //       190(#6), 250(#3), 260(#4) in ts order → cc pairs "6,3","3,4"
    //       (#3/#4 crossed the restart in the SHARED BUFFER payload)
    file((1L, 5L, "purchase", 10L, ts(180)), (9L, 7L, "click", 0L, ts(900)))
    file((9L, 8L, "click", 0L, ts(5000)))
    val q2 = startQuery(qs)
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.schema(StructType(Seq(
      StructField("qname", StringType), StructField("user_id", LongType),
      StructField("binding", StringType)))).json(outDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(out.contains(("sp", 1L, "1;5")),
      s"sp member partial lost across restart: $out")
    assert(out.contains(("cc", 9L, "6,3")) && out.contains(("cc", 9L, "3,4")),
      s"buffered events lost across restart or released out of order: $out")

    // same checkpoint, reordered member set: names check must fire
    file((9L, 9L, "click", 0L, ts(10000)))
    val q3 = startQuery(qs.reverse)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q3.processAllAvailable() finally q3.stop()
    }
    assert(messagesOf(e).exists(_.contains("query set changed")),
      s"wrong failure: ${messagesOf(e).mkString(" | ")}")
  }
}
