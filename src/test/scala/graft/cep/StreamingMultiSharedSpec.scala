package graft.cep

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** batch == stream gate for the multi-query shared-scan CEP operator,
  * plus cross-batch state coverage: the sf0.001 events table replayed as
  * four ordered micro-batches (one file per trigger) through
  * `StreamingCep.matchPatternsShared` must reproduce the batch
  * `SparkCep.matchPatternsShared` output exactly — runs that span
  * micro-batch boundaries only survive if all k member states round-trip
  * through the SharedMultiState codec.
  *
  * Randomized differential on top: pseudo-random subsets of the registry
  * patterns (seeded — deterministic across runs) compare the BATCH shared
  * operator against per-query `matchPattern`, so the shared path is
  * exercised over mixed strict/relaxed/negated/windowed member sets, not
  * just the two hand-picked registry trios.
  */
class StreamingMultiSharedSpec extends AnyFunSuite with BeforeAndAfterAll {

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
      .createTempDirectory("cep-multi-stream-gate").toString
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

  private def batchShared(qs: Seq[(String, CepQuery)]): Vector[String] =
    SparkCep.matchPatternsShared(events, qs, spec).collect()
      .map(r => s"${r.getString(0)}|${r.getLong(1)}|${r.getString(2)}")
      .toVector.sorted

  private val registryTrios = Seq(
    "registry mixed (strict member, no pushdown)" -> Seq(
      "spat_purchase" -> graft.Queries.cepSpatPurchaseQuery,
      "next_signup_purchase" -> graft.Queries.cepNextSignupPurchaseQuery,
      "not_followed_by_purchase" ->
        graft.Queries.cepNotFollowedByPurchaseQuery),
    "registry pushdown (all-prefilter)" -> Seq(
      "spat_purchase" -> graft.Queries.cepSpatPurchaseQuery,
      "lpat_relaxed_purchase_pairs" ->
        graft.Queries.cepLpatRelaxedPurchasePairsQuery,
      "not_followed_by_purchase" ->
        graft.Queries.cepNotFollowedByPurchaseQuery))

  for ((label, qs) <- registryTrios)
    test(s"stream shared == batch shared: $label") {
      val batch = batchShared(qs)
      assert(batch.nonEmpty)
      val streamDf = spark.readStream.schema(sliceSchema)
        .option("maxFilesPerTrigger", "1").parquet(sliceDir)
      val out = StreamingCep.matchPatternsShared(streamDf, qs, spec)
      val qn = "multigate_" + label.replaceAll("[^A-Za-z0-9]", "_")
      val sq = out.writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      val streamed =
        try {
          sq.processAllAvailable()
          spark.sql(s"SELECT * FROM $qn").collect()
            .map(r => s"${r.getString(0)}|${r.getLong(1)}|${r.getString(2)}")
            .toVector.sorted
        } finally sq.stop()
      assert(streamed == batch,
        s"shared stream diverged: ${streamed.length} vs ${batch.length}")
    }

  /** Event-time shared operator on OUT-OF-ORDER input: ts = event_id
    * seconds (event-time order IS the batch order), four slices with a
    * deterministic ~20% displaced one slice later, watermark delay
    * exceeding the displacement, flush sentinels driving the final
    * watermark past every real event — the `EventTimeRegistryGateSpec`
    * construction, applied to the SHARED operator: one reorder buffer
    * must feed every member identically.
    */
  test("event-time stream shared == batch shared on out-of-order input") {
    val qs = registryTrios.last._2 // all-prefilter set: union filter on
    val batch = batchShared(qs)
    assert(batch.nonEmpty)

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("event_id").cast("timestamp").as("ts"))
    val mm = ev.selectExpr("min(event_id)", "max(event_id)").head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = (hi - lo) / 4 + 1
    val delaySec = width + 10
    val dir = java.nio.file.Files
      .createTempDirectory("cep-multi-et-gate").toString
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
    for (s <- 0L until 4L) {
      sliced.filter(col("slice") === s).drop("slice")
        .orderBy(org.apache.spark.sql.functions.xxhash64(col("event_id")))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val sess = spark
    import sess.implicits._
    // flush sentinels must carry a type INSIDE the union-filter alphabet:
    // Catalyst pushes the shared operator's union prefilter below the
    // watermark node, so a "__flush"-typed sentinel would be dropped
    // before watermark stats and the buffered tail would never drain
    // (found the hard way — the operator documents this contract).
    // Sentinel safety rests on TWO exact properties, not on its value
    // (a purchase satisfies not_followed_by's "True"-condition b-spat):
    // the first sentinel's ts EQUALS the final watermark (hi+2·delay =
    // (hi+3·delay)−delay) and the strict `ts < wm` release check never
    // frees it, and key −1 holds no signup so even a release could not
    // complete a pair. Adding a k=4 sentinel would break the first
    // property for k=2 — don't.
    for (k <- 2L to 3L) {
      Seq((-1L, hi + k, "purchase", 9999.0, hi + k * delaySec))
        .toDF("user_id", "event_id", "event_type", "value", "tsec")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("tsec").cast("timestamp").as("ts"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val schema = spark.read.parquet(dir).schema
    val streamDf = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val out = StreamingCep.matchPatternsSharedEventTime(streamDf, qs, spec,
      tsCol = "ts", delay = s"$delaySec seconds")
    val sq = out.writeStream.format("memory").queryName("multigate_et")
      .outputMode("append").start()
    val streamed =
      try {
        sq.processAllAvailable()
        spark.sql("SELECT * FROM multigate_et").collect()
          .map(r => s"${r.getString(0)}|${r.getLong(1)}|${r.getString(2)}")
          .toVector.sorted
      } finally sq.stop()
    assert(streamed == batch,
      s"event-time shared diverged: ${streamed.length} vs ${batch.length}")
  }

  test("randomized member sets: batch shared == union of per-query runs") {
    // deterministic seed — failures reproduce; draw from the full
    // registry pattern pool (strict, relaxed, nd-relaxed, negated,
    // windowed, group loops, until, iterative)
    val pool = graft.Queries.cepRegistryQueries.toSeq.sortBy(_._1).toVector
    val rnd = new scala.util.Random(20260813L)
    for (round <- 0 until 6) {
      val k = 2 + rnd.nextInt(3) // 2-4 members
      val qs = rnd.shuffle(pool).take(k)
      val exp = qs.flatMap { case (name, q) =>
        val piNames = SparkCep.patternNames(q.patseq)
        SparkCep.matchPattern(events, q, spec).collect().map { row =>
          val binding = piNames.map(n =>
            row.getAs[scala.collection.Seq[Long]](n).mkString(","))
            .mkString(";")
          s"$name|${row.getLong(0)}|$binding"
        }
      }.toVector.sorted
      val got = batchShared(qs)
      assert(got == exp,
        s"round $round diverged on members ${qs.map(_._1)}: " +
          s"${got.length} vs ${exp.length}")
    }
  }

  test("randomized member sets through the STREAMING shared operator") {
    // two seeded random draws through the arrival-order streaming path
    // (micro-batched, cross-batch state) — the batch-vs-stream gate over
    // member sets the registry trios don't cover
    val pool = graft.Queries.cepRegistryQueries.toSeq.sortBy(_._1).toVector
    val rnd = new scala.util.Random(8132026L)
    for (round <- 0 until 2) {
      val k = 2 + rnd.nextInt(2) // 2-3 members
      val qs = rnd.shuffle(pool).take(k)
      val batch = batchShared(qs)
      val streamDf = spark.readStream.schema(sliceSchema)
        .option("maxFilesPerTrigger", "1").parquet(sliceDir)
      val out = StreamingCep.matchPatternsShared(streamDf, qs, spec)
      val qn = s"multigate_rnd$round"
      val sq = out.writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      val streamed =
        try {
          sq.processAllAvailable()
          spark.sql(s"SELECT * FROM $qn").collect()
            .map(r => s"${r.getString(0)}|${r.getLong(1)}|${r.getString(2)}")
            .toVector.sorted
        } finally sq.stop()
      assert(streamed == batch,
        s"round $round diverged on members ${qs.map(_._1)}: " +
          s"stream ${streamed.length} vs batch ${batch.length}")
    }
  }
}
