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
}
