package graft.cep

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming CEP under the RocksDB state store provider — the
  * corpus-scale configuration (`StreamingCep.useRocksDbStateStore`):
  * the default in-memory provider holds every key's run-sets on the
  * executor heap, which is the first OOM at real key cardinality.
  * These tests prove the `CepStateCodec` v3 payloads and the shared
  * operators' multi-member state round-trip a REAL RocksDB store
  * across a stop/restart (not just that the conf is accepted), and
  * that RocksDB actually engaged (provider-specific metrics in the
  * query progress).
  */
class RocksDbCepStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StreamingCep.useRocksDbStateStore(spark)
  }

  override def afterAll(): Unit = if (spark != null) {
    // restore the session default for suites sharing this JVM session
    StreamingCep.rocksDbStateStoreConfs.keys
      .foreach(spark.conf.unset)
    spark.stop()
  }

  private def assertRocksDbEngaged(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
    assert(ops.nonEmpty, "no state operator in progress")
    val metrics = ops.flatMap(_.customMetrics.keySet()
      .toArray(Array.empty[String]))
    assert(metrics.exists(_.startsWith("rocksdb")),
      s"RocksDB provider not engaged; metrics = ${metrics.mkString(",")}")
  }

  test("conf helper sets the RocksDB provider for subsequent queries") {
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .endsWith("RocksDBStateStoreProvider"))
  }

  /** Arrival-order operator: a partial run written to RocksDB in run 1
    * completes after a cold restart in run 2 — the codec payload
    * survives the provider's serialize/dedeserialize + changelog
    * checkpoint path, and the rocksdb custom metrics prove the
    * provider actually served the state.
    */
  test("partial match completes across a RocksDB-checkpointed restart") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("rocks-ckpt").toString
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

    Seq((1L, 1L, "signup", 0L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q1 = startQuery()
    try { q1.processAllAvailable(); assertRocksDbEngaged(q1) }
    finally q1.stop()

    Seq((1L, 2L, "purchase", 10L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q2 = startQuery()
    try { q2.processAllAvailable(); assertRocksDbEngaged(q2) }
    finally q2.stop()

    val out = spark.read.schema(StructType(Seq(
      StructField("user_id", LongType), StructField("a_id", LongType),
      StructField("b_id", LongType)))).json(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 2L)))
  }

  /** Event-time SHARED operator: member run-sets AND the shared reorder
    * buffer (all codec-versioned binary payloads inside the
    * `SharedMultiStateEt` row) must survive a RocksDB restart — the
    * compressed shape of `CheckpointRestartSpec`'s event-time test:
    * run 1 leaves a live sp-partial and buffered out-of-order clicks;
    * run 2 restarts from the RocksDB checkpoint and completes both
    * members.
    */
  test("event-time shared operator: partials + buffer survive a RocksDB " +
    "restart") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("rocks-ckpt-et").toString
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

    def startQuery() = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      StreamingCep.matchPatternsSharedEventTime(in, qs, spec,
        tsCol = "ts", delay = "100 seconds")
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    def file(rows: (Long, Long, String, Long, java.sql.Timestamp)*): Unit =
      rows.toSeq.toDF("user_id", "event_id", "event_type", "value", "ts")
        .coalesce(1).write.mode("append").parquet(inDir)

    // run 1 (same release plan as CheckpointRestartSpec's event-time
    // test): k1's signup+click released into the members, k9's clicks
    // [190, 250, 260] left in the shared reorder buffer
    file((1L, 1L, "signup", 0L, ts(10)), (1L, 2L, "click", 0L, ts(20)))
    file((9L, 3L, "click", 0L, ts(250)), (9L, 4L, "click", 0L, ts(260)))
    file((9L, 6L, "click", 0L, ts(190)))
    val q1 = startQuery()
    try { q1.processAllAvailable(); assertRocksDbEngaged(q1) }
    finally q1.stop()

    // run 2 from the RocksDB checkpoint: release k1's purchase (sp
    // partial crossed the restart) and k9's buffered clicks (buffer
    // payload crossed the restart)
    file((1L, 5L, "purchase", 10L, ts(180)), (9L, 7L, "click", 0L, ts(900)))
    file((9L, 8L, "click", 0L, ts(5000)))
    val q2 = startQuery()
    try { q2.processAllAvailable(); assertRocksDbEngaged(q2) }
    finally q2.stop()

    val out = spark.read.schema(StructType(Seq(
      StructField("qname", StringType), StructField("user_id", LongType),
      StructField("binding", StringType)))).json(outDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(out.contains(("sp", 1L, "1;5")),
      s"sp member partial lost across RocksDB restart: $out")
    assert(out.contains(("cc", 9L, "6,3")) && out.contains(("cc", 9L, "3,4")),
      s"buffered events lost across RocksDB restart: $out")
  }
}
