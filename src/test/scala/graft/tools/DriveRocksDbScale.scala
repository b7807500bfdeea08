package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cep._

/** State-store scale probe for streaming shared-scan CEP: N events over
  * K keys (default 2M over 200k — enough keys that every key's k=3
  * member run-sets are live state), run once under the default
  * HDFS-backed in-memory provider and once under RocksDB
  * (`StreamingCep.useRocksDbStateStore`), reporting wall time, match
  * counts (must be identical — the provider must not change semantics),
  * and the state operator's memory metrics from the final progress:
  * the in-memory provider's `stateOnCurrentVersionSizeBytes` grows with
  * key count and lives ON HEAP, RocksDB's `rocksdbTotalMemoryUsage` is
  * the bounded block-cache/memtable budget off heap.
  *
  * Usage: DriveRocksDbScale [threads] [nEvents] [nKeys]
  */
object DriveRocksDbScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("8")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val keys = args.drop(2).headOption.map(_.toLong).getOrElse(200000L)
    val dir = java.nio.file.Files
      .createTempDirectory("rocks-scale").toString
    val per = n / 8
    for (f <- 0L until 8L)
      spark.range(f * per, (f + 1) * per).select(
        (col("id") % keys).as("user_id"),
        col("id").as("event_id"),
        element_at(
          array(lit("click"), lit("view"), lit("purchase"), lit("signup"),
            lit("error")),
          (pmod(hash(col("id")), lit(5)) + 1).cast("int"))
          .as("event_type"),
        pmod(col("id") * 40503, lit(500)).as("value"))
        .coalesce(1).write.mode("append").parquet(dir)
    val schema = Vector("click" -> Vector("event_id", "value"),
      "view" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"),
      "signup" -> Vector("event_id", "value"),
      "error" -> Vector("event_id", "value"))
    val queries = Seq(
      "spat_cheap" -> CepQuery(
        Pattern.spat("a", "purchase", "value < 100"), schema),
      "pairs" -> CepQuery(
        Pattern.lpat("a", "purchase", "value < 250", Contiguity.Relaxed,
          2, 2), schema),
      "signup_then_purchase" -> CepQuery(
        Pattern.Combine(Contiguity.Relaxed,
          Pattern.spat("a", "signup", "True"),
          Pattern.spat("b", "purchase", "value < 250")), schema))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    val fileSchema = spark.read.parquet(dir).schema
    def src = spark.readStream.schema(fileSchema)
      .option("maxFilesPerTrigger", "2").parquet(dir)

    def runOne(label: String): Long = {
      val sq = StreamingCep.matchPatternsShared(src, queries, spec)
        .writeStream.format("memory").queryName(label)
        .outputMode("append").start()
      val t0 = System.nanoTime()
      try {
        sq.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val matches = spark.sql(s"SELECT count(*) FROM $label")
          .head().getLong(0)
        val op = sq.lastProgress.stateOperators.head
        val cm = op.customMetrics
        // provider-specific size/memory metrics, whatever this provider
        // exposes (HDFS: loadedMapCacheHit/Miss + memoryUsedBytes on
        // heap; RocksDB: rocksdbTotalMemoryUsage etc. off heap)
        val sizes = cm.keySet().toArray(Array.empty[String]).sorted
          .filter(k => k.toLowerCase.contains("memory") ||
            k.toLowerCase.contains("size"))
          .map(k => s"$k=${cm.get(k)}").mkString(" ")
        println(f"$label%-8s MATCHES=$matches KEYS=${op.numRowsTotal} " +
          f"SECONDS=$sec%.1f EVENTS_PER_SEC=${(n / sec).toLong} " +
          s"memUsedBytes=${op.memoryUsedBytes} $sizes")
        matches
      } finally sq.stop()
    }

    // default in-memory provider
    val mDefault = runOne("default_hdfs")
    // rocksdb
    StreamingCep.useRocksDbStateStore(spark)
    val mRocks = runOne("rocksdb")
    require(mDefault == mRocks,
      s"provider changed semantics: $mDefault vs $mRocks")
    println(s"PROVIDERS AGREE: $mRocks matches")
    spark.stop()
  }
}
