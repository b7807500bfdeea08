package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.cep._

/** Drive the streaming multi-query shared-scan CEP operator end-to-end:
  * sf0.001 events re-played as four ordered micro-batches, three registry
  * patterns in ONE streaming query/state store; prints the per-pattern
  * match counts and the batch-operator counts for eyeball comparison.
  */
object DriveMultiStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id", "event_id", "event_type", "value")
    val mm = ev.selectExpr("min(event_id)", "max(event_id)").head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val dir = java.nio.file.Files
      .createTempDirectory("drive-multi-stream").toString
    val width = (hi - lo) / 4 + 1
    for (s <- 0 until 4)
      ev.filter(col("event_id")
        .between(lo + s * width, lo + (s + 1) * width - 1))
        .coalesce(1).write.mode("append").parquet(dir)
    val qs = Seq(
      "spat_purchase" -> graft.Queries.cepSpatPurchaseQuery,
      "lpat_relaxed_purchase_pairs" ->
        graft.Queries.cepLpatRelaxedPurchasePairsQuery,
      "not_followed_by_purchase" ->
        graft.Queries.cepNotFollowedByPurchaseQuery)
    val spec = graft.Queries.eventSpec
    val streamDf = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val out = StreamingCep.matchPatternsShared(streamDf, qs, spec)
    val sq = out.writeStream.format("memory").queryName("dms")
      .outputMode("append").start()
    sq.processAllAvailable()
    spark.sql("SELECT qname, count(*) n FROM dms GROUP BY qname ORDER BY qname")
      .collect().foreach(r => println(s"STREAM ${r.getString(0)}=${r.getLong(1)}"))
    sq.stop()
    SparkCep.matchPatternsShared(
      spark.read.parquet(s"$sfDir/events.parquet"), qs, spec)
      .groupBy("qname").count().orderBy("qname")
      .collect().foreach(r => println(s"BATCH  ${r.getString(0)}=${r.getLong(1)}"))

    // event-time variant: ts = event_id seconds, same slices plus two
    // alphabet-typed flush sentinels driving the watermark past every
    // real event (never released: first sentinel ts == final watermark,
    // and key -1 holds no signup)
    val mm2 = hi
    val delaySec = width + 10
    val etDir = java.nio.file.Files
      .createTempDirectory("drive-multi-et").toString
    for (s <- 0 until 4)
      ev.withColumn("ts", (col("event_id") + 1).cast("timestamp"))
        .filter(col("event_id")
          .between(lo + s * width, lo + (s + 1) * width - 1))
        .coalesce(1).write.mode("append").parquet(etDir)
    val s2 = spark
    import s2.implicits._
    for (k <- 2L to 3L)
      Seq((-1L, mm2 + k, "purchase", 9999.0, mm2 + k * delaySec))
        .toDF("user_id", "event_id", "event_type", "value", "tsec")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("tsec").cast("timestamp").as("ts"))
        .coalesce(1).write.mode("append").parquet(etDir)
    val etSchema = spark.read.parquet(etDir).schema
    val etStream = spark.readStream.schema(etSchema)
      .option("maxFilesPerTrigger", "1").parquet(etDir)
    val etOut = StreamingCep.matchPatternsSharedEventTime(etStream, qs,
      spec, tsCol = "ts", delay = s"$delaySec seconds")
    val sq2 = etOut.writeStream.format("memory").queryName("dms_et")
      .outputMode("append").start()
    sq2.processAllAvailable()
    spark.sql("SELECT qname, count(*) n FROM dms_et GROUP BY qname ORDER BY qname")
      .collect().foreach(r => println(s"ETIME  ${r.getString(0)}=${r.getLong(1)}"))
    sq2.stop()
    spark.stop()
  }
}
