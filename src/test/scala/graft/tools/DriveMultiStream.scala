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
    spark.stop()
  }
}
