package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Chunking + chunk-pack throughput probe: the doc→chunk explode is a
  * pure narrow transformation (must run at scan speed, zero exchange);
  * the chunk→shard global pack adds the 2-pass prefix-sum. Records
  * docs/s and chunks/s for SCALE.md at synthetic-corpus scale.
  *
  * Usage: DriveChunkScale [threads] [nDocs]
  */
object DriveChunkScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"CHUNK_SCALE n=$n threads=$threads " +
      s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")

    // 60-259-token docs, same generator family as DriveIncrementalDedup
    val docs = spark.range(n).toDF("doc_id")
      .withColumn("len",
        (pmod(hash(col("doc_id") * 17 + 7), lit(200)) + 60).cast("int"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), col("len")), t =>
          concat(lit("w"), pmod(
            hash(col("doc_id") * 31 + t).cast("long") *
              hash(col("doc_id") * 31 + t).cast("long"),
            lit(50000L))))))
      .select("doc_id", "text")

    // materialize the chunk table to parquet between the stages, as a
    // real pipeline would — the global pack's 3 passes (range sample,
    // per-partition sums, final) must re-read CHUNKS, not re-run the
    // generator lineage 3 times
    val chunkDir = java.nio.file.Files
      .createTempDirectory("chunk_scale").toString
    for (round <- 1 to 2) {
      var t0 = System.nanoTime()
      graft.ops.Chunking.chunkByTokens(docs, "doc_id",
        "text", chunkTokens = 64, overlapTokens = 8)
        .withColumn("chunk_key", col("doc_id") * 1000L + col("chunk_id"))
        .write.mode("overwrite").parquet(chunkDir)
      val chunkS = (System.nanoTime() - t0) / 1e9
      val chunks = spark.read.parquet(chunkDir)
      val nChunks = chunks.count()
      println(f"CHUNK round=$round docs/s=${n / chunkS}%.0f " +
        f"chunks=$nChunks secs=$chunkS%.1f (incl. parquet write)")

      t0 = System.nanoTime()
      val packed = graft.ops.Packing.packGlobalByBudget(
        chunks, "chunk_key", "chunk_text", budgetTokens = 4096L)
      val nShards = packed.select(max(col("shard_id"))).collect()(0)
        .getLong(0) + 1
      val packS = (System.nanoTime() - t0) / 1e9
      println(f"CHUNK_PACK round=$round chunks/s=${nChunks / packS}%.0f " +
        f"shards=$nShards secs=$packS%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
