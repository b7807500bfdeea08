package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cep._

/** Throughput probe for the STREAMING shared-scan CEP operator: N
  * synthetic events across 8 parquet files replayed as micro-batches,
  * k=3 patterns — ONE shared streaming query vs three separate
  * streaming queries (each `writeStream` is its own source scan, key
  * exchange, and state store; that triplication is what the shared
  * operator exists to remove, and unlike the batch probe it is directly
  * measurable on local files).
  *
  * Usage: DriveMultiStreamScale [threads] [nEvents]
  */
object DriveMultiStreamScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("8")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val dir = java.nio.file.Files
      .createTempDirectory("multi-stream-scale").toString
    val per = n / 8
    for (f <- 0L until 8L)
      spark.range(f * per, (f + 1) * per).select(
        (col("id") % 400).as("user_id"),
        col("id").as("event_id"),
        element_at(
          array(lit("click"), lit("view"), lit("purchase"), lit("signup"),
            lit("error")),
          (pmod(hash(col("id")), lit(5)) + 1).cast("int"))
          .as("event_type"),
        pmod(col("id") * 40503, lit(500)).as("value"),
        sha2(col("id").cast("string"), 256).as("props"))
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
      .option("maxFilesPerTrigger", "1").parquet(dir)
    def runOne(df: org.apache.spark.sql.DataFrame, qn: String): Long = {
      val sq = df.writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        sq.processAllAvailable()
        spark.sql(s"SELECT count(*) FROM $qn").head().getLong(0)
      } finally sq.stop()
    }
    // warm-up both paths on a small prefix (JVM/codegen)
    runOne(StreamingCep.matchPatternsShared(src, queries.take(1), spec),
      "warm1")
    runOne(StreamingCep.matchPattern(src, queries.head._2, spec)
      .selectExpr("user_id"), "warm2")

    val t0 = System.nanoTime()
    val sharedN = runOne(
      StreamingCep.matchPatternsShared(src, queries, spec), "shared")
    val secShared = (System.nanoTime() - t0) / 1e9
    println(f"STREAM_SHARED MATCHES=$sharedN SECONDS=$secShared%.1f " +
      f"EVENTS_PER_SEC=${(n / secShared).toLong}")

    val t1 = System.nanoTime()
    val sepN = queries.zipWithIndex.map { case ((_, q), i) =>
      runOne(StreamingCep.matchPattern(src, q, spec)
        .selectExpr("user_id"), s"sep$i")
    }.sum
    val secSep = (System.nanoTime() - t1) / 1e9
    require(sepN == sharedN, s"shared diverged: $sharedN vs $sepN")
    println(f"STREAM_SEPARATE MATCHES=$sepN SECONDS=$secSep%.1f " +
      f"SPEEDUP=${secSep / secShared}%.2fx")
    spark.stop()
  }
}
