package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.cep._

/** Verify drive for streaming navigation: the PUBLIC streaming API on a
  * real file-stream source with an on-disk checkpoint — no test
  * harness. Prints one line per scenario; read `NAV_*=` lines.
  *
  *   sbt -batch "Test/runMain graft.tools.DriveStreamingNav"
  */
object DriveStreamingNav {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val schema: Vector[(String, Vector[String])] = Vector(
      "click" -> Vector("event_id", "value"),
      "view" -> Vector("event_id", "value"))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    val jsonSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", LongType)))

    // ---- scenario 1: shared operator, PREV across a stop/restart ----
    val dir = Files.createTempDirectory("drive-nav").toString
    val inDir = s"$dir/in"; val ckpt = s"$dir/ckpt"; val outDir = s"$dir/out"
    val qNav = CepSql.parse(
      "PATTERN (x -> y) DEFINE x AS click; y AS click " +
        "WHERE value > PREV(value)", schema)
    val qPlain = CepSql.parse(
      "PATTERN (a -> b) DEFINE a AS view; b AS view", schema)
    val members = Seq("nav" -> qNav, "plain" -> qPlain)
    def start() = {
      val in = graft.sources.EventSource.jsonStream(spark, inDir, jsonSchema)
      StreamingCep.matchPatternsShared(in, members, spec)
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    Seq((1L, 1L, "click", 5L), (1L, 2L, "view", 0L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q1 = start(); try q1.processAllAvailable() finally q1.stop()
    Seq((1L, 3L, "click", 8L), (1L, 4L, "view", 0L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q2 = start(); try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.schema(StructType(Seq(
      StructField("qname", StringType), StructField("user_id", LongType),
      StructField("binding", StringType)))).json(outDir)
      .collect().map(r => s"${r.getString(0)}:${r.getString(2)}")
      .sorted.mkString(" ")
    println(s"NAV_SHARED_RESTART=$got (expect nav:1;3 plain:2;4)")

    // ---- scenario 2: event-time PREV on out-of-order arrivals ----
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val qEt = CepSql.parse(
      "PATTERN (p) DEFINE p AS click WHERE value > PREV(value)", schema)
    val mem = MemoryStream[(Long, Long, String, Long, java.sql.Timestamp)]
    val et = StreamingCep.matchPatternEventTime(
      mem.toDF().toDF("user_id", "event_id", "event_type", "value", "ts"),
      qEt, spec, "ts", "5 seconds")
    val sq = et.writeStream.format("memory").queryName("drive_nav_et")
      .outputMode("append").start()
    try {
      mem.addData((1L, 2L, "click", 8L, t(11))) // arrives FIRST
      sq.processAllAvailable()
      mem.addData((1L, 1L, "click", 5L, t(10))) // its true PREV source
      sq.processAllAvailable()
      mem.addData((9L, 99L, "click", 0L, t(40))) // watermark push
      sq.processAllAvailable()
    } finally sq.stop()
    val etGot = spark.sql("SELECT * FROM drive_nav_et").collect()
      .map(r => r.getSeq[Long](1).mkString(",")).sorted.mkString(" ")
    println(s"NAV_EVENT_TIME=$etGot (expect 2 — 8>5 in EVENT-TIME order)")

    // ---- scenario 3: NEXT refusal on streaming ----
    val qNext = CepSql.parse(
      "PATTERN (p) DEFINE p AS click WHERE value > NEXT(value)", schema)
    val refusal =
      try { StreamingCep.matchPatternsShared(
        graft.sources.EventSource.jsonStream(spark, inDir, jsonSchema),
        Seq("n" -> qNext), spec); "NOT-REFUSED" }
      catch { case e: IllegalArgumentException =>
        if (e.getMessage.contains("NEXT")) "REFUSED" else e.getMessage }
    println(s"NAV_NEXT_STREAMING=$refusal (expect REFUSED)")

    spark.stop()
  }
}
