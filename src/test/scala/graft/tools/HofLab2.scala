package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round 2 of the HOF lab: the composite quality gate and the exact
  * stop-count, HOF vs codegen formulations; value-identity asserted.
  */
object HofLab2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Queries
      .table(spark, "/root/testdata/sf0.1", "documents").cache()
    docs.count()
    val text = col("text")
    val stop = graft.ops.TextOps.stopwords
    val alt = stop.mkString("|")

    def toksCg: Column = array_remove(split(text, " "), "")
    def padded: Column =
      concat(lit(" "), lower(array_join(toksCg, " ")), lit(" "))
    def nStopHof: Column =
      size(filter(filter(split(text, " "), t => t =!= ""),
        t => lower(t).isin(stop.map(lit): _*))).cast(LongType)
    def nStopLookahead: Column =
      regexp_count(padded, lit(s"(?= (?:$alt) )")).cast(LongType)
    def hasStopRlike: Column = padded.rlike(s" (?:$alt) ")

    def gateCg: Column = {
      val toks = toksCg
      val nTok = size(toks).cast(LongType)
      val charSum = length(translate(text, " ", "")).cast(LongType)
      val nPunct = (length(text) -
        length(translate(text, ".,!?;:", ""))).cast(LongType)
      val meanLen = when(nTok > 0, floor(charSum * 1000.0 / nTok))
        .otherwise(0L).cast(LongType)
      val punctRatio = when(length(text) > 0,
        floor(nPunct * 1000.0 / length(text))).otherwise(0L).cast(LongType)
      nTok > 0 && hasStopRlike && meanLen >= 2000 && meanLen <= 12000 &&
        punctRatio < 200
    }

    // identity checks
    val m1 = docs.filter(text.isNotNull)
      .filter(nStopHof =!= nStopLookahead).count()
    val m2 = docs.filter(text.isNotNull)
      .filter(graft.ops.TextOps.qualityOk(text) =!= gateCg).count()
    println(s"HLAB2 nstop_mismatch=$m1 gate_mismatch=$m2 (must be 0)")

    def tl(label: String)(c: => Column): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 20) { docs.select(sum(c).as("s")).collect(); i += 1 }
      println(f"HLAB2 $label%-26s ${(System.nanoTime() - t0) / 20e9}%.3fs/pass")
    }
    for (r <- 1 to 2) {
      println(s"--- round $r ---")
      tl("nstop_hof")(nStopHof)
      tl("nstop_lookahead")(nStopLookahead)
      tl("gate_current")(graft.ops.TextOps.qualityOk(text).cast("long"))
      tl("gate_codegen")(gateCg.cast("long"))
    }
    spark.stop()
  }
}
