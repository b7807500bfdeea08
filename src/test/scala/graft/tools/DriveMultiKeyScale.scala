package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cep._

/** Scale + plan probe for multi-column PARTITION BY
  * (`CepMeasures.runMultiKey`): the composite xxhash64 key makes the
  * matching pipeline IDENTICAL to a single-key run (same exchange, same
  * NFA state), so the mode's only extra cost is the restore join —
  * whose build side is the DISTINCT partition-tuple set, expected to
  * broadcast under AQE at any realistic partition count. The probe
  * times a single-key run vs the equivalent two-column run on the same
  * parquet events and prints the executed plan of the multi-key form
  * (look for ONE BroadcastHashJoin above the match subtree and no
  * second scan of the event table beyond the keyed one).
  *
  * Usage: DriveMultiKeyScale [threads] [nEvents]
  */
object DriveMultiKeyScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("8")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val path = s"/tmp/graft_multi_key_scale_$n"
    spark.range(n).select(
      (col("id") % 400).as("u"),
      element_at(array(lit("web"), lit("ios"), lit("android")),
        (pmod(hash(col("id") * 7), lit(3)) + 1).cast("int")).as("dev"),
      col("id").as("event_id"),
      element_at(
        array(lit("click"), lit("view"), lit("purchase")),
        (pmod(hash(col("id")), lit(3)) + 1).cast("int")).as("event_type"),
      pmod(col("id") * 40503, lit(500)).as("value"))
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val schema: Vector[(String, Vector[String])] = Vector(
      "click" -> Vector("event_id", "value"),
      "view" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"))
    def stmt(part: String): CepSql.CepSqlStatement =
      CepSql.parseStatement(
        "PATTERN (a b) MEASURES FIRST(a) AS a_id, LAST(b) AS b_id, " +
          "SUM(b.value) AS bv " +
          s"PARTITION BY $part ORDER BY event_id TYPE event_type " +
          "DEFINE a AS click; b AS click", schema)
    def time(label: String, part: String): Unit = {
      val t0 = System.nanoTime()
      val rows = CepMeasures.run(df, stmt(part)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-14s rows=$rows%9d  sec=$sec%.2f")
    }
    time("warm-single", "u")
    time("warm-multi", "u, dev")
    time("single-key", "u")
    time("multi-key", "u, dev")
    println("== multi-key plan (formatted) ==")
    CepMeasures.run(df, stmt("u, dev")).explain("formatted")
    spark.stop()
  }
}
