package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cep._

/** Scale + plan probe for `SHOW EMPTY MATCHES`: the mode's only extra
  * work is the SITE derivation — one pass over the (key, order)
  * projection of the event table joined against the per-key match
  * spans/starts (a SMALL side bounded by the match count) — plus the
  * seed union through the numbering window the mode already pays. So
  * show-empty should cost a small constant factor over plain ALL ROWS
  * on the same pattern, and the sites join must BROADCAST the match
  * side, never shuffle the events twice.
  *
  * The probe runs plain vs show-empty on the same parquet events and
  * reports seconds + output rows, then prints the show-empty plan so
  * the join strategy is inspectable (look for BroadcastHashJoin /
  * BroadcastNestedLoopJoin on the spans/starts side; the event scan
  * should appear ONCE per consumer, with the site scan reading only
  * the key/order/type columns).
  *
  * Usage: DriveShowEmptyScale [threads] [nEvents]
  */
object DriveShowEmptyScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("8")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val path = s"/tmp/graft_show_empty_scale_$n"
    spark.range(n).select(
      (col("id") % 400).as("user_id"),
      col("id").as("event_id"),
      element_at(
        array(lit("click"), lit("view"), lit("purchase"), lit("signup"),
          lit("error")),
        (pmod(hash(col("id")), lit(5)) + 1).cast("int"))
        .as("event_type"),
      pmod(col("id") * 40503, lit(500)).as("value"))
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val schema: Vector[(String, Vector[String])] = Vector(
      "click" -> Vector("event_id", "value"),
      "view" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"),
      "signup" -> Vector("event_id", "value"),
      "error" -> Vector("event_id", "value"))
    def stmt(mode: String): CepSql.CepSqlStatement =
      CepSql.parseStatement(
        "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c, SUM(c.value) AS sv " +
          s"ALL ROWS PER MATCH$mode " +
          "PARTITION BY user_id ORDER BY event_id TYPE event_type " +
          "DEFINE c AS click AFTER MATCH SKIP PAST LAST ROW", schema)
    def time(label: String, mode: String): Unit = {
      val t0 = System.nanoTime()
      val rows = CepMeasures.run(df, stmt(mode)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-12s rows=$rows%9d  sec=$sec%.2f")
    }
    // warm both paths once, then measure
    time("warm-plain", "")
    time("warm-show", " SHOW EMPTY MATCHES")
    time("plain", "")
    time("show-empty", " SHOW EMPTY MATCHES")
    println("== show-empty plan (formatted) ==")
    CepMeasures.run(df, stmt(" SHOW EMPTY MATCHES")).explain("formatted")
    spark.stop()
  }
}
