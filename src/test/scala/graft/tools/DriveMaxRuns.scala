package graft.tools

import org.apache.spark.sql.SparkSession
import graft.cep._

/** Drive the maxRunsPerKey valve through the public SparkCep surface on
  * real testdata.
  */
object DriveMaxRuns {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.table(spark, "/root/testdata/sf0.001", "events")
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    val nd = CepQuery(
      Pattern.lpatInf("a", "click", "True", Contiguity.NdRelaxed, 1),
      Vector("click" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value"),
        "error" -> Vector("event_id", "value"),
        "signup" -> Vector("event_id", "value"),
        "view" -> Vector("event_id", "value")))
    val tripped =
      try { SparkCep.matchPattern(df, nd, spec, Some(50)).count(); "NO" }
      catch { case e: Throwable =>
        if (e.getMessage != null && e.getMessage.contains("maxRuns")) "YES"
        else Option(e.getCause).map(_.getMessage).filter(_ != null)
          .map(m => if (m.contains("maxRuns")) "YES" else "NO:" + m.take(80))
          .getOrElse("NO:" + e.toString.take(120))
      }
    println("CAP_TRIPPED=" + tripped)
    val ok = SparkCep.matchPattern(df, nd, spec, Some(5000000)).count()
    println("GENEROUS_CAP_ROWS=" + ok)
    spark.stop()
  }
}
