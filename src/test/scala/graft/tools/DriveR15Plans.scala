package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot plan audit of the round-15 registry rows (scale habit:
  * `.explain` the plan you shipped, not the one you imagined).
  */
object DriveR15Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("cep_sql_anchor_first", "cep_sql_anchor_last",
        "cep_sql_define_agg", "cep_sql_measures_div",
        "cep_sql_from_clause")) {
      println(s"===== $name =====")
      val df = graft.Queries.all(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      // summarize: exchanges, joins, cep nodes, scans
      plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") ||
          l.contains("CepMatch") || l.contains("Scan parquet") ||
          l.contains("WholeStageCodegen")).take(14)
        .foreach(l => println(l.trim.take(160)))
      println(s"rows=${df.count()}")
    }
    spark.stop()
  }
}
