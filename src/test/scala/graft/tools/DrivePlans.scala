package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump physical-plan fragments that matter for scale: scan ReadSchema
  * (column pruning), PushedFilters, and join strategies.
  */
object DrivePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def probe(name: String): Unit = {
      val plan = graft.Queries.all(name)(spark, dir)
        .queryExecution.executedPlan.toString
      println(s"=== $name ===")
      plan.linesIterator.filter(l =>
        l.contains("ReadSchema") || l.contains("PushedFilters") ||
        l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("Exchange") || l.contains("WholeStageCodegen"))
        .take(12).foreach(l => println(l.trim.take(200)))
    }
    Seq("cep_spat_purchase", "rel_q3_top_orders", "rel_q1_pricing",
      "dedup_ngram_jaccard").foreach(probe)
    spark.stop()
  }
}
