package graft.tools

import org.apache.spark.sql.SparkSession

/** Decompose a registry CEP query's wall time: table read, plan build,
  * action, and the same split for a trivial scan — overhead forensics
  * for the 68-row cep family (round-18 optimization).
  */
object CepOverheadLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CEPLAB $label%-42s ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    // warm-up
    graft.SparkEntry.queries("cep_spat_purchase")(spark, dir).count()
    for (r <- 1 to 3) {
      println(s"--- round $r ---")
      t("read_events_table_count") {
        graft.Queries.table(spark, dir, "events").count()
      }
      t("read_events_noschema_scan_count") {
        spark.read.parquet(s"$dir/events.parquet").count()
      }
      val df = t("build_cep_spat_purchase_df") {
        graft.SparkEntry.queries("cep_spat_purchase")(spark, dir)
      }
      t("count_cep_spat_purchase") { df.count() }
      val df2 = t("build_cep_gpat_times_sp2_df") {
        graft.SparkEntry.queries("cep_gpat_times_sp2")(spark, dir)
      }
      t("count_cep_gpat_times_sp2") { df2.count() }
      val df3 = t("build_cep_sql_multi_measures_df") {
        graft.SparkEntry.queries("cep_sql_multi_measures")(spark, dir)
      }
      t("count_cep_sql_multi_measures") { df3.count() }
      val df4 = t("build_cep_multi_shared_df") {
        graft.SparkEntry.queries("cep_multi_shared")(spark, dir)
      }
      t("count_cep_multi_shared") { df4.count() }
    }
    spark.stop()
  }
}
