package graft.tools

/** Ad-hoc per-query timer for bench forensics: run named registry
  * queries N times each on sf0.1 in isolation.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        graft.ops.CacheScope.withCaches(spark) { fn(spark, dir).count() }
        println(f"TIMEQ $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
