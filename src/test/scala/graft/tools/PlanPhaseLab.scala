package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase split per registry query: DataFrame build, analysis+optimize,
  * physical planning, and execution — how much of a warm run is driver
  * planning vs cluster work (round-18 optimization forensics).
  */
object PlanPhaseLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      graft.ops.CacheScope.withCaches(spark) { fn(spark, dir).count() } // warm
      for (r <- 1 to 2) {
        graft.ops.CacheScope.withCaches(spark) {
          val t0 = System.nanoTime()
          val df = fn(spark, dir)
          val t1 = System.nanoTime()
          df.queryExecution.optimizedPlan // analysis + optimizer
          val t2 = System.nanoTime()
          df.queryExecution.executedPlan // physical planning (pre-AQE)
          val t3 = System.nanoTime()
          df.count()
          val t4 = System.nanoTime()
          def s(a: Long, b: Long) = f"${(b - a) / 1e9}%5.2f"
          println(s"PHASE $name r$r build=${s(t0, t1)} opt=${s(t1, t2)} " +
            s"phys=${s(t2, t3)} exec=${s(t3, t4)} total=${s(t0, t4)}")
        }
      }
    }
    spark.stop()
  }
}
