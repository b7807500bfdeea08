package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen warm-up so the first timed query isn't charged
    // ~5s of JVM start; use the flagship CEP query as the warm-up workload
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    // each query runs twice: cold (first-run codegen + JIT included) and
    // steady-state (same plan re-built and re-executed warm). Op-level
    // caches are cleared before every timed run so both measure the real
    // compute, not a cache hit; cold-vs-steady separates fixed per-query
    // overhead from O(data) work when comparing across machines/rounds.
    // a failed query records -1 (never its time-to-crash: a regression
    // that breaks a query must not read as that query getting faster) and
    // is excluded from totals
    def timed(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${e.getMessage}")
          -1.0
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> (timed(name, fn), timed(name, fn))
    }
    def jmap(sel: ((Double, Double)) => Double) = results
      .map { case (k, v) => s"\"" + k + "\":" + sel(v) }
      .mkString("{", ",", "}")
    val total = results.values.map(_._1).filter(_ >= 0).sum
    val totalSteady = results.values.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_._1)},"queries_steady":${jmap(_._2)},"total_steady":$totalSteady,"sf":"$sfDir"}""")
    spark.stop()
  }
}
