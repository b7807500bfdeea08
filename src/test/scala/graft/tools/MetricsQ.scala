package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Post-execution operator-metric dump: run a registry query warm, then
  * walk the AQE-final physical tree printing each operator's key metrics
  * (output rows, codegen duration, shuffle/sort/agg times). The poor
  * man's SQL tab (spark.ui is off in this sandbox) — guide §7.1/7.2.
  */
object MetricsQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val interesting = Set("numOutputRows", "duration", "aggTime", "sortTime",
      "collectTime", "buildTime", "shuffleWriteTime", "fetchWaitTime",
      "elapsed time total (min, med, max)", "time in aggregation build")

    def fmt(v: Long, name: String): String =
      if (name.contains("Time") || name == "duration") f"${v / 1e3}%.2fs"
      else v.toString

    def walk(p: SparkPlan, depth: Int, seen: java.util.IdentityHashMap[SparkPlan, Boolean]): Unit = {
      if (seen.containsKey(p)) return
      seen.put(p, true)
      val ms = p.metrics.collect {
        case (n, m) if (interesting(n) && m.value > 0) ||
            ((n.toLowerCase.contains("time") ||
              n.toLowerCase.contains("duration")) && m.value > 200) ||
            (n == "numOutputRows" && m.value > 50000) =>
          s"$n=${fmt(m.value, n)}"
      }
      val pad = "  " * depth
      println(f"MQ $pad${p.nodeName} ${ms.mkString(" ")}")
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1, seen)
        case q: QueryStageExec => walk(q.plan, depth + 1, seen)
        case im: InMemoryTableScanExec =>
          walk(im.relation.cachedPlan, depth + 1, seen)
        case r: ReusedExchangeExec => walk(r.child, depth + 1, seen)
        case _ => p.children.foreach(walk(_, depth + 1, seen))
      }
      p.subqueries.foreach(walk(_, depth + 1, seen))
    }

    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      graft.ops.CacheScope.withCaches(spark) { fn(spark, dir).count() } // warm
      val df = fn(spark, dir)
      graft.ops.CacheScope.withCaches(spark) {
        val t0 = System.nanoTime()
        df.count()
        println(f"==== MQ $name wall ${(System.nanoTime() - t0) / 1e9}%.2fs ====")
        walk(df.queryExecution.executedPlan, 0,
          new java.util.IdentityHashMap[SparkPlan, Boolean])
      }
    }
    spark.stop()
  }
}
