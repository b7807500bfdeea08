package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: time named registry queries (args = names, or
  * `all`) at `SPARK_GRAFT_SF_DIR` with the Bench harness's cold+3-warm
  * protocol, for chasing individual rows without a full bench run.
  */
object DriveQueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.isEmpty || args.sameElements(Array("all")))
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def timed(): Double = {
        val t0 = System.nanoTime()
        graft.ops.CacheScope.withCaches(spark) { fn(spark, dir).count() }
        (System.nanoTime() - t0) / 1e9
      }
      val cold = timed()
      val warm = Seq(timed(), timed(), timed()).sorted
      println(f"$name%-32s cold $cold%6.2f  warm ${warm(1)}%6.2f  " +
        f"(${warm.head}%.2f-${warm.last}%.2f)")
    }
    spark.stop()
  }
}
