package graft.tools
import org.apache.spark.sql.SparkSession
/** Time one registry query at a given sf dir: DriveOne <name> [sfDir]. */
object DriveOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || !graft.Queries.all.contains(args(0))) {
      System.err.println("usage: DriveOne <name> [sfDir]; names: " +
        graft.Queries.all.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val name = args(0)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.Queries.all(name)(spark, dir).count()
      println(f"DRIVE_ONE $name run$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
