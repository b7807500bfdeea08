package graft.tools

/** Print the formatted physical plan of named registry queries (plan
  * audits for SCALE.md).
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    for (name <- args) {
      println(s"==== $name ====")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
