package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives SparkEntry.entry exactly as the evaluation driver would: a plain
  * SparkSession built without our configs, then entry(spark).count().
  */
object DriveEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(3)
    spark.stop()
  }
}
