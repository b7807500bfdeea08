package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: run cep_sql_permute at an sf dir, print rows + plan. */
object DrivePermuteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Queries.cepSqlPermute(spark, dir)
    df.explain("formatted")
    println("rows=" + df.count())
    df.show(20, truncate = false)
    spark.stop()
  }
}
