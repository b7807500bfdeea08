package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: time `cep_sql_alt_subset_value` at a given sf dir and
  * dump its physical plan — chasing the round-13 bench outlier (7.9 s
  * warm median vs 0.37 s for the measure-less alt query).
  */
object DriveAltProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Queries.cepSqlAltSubsetValue(spark, dir)
    df.explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.Queries.cepSqlAltSubsetValue(spark, dir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
