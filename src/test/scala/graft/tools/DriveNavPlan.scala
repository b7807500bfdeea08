package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Queries
import graft.cep.CepMeasures

/** Plan evidence for the navigation path: the lag/lead window's key
  * exchange must be the ONE exchange the NFA consumes — an extra
  * hashpartitioning between the Window and the CEP exec would double
  * the shuffle at corpus scale. Prints the formatted physical plan of
  * the `cep_sql_prev_ascending` registry row and counts exchanges.
  */
object DriveNavPlan {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = CepMeasures.run(Queries.table(spark, sf, "events"),
        Queries.cepSqlPrevAscendingStatement)
      val plan = df.queryExecution.executedPlan.toString
      println(plan)
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      println(s"NAVPLAN exchanges=$nEx")
    } finally spark.stop()
  }
}
