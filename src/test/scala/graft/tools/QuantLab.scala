package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-18 lab: the log-bucket CASE chain (linear 58-branch scan vs
  * balanced binary-search tree over the same exact integer boundaries)
  * and the cents() Decimal conversion cost, on sf0.1 lineitem.
  */
object QuantLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Queries.table(spark, "/root/testdata/sf0.1", "lineitem")
      .select(col("l_returnflag").as("g"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("price_c"))
      .cache()
    li.count()

    val sub = 32
    // binary-search bucket over the same boundaries as Quantiles.bucketSql
    def binCase(lo: Int, hi: Int, v: String): String =
      if (lo == hi) {
        val e = lo - 5
        s"(${(e + 1) * sub} + ($v DIV ${1L << e}) % $sub)"
      } else {
        val mid = (lo + hi + 1) / 2
        s"(CASE WHEN $v >= ${1L << mid} THEN ${binCase(mid, hi, v)} " +
          s"ELSE ${binCase(lo, mid - 1, v)} END)"
      }
    def bucketBin(v: String): Column =
      expr(s"(CASE WHEN $v >= 32 THEN ${binCase(5, 62, v)} ELSE $v END)")

    // identity over the actual data
    val mism = li.filter(col("price_c") >= 0)
      .filter(graft.ops.Quantiles.bucketCol("price_c") =!=
        bucketBin("price_c")).count()
    // identity over adversarial longs (powers of two +-1)
    val edge = (5 to 62).flatMap(k =>
      Seq((1L << k) - 1, 1L << k, (1L << k) + 1)).filter(_ >= 0) ++
      Seq(0L, 1L, 31L, 32L, Long.MaxValue / 2)
    val edgeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(edge.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("price_c", LongType))))
    val mism2 = edgeDf
      .filter(graft.ops.Quantiles.bucketCol("price_c") =!=
        bucketBin("price_c")).count()
    println(s"QLAB mismatches=$mism edge=$mism2 (must be 0)")

    def t(label: String)(c: => Column): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 10) { li.select(sum(c)).collect(); i += 1 }
      println(f"QLAB $label%-24s ${(System.nanoTime() - t0) / 10e9}%.3fs/pass")
    }
    for (r <- 1 to 2) {
      println(s"--- round $r ---")
      t("bucket_linear")(graft.ops.Quantiles.bucketCol("price_c"))
      t("bucket_binary")(bucketBin("price_c"))
      t("identity")(col("price_c"))
    }
    // cents() conversion cost on the raw table
    val raw = graft.Queries.table(spark, "/root/testdata/sf0.1", "lineitem")
      .cache()
    raw.count()
    def t2(label: String)(c: => Column): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 10) { raw.select(sum(c)).collect(); i += 1 }
      println(f"QLAB $label%-24s ${(System.nanoTime() - t0) / 10e9}%.3fs/pass")
    }
    t2("cents_decimal")(
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
    t2("raw_double_sum")(col("l_extendedprice"))
    spark.stop()
  }
}
