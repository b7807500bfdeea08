package graft.tools

import org.apache.spark.sql.SparkSession

/** Quantify per-read fixed overhead: schema-inferred vs explicit-schema
  * parquet reads, and Spark-job vs driver-local loads of tiny artifacts.
  */
object ReadOverheadLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val p = s"$dir/events.parquet"
    def t[A](label: String, n: Int)(f: => A): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f; i += 1 }
      println(f"RLAB $label%-40s ${(System.nanoTime() - t0) / 1e9 / n}%.3fs/op")
    }
    val schema = spark.read.parquet(p).schema
    t("infer_read_count", 5) {
      spark.read.parquet(p).count()
    }
    t("schema_read_count", 5) {
      spark.read.schema(schema).parquet(p).count()
    }
    t("infer_read_build_only", 5) {
      spark.read.parquet(p)
    }
    t("schema_read_build_only", 5) {
      spark.read.schema(schema).parquet(p)
    }
    t("table_helper_build_only", 5) {
      graft.Queries.table(spark, dir, "events")
    }
    // tiny artifact load via Spark vs driver-local
    val cb = graft.ops.Codebooks.pqPath
    t("spark_collect_codebook", 5) {
      spark.read.parquet(cb).collect()
    }
    spark.stop()
  }
}
