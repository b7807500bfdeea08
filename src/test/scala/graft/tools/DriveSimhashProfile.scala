package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage timing for dedup_simhash (scratch tool). */
object DriveSimhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Queries.table(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SH $l: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (r <- 1 to 2) {
      time(s"hash_only r$r")(
        graft.ops.DedupOps.simHash(docs, "doc_id", "text").count())
      time(s"pairs r$r")(
        graft.ops.DedupOps.simHashPairs(docs, "doc_id", "text", 3).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
