package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: window-based vs aggregate-join frequency cap for the capped
  * Jaccard join (sf0.1, cap=64).
  */
object DriveCapCompare {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Queries.table(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CAP $l: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def joinVariant(): Long = {
      val idx = graft.ops.DedupOps.shingleIndex(docs, "doc_id", "text", 3)
      val freq = idx.groupBy(col("sh")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") <= 64).select("sh")
      val filtered = idx.join(freq, "sh")
      val counts = filtered.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"))
      val f2 = filtered.cache()
      val out = f2.as("a").join(f2.as("b"), col("a.sh") === col("b.sh"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .groupBy(col("id1"), col("id2"))
        .agg(count(lit(1)).as("inter"))
        .join(counts.select(col("doc_id").as("id1"), col("n_sh").as("n1")),
          "id1")
        .join(counts.select(col("doc_id").as("id2"), col("n_sh").as("n2")),
          "id2")
        .withColumn("uni", col("n1") + col("n2") - col("inter"))
        .filter(col("inter") * 1000 >= col("uni") * 500)
        .count()
      spark.catalog.clearCache()
      out
    }
    for (r <- 1 to 2) {
      time(s"window r$r") {
        val n = graft.ops.DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
          3, 500, 64L).count()
        spark.catalog.clearCache(); n
      }
      time(s"aggjoin r$r")(joinVariant())
    }
    spark.stop()
  }
}
