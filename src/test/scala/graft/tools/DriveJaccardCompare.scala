package graft.tools
import org.apache.spark.sql.SparkSession
object DriveJaccardCompare {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Queries.table(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    for (r <- 1 to 2) {
      for ((name, f) <- Seq(
        "plain" -> (() => graft.ops.DedupOps.ngramJaccardPairs(docs, "doc_id", "text").count()),
        "prefix" -> (() => graft.ops.DedupOps.ngramJaccardPairsPrefix(docs, "doc_id", "text").count()))) {
        val t0 = System.nanoTime(); val c = f()
        println(f"JC $name round$r: $c pairs ${(System.nanoTime()-t0)/1e9}%.2fs")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
