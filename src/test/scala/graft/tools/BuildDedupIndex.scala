package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.ops.{Codebooks, IncrementalDedup}

/** Builds the committed persisted MinHash dedup index
  * (`Codebooks.dedupIndexPath`) from the sf0.01 documents corpus
  * (doc_id % 10 != 0 — the same corpus/batch split the incremental
  * registry rows use), hot-bucket cap 64. Deterministic given the
  * corpus: signatures and band keys are seeded integer hashes, so
  * re-running reproduces the committed values (file names differ,
  * values do not).
  *
  *   Test/runMain graft.tools.BuildDedupIndex [sfDir]
  */
object BuildDedupIndex {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 =!= 0)
    IncrementalDedup.writeIndex(corpus, "doc_id", "text",
      Codebooks.dedupIndexPath, maxBucketSize = 64L)
    val nb = spark.read.parquet(s"${Codebooks.dedupIndexPath}/bands").count()
    val ns = spark.read.parquet(s"${Codebooks.dedupIndexPath}/sigs").count()
    println(s"INDEXED bands=$nb sigs=$ns at ${Codebooks.dedupIndexPath} " +
      s"from $dir")
    spark.stop()
  }
}
