package graft.tools
import org.apache.spark.sql.SparkSession
import graft.ops.{Codebooks, Similarity}

/** Builds the committed persisted IVFPQ index
  * (`Codebooks.ivfPqIndexPath`) from the sf0.01 embeddings with the
  * committed quantizers — the encode-once half of the
  * build-once/query-many ANN path that `knn_ivfpq_index_top5` reads.
  * Deterministic given (corpus, quantizers): cell assignment and PQ
  * encoding are integer floored-micro argmins, so re-running reproduces
  * the committed values (file names differ, values do not).
  *
  *   Test/runMain graft.tools.BuildIvfPqIndex [sfDir]
  */
object BuildIvfPqIndex {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val coarse = Codebooks.loadCoarse(spark, Codebooks.coarsePath)
    val pq = Codebooks.loadPq(spark, Codebooks.pqPath)
    Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
      Codebooks.ivfPqIndexPath, coarse, pq)
    val n = spark.read.parquet(Codebooks.ivfPqIndexPath).count()
    println(s"INDEXED rows=$n at ${Codebooks.ivfPqIndexPath} from $dir")
    spark.stop()
  }
}
