package graft.tools
import org.apache.spark.sql.SparkSession
import graft.ops.{Codebooks, Similarity}

/** Builds the committed per-scale-factor persisted IVFPQ indexes
  * (`Codebooks.ivfPqIndexRoot`) from each sf's embeddings with the
  * frozen sf0.01-trained quantizers — the encode-once half of the
  * build-once/query-many ANN path that `knn_ivfpq_index_top5` reads.
  * Deterministic given (corpus, quantizers): cell assignment and PQ
  * encoding are integer floored-micro argmins, so re-running reproduces
  * the committed values (file names differ, values do not).
  *
  *   Test/runMain graft.tools.BuildIvfPqIndex [sfDir ...]
  */
object BuildIvfPqIndex {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val coarse = Codebooks.loadCoarse(spark, Codebooks.coarsePath)
    val pq = Codebooks.loadPq(spark, Codebooks.pqPath)
    dirs.foreach { dir =>
      val out = Codebooks.ivfPqIndexPathFor(dir)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", out, coarse, pq)
      val n = spark.read.parquet(out).count()
      println(s"INDEXED rows=$n at $out from $dir")
    }
    spark.stop()
  }
}
