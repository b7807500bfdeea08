package graft.tools
import org.apache.spark.sql.SparkSession
import graft.ops.Codebooks

/** Trains the committed ANN codebook artifacts in `data/codebooks/` from
  * the sf0.01 embeddings — deterministic (hash-ordered bounded sample,
  * fixed seed/iterations, driver-side Lloyd's), so re-running this tool
  * reproduces the committed parquet byte-for-byte values.
  *
  *   Test/runMain graft.tools.TrainCodebooks [sfDir]
  *
  * Artifacts: coarse16 (IVF spherical k-means, nlist=16), pq_m32_k256
  * (per-subspace L2 k-means, m=32, ksub=256 — 32 one-byte codes per
  * 64-dim vector, 8× compression), pqres_m32_k256 (same, trained on
  * residuals vs coarse16 — faiss `by_residual`). m=32 rather than the
  * classic m=8: these embeddings are structureless uniform noise, so
  * coarse subspaces can't exploit correlation; 2-dim subspaces with 256
  * codewords keep recall@5 ≥ 0.9 where m=8 stops at 0.63.
  */
object TrainCodebooks {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val coarse = Codebooks.trainCoarse(emb, "vec_id", "embedding", nlist = 16)
    Codebooks.writeCoarse(spark, Codebooks.coarsePath, coarse)
    val pq = Codebooks.trainPq(emb, "vec_id", "embedding", m = 32,
      ksub = 256)
    Codebooks.writePq(spark, Codebooks.pqPath, pq)
    val pqRes = Codebooks.trainPq(emb, "vec_id", "embedding", m = 32,
      ksub = 256, residualOf = Some(coarse))
    Codebooks.writePq(spark, Codebooks.pqResPath, pqRes)
    println(s"TRAINED coarse=${coarse.length} pq=${pq.map(_.length).sum} " +
      s"pqres=${pqRes.map(_.length).sum} from $dir")
    spark.stop()
  }
}
