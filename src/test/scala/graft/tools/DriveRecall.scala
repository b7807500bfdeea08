package graft.tools
import org.apache.spark.sql.SparkSession
import graft.ops.{Codebooks, Similarity}

/** Recall@k of the quantized/pruned ANN rungs vs exact cosine top-k —
  * both the shipped trained-codebook configs (committed artifacts in
  * `data/codebooks/`) and the untrained first-ids fallback for contrast.
  */
object DriveRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val coarse = Codebooks.loadCoarse(spark, Codebooks.coarsePath)
    val pq = Codebooks.loadPq(spark, Codebooks.pqPath)
    val pqRes = Codebooks.loadPq(spark, Codebooks.pqResPath)
    val exact = RecallHarness.topSet(Similarity.knnBruteForce(
      emb, emb, "vec_id", "embedding", k = 5))
    def recall(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(f"RECALL_$name=${RecallHarness.recallAgainst(exact, df)}%.4f")
    recall("SQ8", Similarity.knnSq8TopK(
      emb, emb, "vec_id", "embedding", k = 5, scale = 128))
    recall("PQ", Similarity.pqTopK(
      emb, emb, "vec_id", "embedding", k = 5, m = 32, ksub = 256,
      codebook = Some(pq)))
    recall("IVF", Similarity.ivfTopK(
      emb, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 8,
      centroids = Some(coarse)))
    recall("IVFPQ", Similarity.ivfPqTopK(
      emb, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 8,
      m = 32, ksub = 256, centroids = Some(coarse), codebook = Some(pq)))
    recall("IVFPQ_RES", Similarity.ivfPqTopK(
      emb, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 8,
      m = 32, ksub = 256, centroids = Some(coarse), codebook = Some(pqRes),
      byResidual = true))
    recall("IVFPQ_REFINE", Similarity.refineTopK(
      emb, emb, "vec_id", "embedding",
      Similarity.ivfPqTopK(emb, emb, "vec_id", "embedding", k = 25,
        nlist = 16, nprobe = 8, m = 32, ksub = 256,
        centroids = Some(coarse), codebook = Some(pq)), k = 5))
    recall("PQ_untrained_k16", Similarity.pqTopK(
      emb, emb, "vec_id", "embedding", k = 5, m = 8, ksub = 16))
    recall("IVF_untrained", Similarity.ivfTopK(
      emb, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4))
    spark.stop()
  }
}
