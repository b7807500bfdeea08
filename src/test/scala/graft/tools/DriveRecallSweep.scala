package graft.tools
import org.apache.spark.sql.SparkSession
import graft.ops.{Codebooks, Similarity}

/** One-off config sweep: PQ subspace count and IVF nprobe vs recall@5. */
object DriveRecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = RecallHarness.topSet(Similarity.knnBruteForce(
      emb, emb, "vec_id", "embedding", k = 5))
    def recall(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(f"RECALL_$name=${RecallHarness.recallAgainst(exact, df)}%.4f")
    for (m <- Seq(8, 16, 32)) {
      val pq = Codebooks.trainPq(emb, "vec_id", "embedding", m = m,
        ksub = 256)
      recall(s"PQ_m$m", Similarity.pqTopK(
        emb, emb, "vec_id", "embedding", k = 5, m = m, ksub = 256,
        codebook = Some(pq)))
    }
    val coarse = Codebooks.trainCoarse(emb, "vec_id", "embedding",
      nlist = 16)
    for (np <- Seq(4, 6, 8)) {
      recall(s"IVF_np$np", Similarity.ivfTopK(
        emb, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = np,
        centroids = Some(coarse)))
    }
    val coarse32 = Codebooks.trainCoarse(emb, "vec_id", "embedding",
      nlist = 32)
    for (np <- Seq(8, 12)) {
      recall(s"IVF32_np$np", Similarity.ivfTopK(
        emb, emb, "vec_id", "embedding", k = 5, nlist = 32, nprobe = np,
        centroids = Some(coarse32)))
    }
    val pq16 = Codebooks.trainPq(emb, "vec_id", "embedding", m = 16,
      ksub = 256)
    val pq16res = Codebooks.trainPq(emb, "vec_id", "embedding", m = 16,
      ksub = 256, residualOf = Some(coarse))
    recall("IVFPQ_m16_np6", Similarity.ivfPqTopK(
      emb, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6,
      m = 16, ksub = 256, centroids = Some(coarse), codebook = Some(pq16)))
    recall("IVFPQ_m16_np6_res", Similarity.ivfPqTopK(
      emb, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6,
      m = 16, ksub = 256, centroids = Some(coarse),
      codebook = Some(pq16res), byResidual = true))
    spark.stop()
  }
}
