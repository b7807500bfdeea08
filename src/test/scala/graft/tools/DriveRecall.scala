package graft.tools
import org.apache.spark.sql.SparkSession
/** Recall@k of the quantized/pruned ANN rungs vs exact cosine top-k. */
object DriveRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = topSet(graft.ops.Similarity.knnBruteForce(
      emb, emb, "vec_id", "embedding", k = 5))
    def recall(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val approx = topSet(df)
      val r = exact.map { case (q, e) =>
        approx.getOrElse(q, Set.empty[Long]).count(e.contains).toDouble / e.size
      }.sum / exact.size
      println(f"RECALL_$name=$r%.4f")
    }
    recall("SQ8", graft.ops.Similarity.knnSq8TopK(
      emb, emb, "vec_id", "embedding", k = 5, scale = 128))
    recall("PQ", graft.ops.Similarity.pqTopK(
      emb, emb, "vec_id", "embedding", k = 5, m = 8, ksub = 16))
    recall("IVF", graft.ops.Similarity.ivfTopK(
      emb, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4))
    recall("IVFPQ", graft.ops.Similarity.ivfPqTopK(
      emb, emb, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4,
      m = 8, ksub = 16))
    spark.stop()
  }
}
