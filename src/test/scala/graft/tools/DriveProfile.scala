package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling of the slow bench queries (scratch tool). */
object DriveProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    import graft.ops.{DedupOps, Similarity}
    import graft.Queries.table

    // warm-up
    table(spark, dir, "documents").count()
    table(spark, dir, "embeddings").count()

    val docs = table(spark, dir, "documents")
    time("mh_signatures")(
      DedupOps.minHashSignatures(docs, "doc_id", "text").count())
    time("mh_full_1")(
      DedupOps.minHashLshPairs(docs, "doc_id", "text").count())
    spark.catalog.clearCache()
    time("mh_full_2")(
      DedupOps.minHashLshPairs(docs, "doc_id", "text").count())
    spark.catalog.clearCache()

    val emb = table(spark, dir, "embeddings")
    time("rhp_signatures")(
      Similarity.rhpSignatures(emb, "vec_id", "embedding", 64).count())
    time("emb_lsh_full_1")(
      Similarity.lshNearNeighbors(emb, "vec_id", "embedding", 64,
        400000L, bandBits = 8).count())
    spark.catalog.clearCache()
    time("emb_lsh_full_2")(
      Similarity.lshNearNeighbors(emb, "vec_id", "embedding", 64,
        400000L, bandBits = 8).count())
    spark.catalog.clearCache()

    time("jaccard_index")(
      DedupOps.shingleIndex(docs, "doc_id", "text").count())
    time("jaccard_full_1")(
      DedupOps.ngramJaccardPairs(docs, "doc_id", "text").count())
    spark.catalog.clearCache()
    time("jaccard_full_2")(
      DedupOps.ngramJaccardPairs(docs, "doc_id", "text").count())

    spark.stop()
  }
}
