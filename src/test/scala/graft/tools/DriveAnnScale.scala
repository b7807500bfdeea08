package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN ladder throughput probe: the same probe batch against the same
  * synthetic corpus through (a) float brute force, (b) SQ8 int8 codes,
  * (c) PQ/ADC codes, (d) IVFPQ (pruned + compressed). Corpus sized so
  * compute dominates scheduling — this is the evidence behind the
  * "quantization wins when the scan is bandwidth/compute-bound" claim
  * in SCALE.md, measured, not asserted.
  *
  * Usage: DriveAnnScale [threads] [corpusN] [probeN]
  */
object DriveAnnScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(200000L)
    val q = args.drop(2).headOption.map(_.toLong).getOrElse(512L)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic 64-dim float vectors in [-1, 1)
    def vecs(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        ((pmod(hash(col("id") * 64 + d), lit(2000)) - lit(1000))
          .cast("double") / 1000.0).cast("float")).as("embedding"))

    val corpus = vecs(spark.range(n).toDF()).cache()
    val probes = vecs(spark.range(q).toDF())
    corpus.count() // materialize outside the timings

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      val scoresPerSec = (n.toDouble * q / sec).toLong
      println(f"ANN_$name rows=$rows sec=$sec%.1f pair_scores_per_sec=$scoresPerSec")
    }

    timed("BRUTE_F32") {
      graft.ops.Similarity.knnBruteForce(corpus, probes, "vec_id",
        "embedding", k = 10).count()
    }
    timed("SQ8") {
      graft.ops.Similarity.knnSq8TopK(corpus, probes, "vec_id",
        "embedding", k = 10, scale = 128).count()
    }
    timed("PQ_ADC") {
      graft.ops.Similarity.pqTopK(corpus, probes, "vec_id",
        "embedding", k = 10, m = 8, ksub = 256).count()
    }
    timed("IVFPQ") {
      graft.ops.Similarity.ivfPqTopK(corpus, probes, "vec_id",
        "embedding", k = 10, nlist = 64, nprobe = 8, m = 8,
        ksub = 256).count()
    }
    spark.stop()
  }
}
