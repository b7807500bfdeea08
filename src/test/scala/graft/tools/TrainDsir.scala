package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.{Dsir, QualityModel}

/** Trains the committed DSIR λ artifact (`data/codebooks/
  * dsir_bigram.parquet`): hashed-bigram add-1-smoothed log-likelihood
  * ratios between the target distribution (docs the heuristic quality
  * gate passes) and the raw distribution (all docs), floored to integer
  * micros. Deterministic: the sample is the same hash-ordered bounded
  * set `TrainQualityModel` uses, counting is order-free, and `ln` runs
  * only here — the shipped inference and the DuckDB oracle both consume
  * the committed integers.
  *
  * Prints the score spread of target vs non-target docs so the
  * artifact's separation is on record.
  */
object TrainDsir {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sample = QualityModel.sampleDocs(docs, "doc_id", "text")
    // the quality model's train/held-out discipline: λ trains on the
    // train split only, so the held-out split measures the COMMITTED
    // artifact's separation (and DsirSpec pins it)
    val (trainSet, heldOut) = QualityModel.splitSample(sample)
    val w = Dsir.train(trainSet)
    Dsir.writeWeights(spark, Dsir.weightsPath, w)
    def med(xs: Seq[Long]): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)
    val scores = heldOut.map { case (_, text, label) =>
      val (n, s) = Dsir.scoreText(text, w)
      (Dsir.perGram(s, n), label)
    }
    val tgt = scores.collect { case (s, true) => s }
    val non = scores.collect { case (s, false) => s }
    val nz = w.lambdaMicro.count(_ != 0L)
    println(s"TRAINED dsir on ${trainSet.size} docs from $dir " +
      s"(held out ${heldOut.size}): " +
      s"HELD-OUT ${tgt.size} target / ${non.size} non-target, " +
      s"median PER-GRAM score target ${med(tgt)} vs non ${med(non)} micros; " +
      s"$nz nonzero lambdas -> ${Dsir.weightsPath}")
    spark.stop()
  }
}
