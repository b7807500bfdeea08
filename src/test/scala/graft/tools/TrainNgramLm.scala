package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.{NgramLm, QualityModel}

/** Trains the committed stupid-backoff bigram LM
  * (`data/codebooks/lm_bigram.parquet`) — the CCNet-style perplexity
  * filter's model. The reference-corpus role is played by the
  * heuristic quality gate's clean side of the TRAIN split (the same
  * rule-bootstrap `QualityModel`/`TrainDsir` use); tercile cut points
  * are fitted on the full train population so the committed gate
  * buckets head/middle/tail the way CCNet does. `ln` runs only here —
  * shipped inference and the DuckDB oracle both consume the committed
  * floored-micro costs.
  *
  * Prints held-out separation (median per-token NLL of clean vs junk
  * docs) so the artifact's signal is on record; `NgramLmSpec` pins it.
  */
object TrainNgramLm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sample = QualityModel.sampleDocs(docs, "doc_id", "text")
    val (trainSet, heldOut) = QualityModel.splitSample(sample)
    val m = NgramLm.train(trainSet)
    NgramLm.writeModel(spark, NgramLm.modelPath, m)
    def med(xs: Seq[Long]): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)
    val scores = heldOut.flatMap { case (_, text, label) =>
      val (n, _, nll) = NgramLm.scoreText(text, m)
      if (n > 0L) Some((Math.floorDiv(nll, n), label)) else None
    }
    val clean = scores.collect { case (s, true) => s }
    val junk = scores.collect { case (s, false) => s }
    println(s"TRAINED ngram-lm on ${trainSet.size} docs from $dir " +
      s"(${m.uniCostMicro.size} unigrams, ${m.biCostMicro.size} bigrams, " +
      s"terciles t1=${m.t1Micro} t2=${m.t2Micro} micros): " +
      s"HELD-OUT median per-token NLL clean ${med(clean)} " +
      s"(n=${clean.size}) vs junk ${med(junk)} (n=${junk.size}) micros " +
      s"-> ${NgramLm.modelPath}")
    spark.stop()
  }
}
