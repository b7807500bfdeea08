package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** Trains the committed BPE merges artifact
  * (`data/codebooks/bpe_merges.parquet`) from the corpus word-frequency
  * table. Deterministic: exact long pair counts, lexicographic
  * tie-break, no sampling (the word-frequency TABLE is tiny even when
  * the corpus is not — training cost is O(vocab · word length), which
  * is why real tokenizer training also runs on word counts, not raw
  * text). Prints the last merges and the corpus fertility so artifact
  * quality is on record.
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val numMerges = args.drop(1).headOption.map(_.toInt).getOrElse(96)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wf = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = Bpe.train(wf, numMerges)
    Bpe.writeMerges(spark, Bpe.mergesPath, merges)
    val ranks = merges.map(m => (m.l, m.r) -> m.rank).toMap
    val (toks, words) = wf.foldLeft((0L, 0L)) { case ((t, w), (word, f)) =>
      (t + Bpe.tokenizeWord(word, ranks).length * f, w + f)
    }
    val maxSteps = wf.map { case (word, _) =>
      word.length + 1 - Bpe.tokenizeWord(word, ranks).length
    }.max
    println(s"TRAINED bpe on ${wf.size} distinct words from $dir: " +
      s"${merges.size} merges, corpus fertility ${toks * 1000 / words} " +
      s"milli-tokens/word, max apply steps $maxSteps, last merges " +
      merges.takeRight(3).map(m => s"${m.l}+${m.r}").mkString(", ") +
      s" -> ${Bpe.mergesPath}")
    spark.stop()
  }
}
