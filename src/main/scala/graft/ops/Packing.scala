package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Context packing / shard assignment — the last step of a training-data
  * pipeline before the tokenizer: lay documents end-to-end in a stable
  * order and cut the stream into fixed token-budget shards (training
  * contexts / batch files). Every document gets a deterministic
  * (shard, offset) address, so downstream loaders can fetch any shard
  * without replaying the pipeline.
  *
  * Semantics: within each stratum, documents are concatenated in id
  * order; a document's shard is `floor(start_offset / budget)` — the
  * "concatenate then chunk" rule (a doc whose tokens straddle a budget
  * boundary belongs to the shard where it STARTS; loaders that must not
  * split docs treat the tail as the overflow into the next context,
  * exactly how GPT-style packing handles boundary docs).
  *
  * Scale: the running sum is a window partitioned by the stratum
  * columns, so each stratum packs independently — one shuffle on the
  * stratum key, then a single ordered pass per stratum. Real corpora
  * stratify by (source, language, dump-date, ...), giving thousands of
  * independent strata; packing is embarrassingly parallel across them.
  * An UNSTRATIFIED call would funnel the corpus into one task (Spark's
  * empty-partition window) — require at least one stratum column and
  * leave global packing to a per-partition pack + offset merge, which
  * loses the stable doc→shard address this operator exists to provide.
  */
object Packing {

  /** Per-document shard assignment. Output: the stratum columns, the id,
    * `n_tok` (whitespace tokens), `start_off` (tokens before this doc in
    * its stratum stream) and `shard_id` (budget-sized chunk index within
    * the stratum).
    */
  def packByBudget(df: DataFrame, idCol: String, textCol: String,
      strataCols: Seq[String], budgetTokens: Long): DataFrame = {
    require(strataCols.nonEmpty,
      "packByBudget needs >= 1 stratum column: an unstratified running " +
        "sum is a single-task window (see scaladoc); stratify or " +
        "pre-chunk the corpus")
    require(budgetTokens > 0, s"budget $budgetTokens")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nTok = size(TextOps.tokens(col(textCol))).cast(LongType)
    df.select(strataCols.map(col) :+ col(idCol) :+ nTok.as("n_tok"): _*)
      .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("shard_id", floor(col("start_off") / budgetTokens)
        .cast(LongType))
  }

  /** Shard-level summary of a packing: docs and tokens per shard. A
    * shard's token count exceeds the budget only by its boundary doc's
    * overflow — `max_overflow = max(0, tokens - budget)` per shard is
    * the padding-vs-truncation cost the loader pays.
    */
  def shardStats(packed: DataFrame, strataCols: Seq[String],
      budgetTokens: Long): DataFrame =
    packed.groupBy((strataCols :+ "shard_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok"),
        max(col("start_off") + col("n_tok")).as("__end"))
      .withColumn("overflow",
        greatest(lit(0L),
          col("__end") - (col("shard_id") + 1L) * budgetTokens))
      .drop("__end")
}
