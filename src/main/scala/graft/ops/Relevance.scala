package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Term-weighting operators over a document corpus: per-document TF-IDF
  * top terms (keyword extraction / relevance features) and global
  * vocabulary heavy hitters (tokenizer and vocab construction).
  *
  * All scores are exact integers so the DuckDB oracle hash-matches: the
  * idf factor is the linear rarity ratio `N / df` rather than `log(N/df)`
  * (a log would make the score depend on each engine's libm rounding).
  * Per-term ranking is unchanged for equal tf, and the score remains
  * monotone in tf and in rarity — the standard structure, integer-exact.
  *
  * Scale notes (~100 TB corpus):
  *   - `termFrequencies` is explode → partial-aggregated groupBy: the
  *     map-side combine collapses each document's repeated tokens before
  *     the (doc, token) shuffle.
  *   - Document frequency aggregates the *already-distinct* (doc, token)
  *     pairs — one extra shuffle on token, each row 8+len bytes.
  *   - The df join back onto term frequencies is a shuffle join on token;
  *     AQE broadcasts the df side while the vocabulary fits (typically a
  *     few M rows) and degrades to a shuffle join beyond that. Token skew
  *     ("the") is bounded: the joined df side has ONE row per token, so no
  *     row explosion — skewed partitions are handled by AQE skew split.
  *   - The per-doc top-k window shuffles by doc id, but Spark's
  *     WindowGroupLimit applies the rank limit per-partition BEFORE that
  *     exchange — at most k rows per doc per partition are shuffled, not
  *     every scored term (pinned by PlanRegressionSpec).
  *
  * Cache contract: `tfIdfTopTerms` caches the term-frequency frame (both
  * the df aggregation and the scoring join read it); the caller releases
  * it via `spark.catalog.clearCache()` after materializing the result.
  */
object Relevance {

  /** One row per (doc, token) with its in-document term frequency. */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).cast(LongType).as(idCol),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k terms per document by the integer TF-IDF surrogate
    * `score = tf * 1000 * N div df` (N = corpus document count, df = number
    * of distinct documents containing the term). Ties break on token
    * ascending. Documents with no tokens are absent (nothing to rank).
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val tf = termFrequencies(df, idCol, textCol).cache()
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("dfreq"))
    // corpus size as a broadcast single-row frame — no driver-side action,
    // the count lands in the same job as the rest of the plan. N counts
    // ALL corpus rows (mirroring the oracle's bare count(*)): null-text
    // docs are part of the corpus even though they contribute no terms
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(docFreq, "token")
      .crossJoin(broadcast(nDocs))
      // tf ≤ doc length, N·1000·tf stays far below 2^53: the double
      // quotient is exact enough that floor == integer division
      .withColumn("score",
        floor(col("tf").cast(DoubleType) * 1000d *
          col("n_docs").cast(DoubleType) / col("dfreq").cast(DoubleType))
          .cast(LongType))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("token"), col("tf"), col("dfreq"),
        col("score"))
  }

  /** Global top-k vocabulary terms by total occurrence count (count desc,
    * token asc) — heavy hitters for vocab construction. The aggregation is
    * map-side combined; the top-k is a TakeOrdered (per-partition k-min
    * heaps merged on the driver), never a global sort.
    */
  def vocabTopK(df: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    val counts = df
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)
    // rank the k surviving rows — the window sees k rows, not the vocab
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts.withColumn("rnk", row_number().over(w).cast(LongType))
      .select(col("rnk"), col("token"), col("cnt"))
  }
}
