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

  /** Corpus-frequency fluency score — the integer-exact stand-in for the
    * perplexity filter curation pipelines run against a reference LM:
    * per document, the mean corpus occurrence count of its n-gram
    * occurrences (`lm_milli = floor(1000 * Σ freq(gram) / n_grams)`).
    * Prose built from common constructions scores high; gibberish,
    * rare-token spam, and boundary-heavy junk score low. The "model" is
    * the corpus's own n-gram table, so the score is fully deterministic
    * and the oracle can replay it exactly — no log probabilities, no
    * libm rounding, no external model artifact.
    *
    * Scale: spans hash to 8 bytes in the scan (`Contamination
    * .spanIndexPos` positions are unused here; the occurrence hashes
    * ride the same narrow pass via `spanIndex`); the frequency table is
    * one map-side-combined count on the hash, the join back has one row
    * per gram (no explosion, AQE handles the "of the" skew), and the
    * per-doc mean is a partial-aggregated groupBy on the doc id. Docs
    * shorter than n tokens (including empty ones) contribute their
    * whole text as one span — standard span semantics, so every
    * non-null doc gets a row.
    */
  def lmFluencyScore(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    val spans = Contamination.spanIndex(
      df.filter(col(idCol).isNotNull && col(textCol).isNotNull),
      idCol, textCol, n).cache()
    val freq = spans.groupBy(col("sh")).agg(count(lit(1)).as("__freq"))
    spans.join(freq, "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("__freq")).as("__sum"))
      // integral division: exact at any magnitude (a double quotient
      // would lose ulps once Σfreq·1000 crosses 2^53 at corpus scale)
      .withColumn("lm_milli",
        expr("__sum * 1000 DIV n_grams").cast(LongType))
      .drop("__sum")
  }
}
