package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent *per partitioning* (it samples by
  * position, so a repartition changes the picked rows); at corpus scale a
  * sample must be a pure function of the data so it is reproducible
  * across runs, engines, partitionings, and incremental re-ingests.
  * These operators hash a stable id with the engine-portable polynomial
  * hash (`graft.functions.PolyHash`, mirrored in SQL oracles) and keep a
  * row iff `hash(id) mod 1000 < rateMilli` — a narrow, codegen'd filter
  * that pushes into the scan, no shuffle, no state.
  *
  * Stratified variant: per-stratum permille rates (e.g. downsample the
  * dominant language, keep the tail) — the standard data-mixing move for
  * LLM corpora, as one deterministic filter.
  */
object Sampling {

  /** `hash(id as string) mod 1000` — the sampling key, in [0, 1000). */
  def sampleKey(idCol: Column): Column =
    graft.functions.PolyHash.polyHash(idCol.cast("string"), 131L) % 1000L

  /** Keep rows whose sample key falls below `rateMilli` (permille). */
  def deterministicSample(df: DataFrame, idCol: String,
      rateMilli: Int): DataFrame = {
    require(rateMilli >= 0 && rateMilli <= 1000, s"rate $rateMilli")
    df.filter(sampleKey(col(idCol)) < rateMilli)
  }

  /** Per-stratum permille rates; strata not in `rates` use
    * `defaultMilli`. One `CASE WHEN` filter — still narrow/codegen'd.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultMilli: Int): DataFrame = {
    require((defaultMilli +: rates.values.toSeq)
      .forall(r => r >= 0 && r <= 1000), s"rates out of [0,1000]")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultMilli)) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(sampleKey(col(idCol)) < rate)
  }

  /** Mixture rebalancing by ABSOLUTE per-stratum quota: keep at most
    * `quota(stratum)` rows per stratum, chosen by hash order (the
    * deterministic permutation `(polyhash(id), id)`), so the selection
    * is a uniform sample that is stable under re-runs, re-partitioning,
    * and corpus growth-at-the-tail. This is the "hit the target data
    * mix" counterpart of `stratifiedSample`'s rate cut: rates preserve
    * proportions, quotas enforce a budget (e.g. equal tokens per
    * language regardless of raw crawl skew).
    *
    * Scale: one shuffle on the stratum key for the ranking window; each
    * stratum ranks independently. A stratum is one task — fine for the
    * (source × lang × ...) strata real corpora use; for a single giant
    * stratum prefer the rate cut, which is shuffle-free.
    */
  def quotaSample(df: DataFrame, idCol: String, strataCol: String,
      quotas: Map[String, Long], defaultQuota: Long): DataFrame = {
    require((defaultQuota +: quotas.values.toSeq).forall(_ >= 0),
      "quotas must be >= 0")
    val quota = quotas.toSeq.sortBy(_._1).foldLeft(lit(defaultQuota)) {
      case (acc, (stratum, q)) =>
        when(col(strataCol) === stratum, lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol)).orderBy(
      graft.functions.PolyHash.polyHash(col(idCol).cast("string"), 131L),
      col(idCol))
    // null ids drop: polyhash(NULL) is NULL, and Spark's NULLS FIRST
    // window order would let a null row consume a quota slot while a SQL
    // engine's NULLS LAST would not — excluding them keeps the selection
    // engine-portable (mirrored by the oracle's WHERE)
    df.filter(col(idCol).isNotNull)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Temperature-based mixture rebalancing at τ = 1/2: per-stratum
    * quotas ∝ √n_stratum, normalized to an absolute `budget` — the
    * multilingual-corpus resampling move (upweight tail languages,
    * damp the head) with the quotas DERIVED FROM THE DATA rather than
    * hand-written like `quotaSample`'s map.
    *
    * τ = 1/2 specifically because it is the one non-trivial temperature
    * that stays engine-exact: IEEE-754 `sqrt` is correctly rounded (a
    * basic operation, unlike `pow`/`ln`), so `floor(sqrt(n))` on a
    * BIGINT-exact double is the same integer in every engine, and the
    * rest is integer multiply/divide. quota_s = (budget·⌊√n_s⌋) div
    * Σ⌊√n_s⌋; rows are then kept by the same deterministic hash-order
    * ranking as `quotaSample` (stable under re-runs, re-partitioning,
    * and tail growth).
    *
    * Scale: the counts aggregate is map-side combined and yields one
    * row per stratum; the quota frame is broadcast; the only wide op is
    * the per-stratum ranking window — identical shape to `quotaSample`.
    * Null ids and null strata are excluded (oracle-mirrored WHERE).
    */
  def temperatureQuotaSample(df: DataFrame, idCol: String,
      strataCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget $budget")
    val base = df.filter(col(idCol).isNotNull && col(strataCol).isNotNull)
    // one row per stratum; Σ⌊√n⌋ as an unpartitioned window over that
    // TINY frame (one row per stratum — never the corpus), which keeps
    // the plan free of the scalar cross join a separate agg would need
    val counts = base.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_stratum"))
      .withColumn("__s",
        expr("CAST(FLOOR(SQRT(CAST(n_stratum AS DOUBLE))) AS BIGINT)"))
    val quotas = counts
      .withColumn("__tot", sum(col("__s")).over(
        org.apache.spark.sql.expressions.Window
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("quota", expr(s"(${budget}L * __s) DIV __tot"))
      .select(col(strataCol), col("n_stratum"), col("quota"))
    val w = Window.partitionBy(col(strataCol)).orderBy(
      graft.functions.PolyHash.polyHash(col(idCol).cast("string"), 131L),
      col(idCol))
    base.join(broadcast(quotas), strataCol)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("quota"))
      .drop("__rk")
  }

  /** PPS SYSTEMATIC sampling (probability proportional to size): per
    * stratum, pick ~`k` rows with inclusion probability proportional
    * to `weightCol`, by walking the cumulative-weight line with a
    * fixed stride (`ceil(total/k)`) — a row is selected iff the stride
    * grid crosses its weight interval, i.e. `cum DIV stride >
    * (cum - w) DIV stride`. ALL-INTEGER arithmetic (exact across
    * engines, runs and partitionings — no float keys, unlike
    * exponential-key reservoir methods whose `ln`/`pow` are
    * libm-dependent), one window pass per stratum; a row heavier than
    * the stride is always selected (standard PPS behavior). Weights
    * must be positive; the per-stratum pick count is
    * `ceil(total/stride) <= k`, and the deterministic `idCol` walk
    * order makes the grid reproducible.
    *
    * Scale note: the running cumulative sum serializes each stratum
    * through one task (systematic sampling needs a total order per
    * stratum — inherent). Strata here are languages/sources, so the
    * hottest stratum is a bounded fraction of the corpus; if a single
    * stratum ever dominates at 100 TB, split the walk into the two-pass
    * per-partition prefix-sum form used by `Packing.packGlobalByBudget`
    * (partial sums per partition, broadcast offsets, local walk).
    */
  def ppsSystematicSample(df: DataFrame, idCol: String,
      strataCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"ppsSystematicSample: k must be >= 1 ($k)")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__w", col(weightCol).cast("long"))
      .withColumn("__cum", sum(col("__w")).over(w))
      .withColumn("__stride",
        expr(s"(sum(__w) OVER (PARTITION BY $strataCol) + ${k - 1}L) " +
          s"DIV ${k}L"))
      .filter(expr("__cum DIV __stride > (__cum - __w) DIV __stride"))
      .drop("__w", "__cum", "__stride")
  }
}
