package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mergeable log-bucket quantile sketch (the DDSketch idea with the
  * γ-bucket replaced by pure base-2 integer math, so every engine
  * reproduces the cells bit-for-bit).
  *
  * A non-negative long `v` maps to a bucket index:
  *
  *   v < 32            → bucket v                      (exact singletons)
  *   2^(e+5) ≤ v       → bucket (e+1)·32 + m,  m = (v >> e) & 31
  *
  * i.e. the exponent octave plus the 5 mantissa bits after the leading
  * one — buckets are contiguous, monotone in `v`, and each covers a
  * relative width ≤ 1/32 (3.125% worst-case quantile error, one-sided:
  * the reported value is the bucket's lower bound, so `est ≤ exact`).
  *
  * Why this shape at 100 TB: Spark's exact `percentile_disc` is a
  * sort-based aggregate whose partial state is the per-group VALUE
  * BUFFER — the shuffle carries every value, and one hot group
  * concentrates the corpus on one reducer. The sketch is an ordinary
  * count aggregation on (group, bucket): partial aggregation runs
  * map-side, the exchange carries ≤ ~2k cells per group regardless of
  * corpus size, and sketches of shards MERGE by cell-wise count sum
  * (union → re-aggregate), which also makes it incremental across
  * days/shards. The quantile extraction then runs on the tiny cell
  * frame (a cumulative-sum window over ≤ 2k rows per group).
  *
  * Everything is integer CASE/div/mod arithmetic generated from one
  * Scala source of truth for both dialects (`bucketSql`/`repSql` with
  * the integer-division token as the only dialect difference), so the
  * DuckDB oracle replays the sketch exactly — including the bucket
  * lower bounds.
  */
object Quantiles {

  /** Mantissa bits kept after the leading one: 32 sub-buckets per
    * octave, relative error ≤ 2^-5.
    */
  val subBits = 5
  private val sub = 1 << subBits // 32

  /** Highest supported exponent (longs up to 2^62). */
  private val maxHi = 62

  /** Bucket index of non-negative long column `v` — a BINARY-SEARCH
    * CASE tree over the leading-bit position with CONSTANT power-of-two
    * divisors per leaf (no variable shifts: both dialects fold
    * `x div 2^k` of a non-negative into the same exact integer).
    * `idiv` is the dialect's integer-division: Spark `DIV`, DuckDB `//`.
    *
    * Tree, not a linear WHEN chain (round-18 optimization): the original
    * 58-branch top-down scan evaluated ~35 failed comparisons per row
    * for realistic magnitudes; the balanced tree decides in ≤ 6 — same
    * boundaries, bit-identical buckets (pinned for every 2^k ± 1 edge
    * and by the per-row differential in `QuantilesSpec`), measured 2.2×
    * on the sf0.1 sketch scan (`QuantLab`).
    */
  def bucketSql(v: String, idiv: (String, String) => String): String = {
    def leaf(hi: Int): String = {
      val e = hi - subBits
      s"(${(e + 1) * sub} + (${idiv(v, s"${1L << e}")}) % $sub)"
    }
    // highest set bit of v is in [lo, hi] (as a power exponent)
    def tree(lo: Int, hi: Int): String =
      if (lo == hi) leaf(lo)
      else {
        val mid = (lo + hi + 1) / 2
        s"(CASE WHEN $v >= ${1L << mid} THEN ${tree(mid, hi)} " +
          s"ELSE ${tree(lo, mid - 1)} END)"
      }
    s"(CASE WHEN $v >= ${1L << subBits} THEN ${tree(subBits, maxHi)} " +
      s"ELSE $v END)"
  }

  /** Lower bound (representative value) of a bucket index — the inverse
    * CASE chain: bucket (e+1)·32+m → (32+m)·2^e.
    */
  def repSql(b: String): String = {
    val branches = (maxHi - subBits to 0 by -1).map { e =>
      val first = (e + 1) * sub
      s"WHEN $b >= $first THEN ($sub + $b - $first) * ${1L << e}"
    }
    s"(CASE ${branches.mkString(" ")} ELSE $b END)"
  }

  private def sparkDiv(a: String, p: String) = s"$a DIV $p"

  /** duckdb's integer-division token. */
  def duckDiv(a: String, p: String) = s"$a // $p"

  def bucketCol(v: String): Column = expr(bucketSql(v, sparkDiv))
  def repCol(b: String): Column = expr(repSql(b))

  /** The sketch: per-(group, bucket) counts. Null and negative values
    * are excluded (the bucket map is defined on non-negative longs);
    * callers tracking signed data offset first.
    */
  def quantileSketch(df: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    val v = col(valueCol).cast(LongType)
    df.filter(v.isNotNull && v >= 0L)
      .select((groupCols.map(col) :+ bucketCol(valueCol).as("qb")): _*)
      .groupBy((groupCols :+ "qb").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Rank-pick core shared by the sketch path and the exact-audit path:
    * `hist` is (group…, keyCol, cnt) with keyCol monotone in the value;
    * returns per (group, q‰) the smallest key whose cumulative count
    * reaches rank ⌈n·q/1000⌉ — exactly `percentile_disc`/
    * `quantile_disc` semantics.
    */
  def rankPick(hist: DataFrame, groupCols: Seq[String], keyCol: String,
      qsPermille: Seq[Int]): DataFrame = {
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cumW = byGroup.orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = hist
      .withColumn("__cum", sum(col("cnt")).over(cumW))
      .withColumn("__n", sum(col("cnt")).over(byGroup))
    val qs = array(qsPermille.map(q => lit(q.toLong)): _*)
    withCum.withColumn("q_permille", explode(qs))
      .withColumn("__rank",
        expr("(__n * q_permille + 999) DIV 1000"))
      .groupBy((groupCols.map(col) :+ col("q_permille")): _*)
      .agg(max(col("__n")).as("n"),
        min(when(col("__cum") >= col("__rank"), col(keyCol)))
          .as("__picked"))
  }

  /** Robust per-group outlier profile: median, MAD (median absolute
    * deviation), and the count of rows with |v − med| > k·MAD — the
    * data-quality anomaly gauge that, unlike mean/stddev, one corrupt
    * batch cannot drag. Exact integer order statistics end to end
    * (both medians via `rankPick` on value histograms —
    * `percentile_disc` semantics, no doubles anywhere), so the oracle
    * replays it bit-for-bit.
    *
    * `kMilli` is the threshold in permille (3000 = the classic 3×MAD).
    * A zero MAD (over half the group at the median) flags any nonzero
    * deviation — the standard degenerate-case reading.
    *
    * Scale: two shuffles on (group, value) histograms — state is
    * distinct values per group, not rows (doc lengths, latencies and
    * other bounded-domain metrics collapse hard); the median frames
    * are one row per group and broadcast back. For unbounded heavy
    * domains, run the same shape over `bucketCol` lower bounds
    * (≤ 1/32 error) instead of raw values.
    */
  def madOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
      kMilli: Long = 3000L): DataFrame = {
    require(groupCols.nonEmpty, "madOutliers needs group columns")
    val gs = groupCols.map(col)
    val v = col(valueCol).cast(LongType)
    val base = df
      .filter(v.isNotNull && groupCols.map(col(_).isNotNull)
        .reduce(_ && _))
      .select((gs :+ v.as("__v")): _*)
    val vh = base.groupBy((gs :+ col("__v")): _*)
      .agg(count(lit(1)).as("cnt"))
    val med = rankPick(vh, groupCols, "__v", Seq(500))
      .select((gs :+ col("n") :+ col("__picked").as("med")): _*)
    val withMed = base.join(broadcast(med), groupCols)
      .withColumn("__d", abs(col("__v") - col("med")))
    val dh = withMed.groupBy((gs :+ col("__d")): _*)
      .agg(count(lit(1)).as("cnt"))
    val mad = rankPick(dh, groupCols, "__d", Seq(500))
      .select((gs :+ col("__picked").as("mad")): _*)
    withMed.join(broadcast(mad), groupCols)
      .groupBy((gs :+ col("n") :+ col("med") :+ col("mad")): _*)
      .agg(sum(when(col("__d") * 1000L > lit(kMilli) * col("mad"), 1L)
        .otherwise(0L)).as("n_outliers"))
      .select((gs ++ Seq(col("n"), col("med"), col("mad"),
        col("n_outliers"))): _*)
  }

  /** Sketch quantiles with the exact order statistic alongside — the
    * self-audit pattern (CMS/Bloom): `est_` is the scale path (bucket
    * lower bound), `exact_` replays the identical rank machinery on the
    * per-VALUE histogram, and `est ≤ exact < est·(1+1/32) + 1` is the
    * sketch's one-sided guarantee (spec-pinned).
    *
    * The two consumers deliberately re-scan the source rather than
    * share a cached projection: measured at sf0.1, caching was a small
    * net LOSS (the scan is cheaper than the materialization) and would
    * add a caller-releases obligation. At 100 TB the audit path is the
    * optional half — production profiles run `quantileSketch` +
    * `rankPick` alone.
    */
  def quantileReport(df: DataFrame, valueCol: String,
      groupCols: Seq[String], qsPermille: Seq[Int]): DataFrame = {
    val sk = quantileSketch(df, valueCol, groupCols)
    val est = rankPick(sk, groupCols, "qb", qsPermille)
      .withColumn("est_v", repCol("__picked"))
      .drop("__picked")
    val v = col(valueCol).cast(LongType)
    val vals = df.filter(v.isNotNull && v >= 0L)
      .groupBy((groupCols.map(col) :+ v.as("__v")): _*)
      .agg(count(lit(1)).as("cnt"))
    val exact = rankPick(vals, groupCols, "__v", qsPermille)
      .withColumnRenamed("__picked", "exact_v").drop("n")
    est.join(exact, groupCols :+ "q_permille")
      .select((groupCols.map(col) ++ Seq(col("q_permille"), col("n"),
        col("est_v"), col("exact_v"))): _*)
  }
}
