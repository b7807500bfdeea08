package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation: the salted replicated join.
  *
  * When one join key holds a disproportionate share of the big side
  * ("the null key", "the default user", one hot document cluster), a
  * hash join puts that whole key in one task. AQE's skew-join split
  * handles this for sort-merge joins by splitting oversized partitions —
  * prefer it when it applies. The salted join is the explicit fallback
  * for the cases AQE does not cover (skewed keys feeding `cogroup` /
  * `mapGroups` operators, joins under a required distribution, engines
  * or modes without AQE): the big side's rows spread across `buckets`
  * sub-keys via a salt derived from a *non-key* column, and the small
  * side replicates to every salt — the hot key becomes `buckets`
  * evenly-sized tasks at the cost of `buckets`× the small side.
  *
  * The result is row-identical to the unsalted join for any salt
  * assignment (the small side carries every salt value), which is why
  * `saltOn` only needs to vary *within* a key — correctness never
  * depends on the salt distribution, only balance does. Verified by a
  * property test against the plain join and an oracle-backed registry
  * query (`rel_salted_join`).
  */
object Skew {

  /** Inner join of `big` with `small` on `usingKeys`, with the big side
    * salted into `buckets` sub-keys by hashing `saltOn` (a big-side
    * column that varies within a join key — a row id is ideal).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, usingKeys: Seq[String],
      saltOn: Column, buckets: Int = 8): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(saltOn), lit(buckets.toLong)))
    // the small side replicates `buckets`× — keep it the genuinely small
    // side (dimension-sized); the explode is narrow and pipelined
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    bigS.join(smallS, usingKeys :+ "__salt").drop("__salt")
  }

  /** Range (band) join via bucket expansion — the scalable plan for
    * `v >= lo AND v < hi` joins.
    *
    * Spark's native physical choice for a pure inequality join is a
    * nested-loop join: broadcast if one side is small enough, else a
    * cartesian product — O(|probe|·|bands|) comparisons either way, and
    * a cliff when the band table outgrows the broadcast threshold.
    * Bucketizing the value domain turns it into an equi-join: every
    * band replicates to each width-`bucketWidth` bucket it overlaps
    * (a narrow, pipelined explode — bounded by `span/width + 1` rows
    * per band), every probe row maps to exactly ONE bucket, a hash
    * equi-join on the bucket id meets them, and a residual filter
    * restores the exact half-open semantics. Comparisons drop to
    * |probe| × (bands overlapping its bucket), and the join is a plain
    * hash exchange that AQE and skew-split handle like any other —
    * no nested loop at any size (plan-pinned in the spec).
    *
    * Pick `bucketWidth` near the typical band span: much smaller
    * multiplies band replicas, much larger multiplies residual-filter
    * misses per bucket.
    */
  def rangeJoin(probe: DataFrame, valueCol: String, bands: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val v = col(valueCol)
    // empty bands match nothing; dropping them up front also keeps the
    // bucket sequence ascending (Spark's sequence() runs DESCENDING when
    // start > stop — an inverted band would otherwise replicate, not die)
    // upper replica bucket is floor(hi/w), not floor((hi-1)/w): with a
    // fractional domain a band like [19.0, 20.5) at width 20 has matches
    // in bucket 1 that (hi-1)=19.5 would miss. The cost is one dead
    // replica when hi lands exactly on a bucket boundary — the residual
    // filter removes it; missing a bucket would be silent wrong answers.
    val bandB = bands.filter(col(hiCol) > col(loCol))
      .withColumn("__bkt", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val probeB = probe.withColumn("__bkt",
      floor(v / bucketWidth).cast("long"))
    probeB.join(bandB, Seq("__bkt"))
      .filter(v >= col(loCol) && v < col(hiCol))
      .drop("__bkt")
  }
}
