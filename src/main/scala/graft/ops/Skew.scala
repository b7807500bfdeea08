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
}
