package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Engine-portable sketches for corpus-scale profiling.
  *
  * Unlike HLL (`approx_count_distinct`), whose register layout is
  * engine-specific, the KMV (k-minimum-values) estimator is pure integer
  * order statistics over a deterministic hash — every engine that can
  * sort and limit reproduces it bit-for-bit, so the DuckDB oracle checks
  * the estimate *exactly*. At scale the k smallest values aggregate
  * per-partition (Spark's TakeOrderedAndProject) — the shuffle carries k
  * rows per partition, never the distinct set.
  */
object Sketches {

  /** Deterministic estimator hash: the *product* of the two polynomial
    * hashes mod 1e9+7 (codegen'd native expressions; product < 2^60, no
    * overflow in either engine). The additive 60-bit concatenation
    * clusters badly on shared-prefix tokens (consecutive suffixes give
    * consecutive hashes — order statistics break); the product spreads
    * prefix families quadratically mod p — measured 0.2% error at
    * n=5000, k=256 versus 8× overestimation of kth_min for the additive
    * form.
    */
  def estimatorHash(c: Column): Column =
    (graft.functions.PolyHash.polyHash(c, 131L) *
      graft.functions.PolyHash.polyHash(c, 257L)) % 1000000007L

  /** Hash-value range for the estimator (the mod). */
  val hashRange: Double = 1000000007.0

  /** KMV distinct-count estimate over a string column: one row
    * `(k_used, kth_min, est_distinct)` with
    * `est = floor((k-1) · RANGE / kth_min)` (double math, fixed order —
    * oracle-exact). `k_used < k` means fewer distinct values than k, in
    * which case `est` is that exact count.
    */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int = 256): DataFrame = {
    val hashed = df.select(estimatorHash(col(valueCol)).as("h"))
    val preSchema = StructType(Seq(StructField("h", LongType,
      nullable = false)))
    // Per-partition distinct k-min pre-pass: each of the global k smallest
    // distinct hashes is among its own partition's k smallest distinct
    // hashes, so emitting every partition's local k-min set (a bounded
    // TreeSet — dedup and order in one structure) is lossless while the
    // exchange under the final distinct/limit carries ≤ k·partitions rows,
    // never the corpus's full distinct hash set. Nulls (hash of a null
    // value) are skipped — the estimator is over present values.
    val pre = hashed.mapPartitions { rows =>
      val set = new java.util.TreeSet[java.lang.Long]()
      rows.foreach { r =>
        if (!r.isNullAt(0)) {
          val h = r.getLong(0)
          if (set.size < k) set.add(h)
          else if (h < set.last && set.add(h)) set.pollLast()
        }
      }
      import scala.jdk.CollectionConverters._
      set.iterator.asScala.map(h => Row(h.longValue))
    }(Encoders.row(preSchema))
    val mins = pre.distinct().orderBy(col("h")).limit(k)
    mins.agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_min"))
      .select(col("k_used"), col("kth_min"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(floor((col("k_used") - 1).cast("double") *
            (lit(hashRange) / col("kth_min").cast("double"))).cast(LongType))
          .as("est_distinct"))
  }

  // ===================== Count-Min sketch =====================

  /** Row-`r` probe position of a Count-Min sketch of `width` buckets:
    * double hashing over the two codegen'd polynomial hashes,
    * `(h131 + r·h257) mod width` — pure integer math both engines
    * reproduce exactly (each term < 2^32, the sum < 2^35).
    */
  def cmsPos(c: Column, r: Int, width: Int): Column =
    (graft.functions.PolyHash.polyHash(c, 131L) +
      lit(r.toLong) * graft.functions.PolyHash.polyHash(c, 257L)) % width

  /** The Count-Min sketch of a value column as a DataFrame: one row per
    * occupied `(r, pos)` cell with its occurrence count — `depth × width`
    * integer counters estimating the frequency of ANY value with
    * one-sided error (`est ≥ true`, overestimate ≤ 2N/width with
    * probability 1 − 2^−depth).
    *
    * This representation is the point at 100 TB: the sketch is an
    * aggregation (`explode(depth positions) → groupBy(r,pos) → count`),
    * so partial aggregation runs map-side and the shuffle carries at
    * most `depth·width` rows per partition regardless of corpus size;
    * sketches of corpus shards MERGE by summing `cnt` cell-wise (union
    * the frames, re-aggregate) — the cross-day/cross-shard profiling
    * use KMV cannot serve (KMV only merges by re-ranking mins; CMS
    * answers per-item frequency).
    */
  def cmsSketch(df: DataFrame, valueCol: String, width: Int = 1024,
      depth: Int = 4): DataFrame = {
    require(width >= 2 && depth >= 1, s"width=$width depth=$depth")
    df.select(col(valueCol).as("v")).filter(col("v").isNotNull)
      .select(posexplode(array(
        (0 until depth).map(r => cmsPos(col("v"), r, width)): _*))
        .as(Seq("r", "pos")))
      .groupBy(col("r"), col("pos")).agg(count(lit(1)).as("cnt"))
  }

  /** Top-`k` values by Count-Min estimate, with the exact count
    * alongside (the `est ≥ exact` one-sided-error invariant is the
    * audit column, mirroring `bloomContaminationReport`). The sketch
    * (≤ `depth·width` rows) is broadcast; candidates probe it with a
    * map-side join. Ordered `(n_est DESC, value ASC)` so the limit is
    * deterministic under ties.
    */
  def cmsTopK(df: DataFrame, valueCol: String, k: Int = 20,
      width: Int = 1024, depth: Int = 4): DataFrame = {
    val vals = df.select(col(valueCol).as("token"))
      .filter(col("token").isNotNull)
    val sketch = cmsSketch(df, valueCol, width, depth)
    val exact = vals.groupBy(col("token"))
      .agg(count(lit(1)).as("n_exact"))
    // every probed cell exists (the candidate itself incremented it), so
    // the inner join yields exactly `depth` rows per candidate
    val probes = exact.select(col("token"), col("n_exact"),
      posexplode(array(
        (0 until depth).map(r => cmsPos(col("token"), r, width)): _*))
        .as(Seq("r", "pos")))
    probes.join(broadcast(sketch), Seq("r", "pos"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("cnt")).as("n_est"))
      .select(col("token"), col("n_est"), col("n_exact"))
      .orderBy(col("n_est").desc, col("token").asc)
      .limit(k)
  }
}
