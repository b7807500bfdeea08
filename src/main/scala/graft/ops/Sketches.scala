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

  // ===================== HyperLogLog =====================

  /** Default HLL register count. 256 keeps the raw estimator in its
    * accurate regime (n ≳ 2.5·m) from sf0.01 up — the small-range
    * linear-counting correction needs `ln`, which the fixed-point
    * schedule deliberately excludes, so the register count must be
    * sized to the cardinality floor rather than corrected at runtime.
    */
  val hllM = 256

  /** ρ cap: trailing-zero runs longer than 23 all land in the top
    * register value — identical clamping in both engines, negligible
    * estimator effect (2^-23 of probes), and it bounds every term of
    * the fixed-point denominator.
    */
  val hllRhoCap = 24

  /** Fixed-point scale: the harmonic denominator is Σ 2^(K−ρ_j) — with
    * K=30 and ρ ≤ 24 each term ≤ 2^30 and the m-term sum ≤ 2^40.
    */
  val hllK = 30

  /** α_m (0.7213/(1+1.079/m)) in micros — the bias constant as a fixed
    * rational so the estimate stays in integer arithmetic.
    */
  def hllAlphaMicro(m: Int): Long = m match {
    case 256  => 718273L
    case 1024 => 720541L
    case _ => throw new IllegalArgumentException(
      s"no α constant for m=$m (supported: 256, 1024)")
  }

  /** ρ(h) = (trailing zeros of h) + 1, capped — a CASE chain over
    * constant power-of-two moduli (no shifts, no floats; dialect-free:
    * Spark and DuckDB parse the identical text).
    */
  def hllRhoSql(h: String): String = {
    val branches = (hllRhoCap - 1 to 1 by -1).map { k =>
      s"WHEN $h % ${1L << k} = 0 THEN ${k + 1}"
    }
    s"(CASE ${branches.mkString(" ")} ELSE 1 END)"
  }

  /** Dense HLL registers of a value column: bucket = h131 mod m,
    * ρ from the PRODUCT hash's trailing zeros, register = max ρ (0 for
    * never-hit buckets — the left join against `range(m)` makes absence
    * explicit so shard sketches MERGE by cell-wise max).
    *
    * ρ must come from `estimatorHash` (the product mod p), NOT from a
    * single polynomial hash: 257 ≡ 1 (mod 2^8), so `poly257(s) mod 2^k`
    * collapses to the character sum mod 2^k for strings too short to
    * wrap the modulus — trailing zeros are structurally capped near 5
    * and the estimator reads 20× low. The product wraps p for any key,
    * so its low bits are uniform (same reasoning as the KMV hash).
    *
    * At scale this is the classic fixed-size distinct profile: the
    * groupBy carries at most m rows per partition after map-side
    * partial max, regardless of corpus size — where exact
    * count(DISTINCT) shuffles every distinct value.
    */
  /** The sparse register aggregation alone — a plain groupBy/max, so it
    * also runs UNCHANGED as a Structured Streaming aggregation (complete
    * mode): the stream's running registers equal the batch sketch of
    * everything seen (`StreamingSketchSpec`). `hllSketch` densifies it;
    * streams skip the densify join (stream-agg → static join is not a
    * supported streaming shape) and densify at read time.
    */
  def hllRegistersSparse(df: DataFrame, valueCol: String,
      m: Int = hllM): DataFrame =
    df.select(col(valueCol).as("v")).filter(col("v").isNotNull)
      .select(
        (graft.functions.PolyHash.polyHash(col("v"), 131L) % m)
          .as("bucket"),
        estimatorHash(col("v")).as("__h2"))
      .withColumn("rho", expr(hllRhoSql("__h2")).cast(LongType))
      .groupBy(col("bucket")).agg(max(col("rho")).as("r"))

  def hllSketch(df: DataFrame, valueCol: String,
      m: Int = hllM): DataFrame = {
    val spark = df.sparkSession
    val regs = hllRegistersSparse(df, valueCol, m)
    spark.range(m).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("r"), lit(0)).cast(LongType)
        .as("r"))
  }

  /** GROUPED HLL: distinct-count profile per group key, from SPARSE
    * registers only — the never-hit registers' denominator mass is
    * `(m − occupied)·2^K`, added arithmetically instead of densifying
    * with a per-group range join (which would cost groups × m rows and
    * a join; this is one aggregation tree end to end). Same fixed-point
    * estimator as `hllReport`, exact distinct as the audit column.
    *
    * At scale this is the per-slice cardinality profile (distinct
    * users per type/day/source): state is ≤ m registers per group
    * after map-side partial max, vs `count(DISTINCT)`'s full
    * per-group value shuffle.
    */
  def hllReportBy(df: DataFrame, valueCol: String, groupCols: Seq[String],
      m: Int = hllM): DataFrame = {
    require(groupCols.nonEmpty, "hllReportBy needs group columns")
    val gs = groupCols.map(col)
    val regs = df.filter(col(valueCol).isNotNull)
      .select((gs :+ col(valueCol).as("v")): _*)
      .select((gs :+
        (graft.functions.PolyHash.polyHash(col("v"), 131L) % m)
          .as("bucket") :+
        estimatorHash(col("v")).as("__h2")): _*)
      .withColumn("rho", expr(hllRhoSql("__h2")).cast(LongType))
      .groupBy((gs :+ col("bucket")): _*).agg(max(col("rho")).as("r"))
    val denom = regs
      .select((gs :+ expr(
        s"shiftleft(CAST(1 AS BIGINT), $hllK - CAST(r AS INT))")
        .as("t")): _*)
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("__occ"), sum(col("t")).cast(LongType)
        .as("__st"))
      .withColumn("__dd", expr(
        s"(${m}L - __occ) * ${1L << hllK}L + __st"))
    val exact = df.filter(col(valueCol).isNotNull)
      .groupBy(gs: _*).agg(countDistinct(col(valueCol)).as("n_exact"))
    denom.join(exact, groupCols)
      .select((gs :+
        expr(s"((${m.toLong * m * (1L << hllK)} DIV __dd) * " +
          s"${hllAlphaMicro(m)}) DIV 1000000").cast(LongType)
          .as("hll_est") :+
        col("n_exact")): _*)
  }

  /** One-row HLL report with the exact distinct count alongside (the
    * self-audit column, as in `cmsTopK`/`bloomContaminationReport`).
    * The estimate is the raw HLL harmonic estimator in pure fixed-point
    * integer math — `((m²·2^K div Σ2^(K−ρ)) · α_micro) div 10^6` — a
    * deterministic schedule both engines replay exactly (no `ln`, no
    * doubles; the small-range linear-counting correction is deliberately
    * omitted to keep the estimator transcendental-free, which is why the
    * audit column matters).
    */
  def hllReport(df: DataFrame, valueCol: String,
      m: Int = hllM): DataFrame = {
    val denom = hllSketch(df, valueCol, m)
      .select(expr(
        s"shiftleft(CAST(1 AS BIGINT), $hllK - CAST(r AS INT))").as("t"))
      .agg(sum(col("t")).cast(LongType).as("dd"))
    val exact = df.select(col(valueCol).as("v")).filter(col("v").isNotNull)
      .agg(countDistinct(col("v")).as("n_exact"))
    denom.crossJoin(exact)
      .select(lit(m.toLong).as("m"),
        expr(s"((${m.toLong * m * (1L << hllK)} DIV dd) * " +
          s"${hllAlphaMicro(m)}) DIV 1000000").cast(LongType)
          .as("hll_est"),
        col("n_exact"))
  }
}
