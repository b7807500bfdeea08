package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard (inverted-index join), MinHash+LSH, SimHash.
  *
  * Scale notes (the design target is ~100 TB of documents on a large
  * cluster):
  *   - Exact dedup is a single hash-shuffle on the text (or a text digest at
  *     scale — swap `text` for `sha2(text, 256)` to shuffle 32-byte keys
  *     instead of documents).
  *   - The Jaccard pair-join is the standard inverted-index self-join on
  *     shingles; ubiquitous shingles explode pair counts, so
  *     `maxShingleFreq` drops the over-frequent ones (a no-op at these test
  *     sizes when set high, a necessity at corpus scale).
  *   - MinHash signatures are computed with map-side partial `min`
  *     aggregation — no per-doc shingle lists are ever materialized; LSH
  *     banding then joins 16-byte band keys, never documents.
  */
object DedupOps {

  /** 3-gram (by default) token shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Exact duplicate mapping: every doc → the minimum doc-id holding its
    * exact text (`keep_id`), plus the duplicate-group size. One shuffle.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(textCol))
    df.select(
      col(idCol),
      min(col(idCol)).over(w).as("keep_id"),
      count(lit(1)).over(w).as("group_cnt"))
  }

  /** Deterministic polynomial hash of a string (base `base`, mod 1e9+7 —
    * products stay below 2^40, so ANSI-mode overflow can never trip).
    */
  def polyHash(s: Column, base: Long = 131L): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast(LongType)),
      lit(0L),
      (acc, c) => (acc * base + c) % 1000000007L)

  /** Two independent 30-bit polynomial hashes combined into a ~60-bit
    * token hash (bit-spread for SimHash/MinHash without long overflow).
    */
  def tokenHash60(s: Column): Column =
    polyHash(s, 131L) + polyHash(s, 257L) * 1073741824L // << 30

  /** Exploded (id, shingle) inverted index, distinct per doc. The shingle
    * *string* is the join key — collision-free, and the shuffle key is a
    * short n-gram, not the document.
    */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    df.select(col(idCol), explode(shingles(col(textCol), n)).as("sh"))

  /** All pairs with n-gram Jaccard similarity ≥ simMilli/1000, via the
    * inverted-index self-join. Output is integer-only:
    * (id1, id2, inter, uni) with inter/uni the shingle-set overlap/union.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, simMilli: Int = 500,
      maxShingleFreq: Long = Long.MaxValue): DataFrame = {
    val idx = shingleIndex(df, idCol, textCol, n)
    val filtered =
      if (maxShingleFreq == Long.MaxValue) idx
      else {
        import org.apache.spark.sql.expressions.Window
        idx.withColumn("freq", count(lit(1)).over(
          Window.partitionBy(col("sh"))))
          .filter(col("freq") <= maxShingleFreq).drop("freq")
      }
    val counts = filtered.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sh"))
    val a = filtered.select(col(idCol).as("id1"), col("sh"))
    val b = filtered.select(col(idCol).as("id2"), col("sh"))
    val inter = a.join(b, "sh")
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col(idCol).as("id1"), col("n_sh").as("n1")), "id1")
      .join(counts.select(col(idCol).as("id2"), col("n_sh").as("n2")), "id2")
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .filter(col("inter") * 1000 >= col("uni") * simMilli)
      .select(col("id1"), col("id2"), col("inter"), col("uni"))
  }

  /** MinHash parameters: k independent hash functions over shingle hashes,
    * arranged as `bands` bands of `rows` rows (k = bands * rows).
    * Coefficients are fixed pseudo-random odd constants (deterministic).
    */
  final case class MinHashParams(bands: Int = 16, rows: Int = 4,
      seed: Long = 42L) {
    val k: Int = bands * rows
    private val p = 2305843009213693951L // 2^61 - 1
    /** Deterministic (a, b) per hash function via splitmix64-style mixing. */
    def coeffs: IndexedSeq[(Long, Long)] = (0 until k).map { i =>
      var z = seed + 0x9E3779B97F4A7C15L * (i + 1)
      def mix(): Long = {
        z += 0x9E3779B97F4A7C15L
        var x = z
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        x ^ (x >>> 31)
      }
      val a = (mix() & Long.MaxValue) % (p - 1) + 1
      val b = (mix() & Long.MaxValue) % p
      (a, b)
    }
    def perm(i: Int, h: Column): Column = {
      val (a, b) = coeffs(i)
      // (a*h + b) mod p without overflow: values < 2^61, products overflow —
      // use multiplyExact-free modular trick via BigDecimal? Keep it simple
      // and exact: reduce h first, then combine in unsigned 128-bit via
      // two-step Russian-peasant on the column is overkill — instead use
      // (a mod 2^31)*(h mod 2^31) ranges: constrain a,b < 2^31 so a*h fits
      // in 63 bits after reducing h to < 2^31.
      ((h % 2147483647L) * (a % 2147483647L) + b) % 2305843009213693951L
    }
  }

  /** Per-doc MinHash signature: one `min` per hash function, computed by
    * partial aggregation over the exploded shingle index (k agg columns,
    * map-side combined — no shingle lists in memory).
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      params: MinHashParams = MinHashParams(), n: Int = 3): DataFrame = {
    val idx = shingleIndex(df, idCol, textCol, n)
      .select(col(idCol), tokenHash60(col("sh")).as("h"))
    val aggs = (0 until params.k).map(i =>
      min(params.perm(i, col("h"))).as(s"mh_$i"))
    idx.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: docs sharing any band bucket. Output
    * (id1, id2, est_milli) with est = fraction of equal signature
    * components × 1000.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      params: MinHashParams = MinHashParams(), n: Int = 3): DataFrame = {
    val sigs = minHashSignatures(df, idCol, textCol, params, n).cache()
    val bandKeys = (0 until params.bands).map { b =>
      val cols = (0 until params.rows).map(r => col(s"mh_${b * params.rows + r}"))
      struct(lit(b).as("band"), hash(cols: _*).as("bucket"))
    }
    val exploded = sigs.select(col(idCol),
      explode(array(bandKeys: _*)).as("bk"))
      .select(col(idCol), col("bk.band"), col("bk.bucket"))
      .distinct()
    val cand = exploded.select(col("band"), col("bucket"),
        col(idCol).as("id1"))
      .join(exploded.select(col("band"), col("bucket"), col(idCol).as("id2")),
        Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val sigEq = (0 until params.k).map(i =>
      when(col(s"l.mh_$i") === col(s"r.mh_$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigs.as("l"), col("id1") === col(s"l.$idCol"))
      .join(sigs.as("r"), col("id2") === col(s"r.$idCol"))
      .select(col("id1"), col("id2"),
        ((sigEq * 1000) / params.k).cast(LongType).as("est_milli"))
  }

  /** 64-bit SimHash over token hashes: per bit, the sign of the ±1 sum
    * across tokens. Computed by explode + 64 partial sums (no token lists
    * in executor memory).
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col(idCol), tokenHash60(col("tok")).as("th"))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("th"), b) % 2 === 1, 1).otherwise(-1))
        .as(s"bit_$b"))
    val sums = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val hashCol = (0 until 64).map(b =>
      when(col(s"bit_$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce(_.bitwiseOR(_))
    sums.select(col(idCol), hashCol.as("simhash"))
  }

  /** Near-duplicate pairs by SimHash: hamming distance ≤ maxHamming, found
    * via 4×16-bit band join (any pair within distance 3 shares at least one
    * exact 16-bit band by pigeonhole).
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simHash(df, idCol, textCol).cache()
    val banded = sh.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)
            .as("bucket"))): _*)).as("bk"))
      .select(col(idCol), col("simhash"), col("bk.band"), col("bk.bucket"))
    banded.select(col("band"), col("bucket"), col(idCol).as("id1"),
        col("simhash").as("h1"))
      .join(banded.select(col("band"), col("bucket"), col(idCol).as("id2"),
        col("simhash").as("h2")), Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast(LongType)
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
