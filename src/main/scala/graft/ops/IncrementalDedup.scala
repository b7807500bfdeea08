package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental near-duplicate detection against a PERSISTED MinHash band
  * index — the "daily batch vs 100 TB corpus" path.
  *
  * The ad-hoc LSH join (`DedupOps.minHashLshPairs`) re-reads and
  * re-shingles the whole corpus on every run; at 100 TB the text scan is
  * the entire cost. This operator pays it once: `writeIndex` persists the
  * corpus's band keys (`bands/`, 20-ish bytes a row, partitioned by band)
  * and signatures (`sigs/`, k longs a row) as parquet — together a
  * low-single-digit percent of the text size — and each incoming batch is
  * then matched by shingling ONLY the batch and joining its band keys
  * against the index:
  *
  *   - the candidate join shuffles (band, bucket, id) triples, never text
  *     or signatures;
  *   - signatures are fetched candidate-bounded (a join keyed by the
  *     candidates' ids, broadcast while small under AQE), so the
  *     agreement estimate never rescans the index's sig table;
  *   - the hot-bucket valve (`DedupOps.capBuckets`) is applied at WRITE
  *     time — the index never contains a degenerate bucket, so a batch
  *     bucket of size b joins at most `b * maxBucketSize` candidates.
  *
  * `appendBatch` grows the index with an accepted batch (parquet append,
  * no rewrite). The bucket cap is enforced per write in that case — a
  * bucket can exceed the cap ACROSS appends; re-run `writeIndex` to
  * re-compact when the drop gauge says saturation is material, exactly
  * like any LSM-ish index maintenance.
  */
object IncrementalDedup {

  import DedupOps.{MinHashParams, minHashSignatures, bucketKeyJvm, capBuckets}

  private val bandSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false)))

  /** (id, band, bucket) band keys of every doc — one tight JVM pass over
    * the signatures; per doc the band keys are distinct by construction.
    */
  private def explodeBands(sigs: DataFrame, params: MinHashParams)
      : DataFrame = {
    val bands = params.bands
    val rows_ = params.rows
    sigs.mapPartitions { rs =>
      rs.flatMap { r =>
        val id = r.getLong(0)
        val mhs = r.getSeq[Long](1)
        (0 until bands).iterator.map(b =>
          Row(id, b, bucketKeyJvm(mhs, b * rows_, (b + 1) * rows_)))
      }
    }(Encoders.row(bandSchema))
  }

  /** Build the persisted index at `path`: `bands/` (id, band, bucket;
    * disk-partitioned by band) and `sigs/` (id, mhs). Buckets larger than
    * `maxBucketSize` are dropped from `bands/` (their docs keep their
    * signatures — they are findable via their other bands).
    */
  def writeIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, params: MinHashParams = MinHashParams(), n: Int = 3,
      maxBucketSize: Long = Long.MaxValue): Unit = {
    val sigs = minHashSignatures(corpus, idCol, textCol, params, n)
      .withColumnRenamed(idCol, "id").cache()
    try {
      sigs.write.mode("overwrite").parquet(s"$path/sigs")
      capBuckets(explodeBands(sigs, params), maxBucketSize, None)
        .write.partitionBy("band").mode("overwrite").parquet(s"$path/bands")
    } finally sigs.unpersist()
  }

  /** Append an accepted batch to the index (no rewrite; see the cap
    * caveat in the object doc).
    */
  def appendBatch(batch: DataFrame, idCol: String, textCol: String,
      path: String, params: MinHashParams = MinHashParams(), n: Int = 3,
      maxBucketSize: Long = Long.MaxValue): Unit = {
    val sigs = minHashSignatures(batch, idCol, textCol, params, n)
      .withColumnRenamed(idCol, "id").cache()
    try {
      sigs.write.mode("append").parquet(s"$path/sigs")
      capBuckets(explodeBands(sigs, params), maxBucketSize, None)
        .write.partitionBy("band").mode("append").parquet(s"$path/bands")
    } finally sigs.unpersist()
  }

  /** Match a new batch against the persisted index WITHOUT touching
    * corpus text: shingle the batch, join band keys, estimate similarity
    * from signature agreement. Output `(new_id, dup_of, est_milli)` —
    * every (batch doc, index doc) pair sharing a band bucket, with est =
    * fraction of equal signature components × 1000.
    *
    * Also works on a STREAMING `batch` frame (the ingestion-time gate —
    * see `streaming.StreamingDedup.nearDupStream`): every stage is a
    * narrow map or a stream-static join, and the pair dedup is
    * `dropDuplicates` — in that mode its state is one row per emitted
    * pair (the output set itself), the only state the operator keeps.
    */
  def matchBatch(batch: DataFrame, idCol: String, textCol: String,
      path: String, params: MinHashParams = MinHashParams(), n: Int = 3)
      : DataFrame = {
    val spark = batch.sparkSession
    val k = params.k
    // cache: the signature pass feeds both the band explode and the
    // estimate join; persist is illegal on a streaming frame (each
    // micro-batch is small — recompute is the right trade there)
    val sigs0 = minHashSignatures(batch, idCol, textCol, params, n)
      .withColumnRenamed(idCol, "new_id")
    val newSigs = if (batch.isStreaming) sigs0 else sigs0.cache()
    val newBands = explodeBands(newSigs.withColumnRenamed("new_id", "id"),
      params)
    // partition-column `band` reads back as int; bucket is the join key
    // that matters. The index side projects 3 narrow columns — parquet
    // reads no signature bytes here. Explicit schema: a fully-saturated
    // cap can leave `bands/` with zero data files, which must read as an
    // empty frame, not an inference error.
    val idxBands = spark.read
      .schema(StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("bucket", LongType, nullable = false),
        StructField("band", IntegerType, nullable = false))))
      .parquet(s"$path/bands")
      .select(col("id").as("dup_of"), col("band").cast(IntegerType),
        col("bucket"))
    val idxSigs = spark.read.parquet(s"$path/sigs")
      .select(col("id").as("dup_of"), col("mhs").as("m2"))
    val estSchema = StructType(Seq(
      StructField("new_id", LongType, nullable = false),
      StructField("dup_of", LongType, nullable = false),
      StructField("est_milli", LongType, nullable = false)))
    def estRows(paired: DataFrame): DataFrame = paired
      .mapPartitions { rs =>
        rs.map { r =>
          val m1 = r.getSeq[Long](2); val m2 = r.getSeq[Long](3)
          var eq = 0; var i = 0
          while (i < k) { if (m1(i) == m2(i)) eq += 1; i += 1 }
          Row(r.getLong(0), r.getLong(1), eq.toLong * 1000L / k)
        }
      }(Encoders.row(estSchema))
    if (batch.isStreaming) {
      // STREAM plan: every join must be stream-static (a join back to
      // `newSigs` would be a stream-stream self-join whose buffered
      // candidate state re-emits old pairs when a duplicate doc id
      // arrives), so the signature rides along the exploded band rows
      // (k longs × bands per doc — fine per micro-batch) and ONE
      // stateful dropDuplicates at the end is the only state.
      val sigBandSchema = StructType(Seq(
        StructField("new_id", LongType, nullable = false),
        StructField("band", IntegerType, nullable = false),
        StructField("bucket", LongType, nullable = false),
        StructField("m1", ArrayType(LongType, containsNull = false),
          nullable = false)))
      val bands = params.bands
      val rows_ = params.rows
      val sigBands = newSigs.mapPartitions { rs =>
        rs.flatMap { r =>
          val id = r.getLong(0)
          val mhs = r.getSeq[Long](1)
          (0 until bands).iterator.map(b =>
            Row(id, b, bucketKeyJvm(mhs, b * rows_, (b + 1) * rows_), mhs))
        }
      }(Encoders.row(sigBandSchema))
      estRows(sigBands
        .join(idxBands, Seq("band", "bucket"))
        .join(idxSigs, "dup_of")
        .select(col("new_id"), col("dup_of"), col("m1"), col("m2")))
        .dropDuplicates(Seq("new_id", "dup_of"))
    } else {
      // BATCH plan: candidate-bounded signature fetch — band rows stay
      // 20-ish bytes and signatures are only joined for surviving pairs.
      val cand = newBands.select(col("band"), col("bucket"),
          col("id").as("new_id"))
        .join(idxBands, Seq("band", "bucket"))
        .select("new_id", "dup_of").distinct()
      estRows(cand
        .join(newSigs.select(col("new_id"), col("mhs").as("m1")), "new_id")
        .join(idxSigs, "dup_of")
        .select(col("new_id"), col("dup_of"), col("m1"), col("m2")))
    }
  }
}
