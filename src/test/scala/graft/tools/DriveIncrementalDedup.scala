package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-dedup throughput probe: build the persisted MinHash band
  * index over a synthetic multi-million-doc corpus ONCE, then match
  * daily-batch-sized increments against it — the ratio between the two
  * is the operator's reason to exist (the ad-hoc LSH join pays the
  * corpus scan on every run; the index amortizes it). Records for
  * SCALE.md: index build docs/s, index bytes vs corpus text bytes, and
  * per-batch match docs/s.
  *
  * Corpus: same deterministic generator family as `DriveCurationScale`
  * (60–259-token docs, 50k vocab, square skew); each batch doc has a 5%
  * chance of being an exact copy of a corpus doc (matches must find
  * these) and is otherwise fresh text.
  *
  * Usage: DriveIncrementalDedup [threads] [nCorpus] [nBatch]
  */
object DriveIncrementalDedup {

  private def synthDocs(spark: SparkSession, n: Long, idOffset: Long,
      copyEvery: Option[(Int, Long)]) = {
    val base0 = spark.range(n).toDF("i")
      .withColumn("doc_id", col("i") + idOffset)
    val withBase = copyEvery match {
      case Some((k, corpusSize)) =>
        // every k-th batch doc copies corpus doc hash(i) % corpusSize —
        // modulus by the INDEXED corpus size, so every planted copy
        // targets an indexed doc on every day (a modulus by idOffset
        // would point most later-day copies at un-indexed prior batches
        // and silently understate recall)
        base0.withColumn("base_id",
          when(pmod(col("i"), lit(k)) === 0L, pmod(col("i") * 2654435761L,
            lit(corpusSize))).otherwise(col("doc_id")))
      case None => base0.withColumn("base_id", col("doc_id"))
    }
    withBase
      // 60-259 tokens ≈ 0.4-1.8 KB — web-document-shaped, so the
      // index-bytes-vs-text-bytes ratio is measured against realistic
      // density, not the fixture's tweet-sized docs
      .withColumn("len",
        (pmod(hash(col("base_id") * 17 + 7), lit(200)) + 60).cast("int"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), col("len")), t =>
          concat(lit("w"), pmod(
            hash(col("base_id") * 31 + t).cast("long") *
              hash(col("base_id") * 31 + t).cast("long"),
            lit(50000L))))))
      .select("doc_id", "text")
  }

  private def dirBytes(p: java.nio.file.Path): Long = {
    val s = java.nio.file.Files.walk(p)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32")
    val nCorpus = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val nBatch = args.drop(2).headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"INC_DEDUP_SCALE corpus=$nCorpus batch=$nBatch " +
      s"threads=$threads " +
      s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")

    val corpus = synthDocs(spark, nCorpus, 0L, None)
    val idxDir = java.nio.file.Files.createTempDirectory("incdedup_scale")
    val corpusBytes = corpus.select(sum(length(col("text"))))
      .collect()(0).getLong(0)

    var t0 = System.nanoTime()
    graft.ops.IncrementalDedup.writeIndex(corpus, "doc_id", "text",
      idxDir.toString, maxBucketSize = 256L)
    val buildS = (System.nanoTime() - t0) / 1e9
    val idxBytes = dirBytes(idxDir)
    println(f"INDEX_BUILD docs/s=${nCorpus / buildS}%.0f " +
      f"secs=$buildS%.1f index_bytes=$idxBytes " +
      f"corpus_text_bytes=$corpusBytes " +
      f"ratio=${idxBytes.toDouble / corpusBytes}%.3f")

    for (day <- 1 to 3) {
      val batch = synthDocs(spark, nBatch, nCorpus * day, Some((20, nCorpus)))
      t0 = System.nanoTime()
      // the per-op cache lease releases exactly matchBatch's two plan
      // caches once this day's result is consumed — the long-lived
      // driver pattern (a global clearCache here would clobber
      // unrelated caches in a shared session)
      val lease = new graft.ops.CacheLease
      try {
        val matches = graft.ops.IncrementalDedup.matchBatch(
          batch, "doc_id", "text", idxDir.toString, lease = Some(lease))
        val nPairs = matches.count()
        val exact = matches.filter(col("est_milli") === 1000L).count()
        val matchS = (System.nanoTime() - t0) / 1e9
        println(f"BATCH_MATCH day=$day docs/s=${nBatch / matchS}%.0f " +
          f"secs=$matchS%.1f pairs=$nPairs exact_pairs=$exact")
      } finally lease.close()
    }

    // LSM maintenance at scale: append each day's batch (accepted-batch
    // contract: ids are disjoint by construction), gauge saturation,
    // compact, re-gauge. Compaction touches ONLY the 12-byte band rows
    // — one shuffle, independent of corpus text size — which is the
    // point being measured.
    t0 = System.nanoTime()
    for (day <- 1 to 3) {
      val batch = synthDocs(spark, nBatch, nCorpus * day, Some((20, nCorpus)))
      graft.ops.IncrementalDedup.appendBatch(batch, "doc_id", "text",
        idxDir.toString, maxBucketSize = 256L)
    }
    val appendS = (System.nanoTime() - t0) / 1e9
    def gauge(): (Long, Long, Long) = {
      val r = graft.ops.IncrementalDedup
        .bucketSaturation(spark, idxDir.toString, 256L)
        .agg(sum("over_cap"), sum("n_rows"), max("max_bucket"))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val (overB, rowsB, maxB) = gauge()
    println(f"INDEX_APPEND days=3 docs=${3 * nBatch} secs=$appendS%.1f " +
      f"docs/s=${3 * nBatch / appendS}%.0f band_rows=$rowsB " +
      f"over_cap_buckets=$overB max_bucket=$maxB")
    t0 = System.nanoTime()
    graft.ops.IncrementalDedup.compactIndex(spark, idxDir.toString, 256L)
    val compactS = (System.nanoTime() - t0) / 1e9
    val (overA, rowsA, maxA) = gauge()
    println(f"INDEX_COMPACT secs=$compactS%.1f " +
      f"band_rows/s=${rowsB / compactS}%.0f rows=$rowsB->$rowsA " +
      f"over_cap=$overB->$overA max_bucket=$maxB->$maxA")
    spark.stop()
  }
}
