package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Curation-ops throughput probe at synthetic-corpus scale: the
  * dedup/scrub/pack/quota/quality ladder over millions of generated
  * documents, far beyond the sf0.1 fixture (15 k docs). Verifies the
  * designs hold when compute dominates scheduling — no valve trips, no
  * task-memory blowup — and records rows/s for SCALE.md (the ANN ladder
  * has `DriveAnnScale`; this is its text-side sibling).
  *
  * Corpus: deterministic hash-generated docs of 10–57 tokens drawn from
  * a 50k-word vocabulary with zipf-ish skew, 1% exact duplicates of
  * earlier docs and 2% boilerplate-stuffed docs (a shared 16-token
  * passage), across 37 sources × 8 langs — enough structure that every
  * op does real work (dups found, passages scrubbed, quotas trimmed).
  *
  * Usage: DriveCurationScale [threads] [nDocs] [stageSubstr]
  * (stageSubstr: run only stages whose name contains it — memory/perf
  * iteration on one stage without paying for the ladder)
  */
object DriveCurationScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(5000000L)
    val only = args.drop(2).headOption
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"CURATION_SCALE n=$n threads=$threads " +
      s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")

    // deterministic synthetic corpus: token t of doc i = word
    // hash(i, t) % 50k with square skew (popular words more popular);
    // doc length 10 + hash%48; 1% of docs copy doc i-100's text exactly;
    // 2% embed the fixed boilerplate passage
    val boiler = (0 until 16).map(j => s"bp$j").mkString(" ")
    val docs = spark.range(n).toDF("doc_id")
      .withColumn("src_id", pmod(hash(col("doc_id") * 7 + 1), lit(37)))
      .withColumn("lang", concat(lit("l"),
        pmod(hash(col("doc_id") * 11 + 3), lit(8))))
      .withColumn("source", concat(lit("s"), col("src_id")))
      .withColumn("base_id",
        when(pmod(hash(col("doc_id") * 13 + 5), lit(100)) === 0L &&
          col("doc_id") >= 100L, col("doc_id") - 100L)
          .otherwise(col("doc_id")))
      .withColumn("len", (pmod(hash(col("base_id") * 17 + 7), lit(48)) + 10)
        .cast("int"))
      .withColumn("body", concat_ws(" ",
        transform(sequence(lit(1), col("len")), t =>
          concat(lit("w"), pmod(
            hash(col("base_id") * 31 + t).cast("long") *
              hash(col("base_id") * 31 + t).cast("long"),
            lit(50000L))))))
      .withColumn("text",
        when(pmod(hash(col("base_id") * 19 + 11), lit(50)) === 0L,
          concat(col("body"), lit(" " + boiler)))
          .otherwise(col("body")))
      .select("doc_id", "lang", "source", "text")
      .cache()
    val total = docs.count() // materialize outside timings
    println(s"CURATION_CORPUS rows=$total")

    // consume EVERY output column (count() alone lets Catalyst prune the
    // expensive window/agg columns right out of narrow ops — measured
    // 10x-too-good numbers before this): one pass computing both the row
    // count and a full-width checksum
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      val r = df.select(count(lit(1)).as("n"),
        sum(hash(struct(df.columns.map(col): _*)).cast("long")).as("ck"))
        .head()
      r.getLong(0)
    }

    def timed(name: String)(f: => Long): Unit = {
      if (!only.forall(name.contains(_))) return
      spark.sparkContext.setJobGroup(name, name)
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CUR_$name rows=$rows sec=$sec%.1f " +
        f"docs_per_sec=${(n / sec).toLong}")
      // release op-internal caches between stages so each measures alone
      // (but keep the corpus itself hot)
      spark.catalog.clearCache()
      docs.cache().count()
    }

    timed("EXACT_DEDUP") {
      force(graft.ops.DedupOps.exactDedup(docs, "doc_id", "text"))
    }
    timed("MINHASH_LSH") {
      graft.ops.DedupOps.minHashLshPairs(docs, "doc_id", "text",
        graft.ops.DedupOps.MinHashParams(bands = 8, rows = 4), n = 5,
        maxBucketSize = 2048).count()
    }
    timed("SIMHASH") {
      graft.ops.DedupOps.simHashPairs(docs, "doc_id", "text",
        maxHamming = 3, maxBucketSize = 2048).count()
    }
    timed("SCRUB_COVER") {
      force(graft.ops.Contamination.scrubDupPassages(docs, "doc_id",
        "text", n = 8, minDocs = 2))
    }
    timed("SCRUB_MAXIMAL") {
      force(graft.ops.Contamination.scrubDupPassagesMaximal(docs, "doc_id",
        "text", n = 8, minDocs = 2, minRepeatLen = 16))
    }
    timed("QUALITY_MODEL") {
      val m = graft.ops.QualityModel.loadWeights(spark,
        graft.ops.QualityModel.weightsPath)
      force(graft.ops.QualityModel.scoreDocs(docs, "doc_id", "text", m))
    }
    timed("DSIR_SCORE") {
      val w = graft.ops.Dsir.loadWeights(spark, graft.ops.Dsir.weightsPath)
      force(graft.ops.Dsir.scoreDocs(docs, "doc_id", "text", w))
    }
    timed("BPE_TOKENS") {
      val m = graft.ops.Bpe.loadMerges(spark, graft.ops.Bpe.mergesPath)
      force(graft.ops.Bpe.tokenStats(docs, "doc_id", "text", m))
    }
    timed("TEMPERATURE_QUOTA") {
      force(graft.ops.Sampling.temperatureQuotaSample(
        docs.select("doc_id", "lang"), "doc_id", "lang", n / 16))
    }
    timed("QUOTA_REBALANCE") {
      force(graft.ops.Sampling.quotaSample(
        docs.select("doc_id", "lang"), "doc_id", "lang",
        Map.empty, n / 16))
    }
    timed("PACK_STRATIFIED") {
      force(graft.ops.Packing.packByBudget(docs, "doc_id", "text",
        Seq("lang", "source"), 2048L))
    }
    timed("PACK_SHUFFLED") {
      force(graft.ops.Packing.packShuffled(docs, "doc_id", "text",
        Seq("lang", "source"), 2048L, seed = 7L))
    }
    timed("PACK_GLOBAL") {
      force(graft.ops.Packing.packGlobalByBudget(docs, "doc_id", "text",
        2048L))
    }
    spark.stop()
  }
}
