package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic k-means training for the ANN quantizers (IVF coarse
  * centroids, PQ sub-space codebooks) — the "train offline, apply online"
  * shape of a production ANN index build.
  *
  * Determinism contract (everything the DuckDB oracle needs): training runs
  * on a *bounded, hash-ordered sample* of the corpus (`ORDER BY
  * xxhash64(id, seed), id LIMIT sampleSize` — deterministic regardless of
  * partitioning), and Lloyd's iterations run single-threaded on the driver
  * with a fixed iteration count, fixed init (first `k` distinct sample
  * vectors in hash order), and fixed summation order — so the trained
  * centroids are a pure function of (corpus, params, seed). The centroids
  * are written to parquet as `array<double>`; both Spark and DuckDB read
  * those IEEE doubles back bit-exactly, so the oracle reproduces
  * *assignment and scoring from the table* without re-running training.
  *
  * Scale: the driver-side collect is bounded by `sampleSize` (default 64k
  * vectors ≈ 32 MB at dim 64) — sample-train-broadcast is how faiss-style
  * indexes train at corpus scale; assignment/encoding stays a narrow
  * distributed pass in `Similarity`.
  */
object Codebooks {

  /** Repo-committed codebook artifacts (trained by
    * `graft.tools.TrainCodebooks` on the sf0.01 corpus — reproducible,
    * see that tool). Queries load them; oracle SQL `read_parquet`s them,
    * so the location is resolved ONCE at class init and baked into both
    * sides consistently. `GRAFT_CODEBOOK_DIR` relocates a checkout that
    * is not rooted at /root/repo.
    */
  val defaultDir: String =
    sys.env.getOrElse("GRAFT_CODEBOOK_DIR", "/root/repo/data/codebooks")
  val coarsePath = s"$defaultDir/coarse16.parquet"
  val pqPath = s"$defaultDir/pq_m32_k256.parquet"
  val pqResPath = s"$defaultDir/pqres_m32_k256.parquet"

  /** Committed build-once/query-many IVFPQ index (built by
    * `graft.tools.BuildIvfPqIndex` from the sf0.01 corpus with the
    * committed coarse16 + pq_m32_k256 quantizers, flat codes): the
    * `__cell=<id>/` parquet layout `Similarity.writeIvfPqIndex` emits,
    * so a query's scan partition-prunes to its probes' cells. This is
    * the 100 TB read path — encode once, prune at the FILE level per
    * query batch.
    */
  val ivfPqIndexRoot = s"$defaultDir/ivfpq_index_sf"

  /** The index for the corpus at `dataDir` — per-scale-factor like the
    * dedup index (`dedupIndexPathFor`): the quantizers stay the frozen
    * sf0.01-trained artifacts (train once, encode any corpus — the
    * realistic deployment shape), but the ENCODED CORPUS matches the
    * replay scale, so `knn_ivfpq_index_top5` queries each sf's vectors
    * against an index of the same population. sf0.001 shares sf0.01's
    * (identical embeddings table); unknown dirs fall back to sf0.01.
    */
  def ivfPqIndexPathFor(dataDir: String): String = {
    val tag = new java.io.File(dataDir).getName match {
      case "sf0.1" => "sf0.1"
      case _       => "sf0.01"
    }
    s"$ivfPqIndexRoot/sf=$tag"
  }

  /** Committed build-once/match-many MinHash dedup indexes, ONE PER
    * SCALE FACTOR (built by `graft.tools.BuildDedupIndex` from each
    * sf's documents corpus, doc_id % 10 != 0, cap 64): under
    * `sf=<tag>/` lives a `bands/` + `sigs/` pair in the
    * `IncrementalDedup.writeIndex` layout. The steady-state registry
    * rows (`dedup_incremental`, `pipeline_ingest_day*`,
    * `dedup_index_gauge`) match their batch against the index of THE
    * SAME corpus they draw the batch from — a single sf0.01 index made
    * the sf0.1 rows near-vacuous (1 candidate pair instead of a
    * realistic same-corpus match, round-10 advice) — so the bench
    * prices the daily match at every replay scale; never an in-query
    * `writeIndex`. The oracle `read_parquet`s the whole root with
    * hive partitioning and selects the `sf=` partition by corpus size
    * (`Queries.incrementalOracleCtes`), certifying the bytes on disk.
    */
  val dedupIndexRoot = s"$defaultDir/dedup_minhash_index_sf"

  /** The index for the corpus at `dataDir`, selected by the dir's sf
    * tag. sf0.001 maps to the sf0.01 index: the two dirs ship the SAME
    * 500-document table, so they share one index (and the oracle's
    * corpus-size dispatch agrees). Unknown dirs fall back to sf0.01.
    */
  def dedupIndexPathFor(dataDir: String): String = {
    val tag = new java.io.File(dataDir).getName match {
      case "sf0.1" => "sf0.1"
      case _       => "sf0.01"
    }
    s"$dedupIndexRoot/sf=$tag"
  }

  /** Bounded deterministic sample: hash-ordered (id-salted with `seed`),
    * so any `sampleSize`-prefix is a uniform pseudo-random draw that does
    * not depend on partitioning or row order.
    */
  private[ops] def sampleVectors(df: DataFrame, idCol: String,
      vecCol: String, sampleSize: Int, seed: Long)
      : Array[Array[Float]] = {
    df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("v"))
      .filter(col("id").isNotNull && col("v").isNotNull)
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(sampleSize)
      .collect()
      .map(r => Similarity.toFloatArray(r.getSeq[Float](1)))
  }

  /** First `k` pairwise-distinct vectors in sample order — k-means init. */
  private def initDistinct(sample: Array[Array[Float]], k: Int,
      sub: Array[Float] => Array[Double]): Array[Array[Double]] = {
    val out = Array.newBuilder[Array[Double]]
    var n = 0
    val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
    var i = 0
    while (i < sample.length && n < k) {
      val v = sub(sample(i))
      if (seen.add(v.toSeq)) { out += v; n += 1 }
      i += 1
    }
    // degenerate corpus (fewer distinct vectors than k): train with what
    // exists — callers get a smaller codebook, which stays well-defined
    out.result()
  }

  /** Spherical k-means (cosine assignment, mean update) for the IVF coarse
    * quantizer. Fixed `iters` Lloyd's rounds; empty clusters keep their
    * previous centroid; ties assign to the smaller centroid index.
    */
  def trainCoarse(df: DataFrame, idCol: String, vecCol: String, nlist: Int,
      iters: Int = 25, seed: Long = 42L, sampleSize: Int = 65536)
      : Array[Array[Double]] = {
    val sample = sampleVectors(df, idCol, vecCol, sampleSize, seed)
    require(sample.nonEmpty, "empty corpus")
    val xs = sample.map(Similarity.toDoubles)
    var cents = initDistinct(sample, nlist, f => Similarity.toDoubles(f))
    val dim = xs(0).length
    val norms = xs.map(x => math.sqrt(dot(x, x)))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      val cnorms = cents.map(c => math.sqrt(dot(c, c)))
      var i = 0
      while (i < xs.length) {
        val x = xs(i)
        var best = 0
        var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < cents.length) {
          val d = dot(x, cents(c))
          val sim =
            if (norms(i) == 0.0 || cnorms(c) == 0.0) Double.NegativeInfinity
            else d / (norms(i) * cnorms(c))
          if (sim > bestSim) { bestSim = sim; best = c }
          c += 1
        }
        val s = sums(best)
        var d0 = 0
        while (d0 < dim) { s(d0) += x(d0); d0 += 1 }
        counts(best) += 1
        i += 1
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0L) cents(c)
        else {
          val s = sums(c)
          Array.tabulate(dim)(d0 => s(d0) / counts(c))
        }
      }
      it += 1
    }
    cents
  }

  /** Per-subspace L2 Lloyd's for PQ codebooks. `residualOf` trains on the
    * residual `x − coarse(x)` (cosine assignment to the given coarse
    * centroids first) — the faiss `by_residual` accuracy step.
    */
  def trainPq(df: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, iters: Int = 25, seed: Long = 42L, sampleSize: Int = 65536,
      residualOf: Option[Array[Array[Double]]] = None)
      : Array[Array[Array[Double]]] = {
    val sample = sampleVectors(df, idCol, vecCol, sampleSize, seed)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // full vectors (as doubles), residual-shifted when training residuals
    val xs: Array[Array[Double]] = residualOf match {
      case None => sample.map(Similarity.toDoubles)
      case Some(cents) => sample.map { f =>
        val cell = Similarity.assignCosine(f, cents)
        val x = Similarity.toDoubles(f)
        val c = cents(cell)
        Array.tabulate(dim)(d => x(d) - c(d))
      }
    }
    Array.tabulate(m) { j =>
      val subOf = (x: Array[Double]) =>
        Array.tabulate(subDim)(d => x(j * subDim + d))
      // init: first ksub distinct subvectors of the (possibly
      // residual-shifted) training points, in sample order
      var words = {
        val out = Array.newBuilder[Array[Double]]
        val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
        var n = 0
        var i = 0
        while (i < xs.length && n < ksub) {
          val v = subOf(xs(i))
          if (seen.add(v.toSeq)) { out += v; n += 1 }
          i += 1
        }
        out.result()
      }
      var it = 0
      while (it < iters) {
        val sums = Array.fill(words.length)(new Array[Double](subDim))
        val counts = new Array[Long](words.length)
        var i = 0
        while (i < xs.length) {
          val x = xs(i)
          var best = 0
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < words.length) {
            val w = words(c)
            var d2 = 0.0
            var d0 = 0
            while (d0 < subDim) {
              val diff = x(j * subDim + d0) - w(d0)
              d2 += diff * diff
              d0 += 1
            }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          val s = sums(best)
          var d0 = 0
          while (d0 < subDim) { s(d0) += x(j * subDim + d0); d0 += 1 }
          counts(best) += 1
          i += 1
        }
        words = Array.tabulate(words.length) { c =>
          if (counts(c) == 0L) words(c)
          else Array.tabulate(subDim)(d0 => sums(c)(d0) / counts(c))
        }
        it += 1
      }
      words
    }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var d = 0
    while (d < a.length) { s += a(d) * b(d); d += 1 }
    s
  }

  // ---- parquet round trip (cw BIGINT, w array<double>) -------------------

  def writeCoarse(spark: SparkSession, path: String,
      cents: Array[Array[Double]]): Unit = {
    val rows = cents.zipWithIndex.map { case (w, i) =>
      org.apache.spark.sql.Row(i.toLong, w.toSeq)
    }
    val schema = StructType(Seq(
      StructField("cw", LongType, nullable = false),
      StructField("w", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadCoarse(spark: SparkSession, path: String): Array[Array[Double]] =
    LocalParquet.collect(spark, path)
      .map(_.sortBy(_.getLong(0)))
      .getOrElse(
        graft.ops.ParquetSchema.read(spark, path).orderBy("cw").collect())
      .map(_.getSeq[Double](1).toArray)

  def writePq(spark: SparkSession, path: String,
      cb: Array[Array[Array[Double]]]): Unit = {
    val rows = for {
      (words, j) <- cb.zipWithIndex
      (w, c) <- words.zipWithIndex
    } yield org.apache.spark.sql.Row(j.toLong, c.toLong, w.toSeq)
    val schema = StructType(Seq(
      StructField("j", LongType, nullable = false),
      StructField("cw", LongType, nullable = false),
      StructField("w", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPq(spark: SparkSession, path: String)
      : Array[Array[Array[Double]]] = {
    val rows = LocalParquet.collect(spark, path).getOrElse(
      graft.ops.ParquetSchema.read(spark, path).orderBy("j", "cw").collect())
    rows.groupBy(_.getLong(0)).toArray.sortBy(_._1).map { case (_, rs) =>
      rs.sortBy(_.getLong(1)).map(_.getSeq[Double](2).toArray)
    }
  }
}
