package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select raw-corpus documents whose hashed n-gram distribution looks
  * like a target corpus. Per document, the log importance weight is
  *
  *   log w(x) = Σ_{bigram g ∈ x} λ[bucket(g)],
  *   λ[b] = log p̂_target(b) − log p̂_raw(b)   (add-1 smoothed),
  *
  * a bag-of-hashed-bigrams log-likelihood ratio. The λ table is trained
  * ONCE by `graft.tools.TrainDsir` on a bounded deterministic sample
  * (target = the heuristic quality gate's clean side — the same
  * rule-bootstrap `QualityModel` uses before human labels exist),
  * floored to integer MICROS, and committed as a parquet artifact. All
  * transcendental math (the two `ln`s) happens train-side only; shipped
  * inference is exact integer sums the DuckDB oracle replays to the bit
  * (`data/codebooks/dsir_bigram.parquet` is read by both engines).
  *
  * Scale: inference is a narrow per-partition pass with the λ array
  * broadcast (`dim` longs, a few KB) — zero shuffles, fused with the
  * scan, identical in shape to `QualityModel.scoreDocs`. Selection is
  * a deterministic top-k (`TakeOrderedAndProject`: per-partition heaps,
  * k rows per partition on the exchange) — the argmax variant of the
  * paper's Gumbel-top-k resampling, with the (score, id) tiebreak
  * making it reproducible across partitionings.
  */
object Dsir {

  /** Hash buckets for bigram features (the paper's hashing trick; 10k
    * buckets there, 4096 here to match the quality model's regime —
    * collisions are part of the deterministic, oracle-mirrored model).
    */
  val dim = 4096

  val weightsPath = s"${Codebooks.defaultDir}/dsir_bigram.parquet"

  /** Bigram → feature bucket: the engine-portable 60-bit span hash mod
    * `dim` (oracle: `shingleHash60 % 4096`).
    */
  def bucketOf(span: String): Int = (DedupOps.tokenHash60Jvm(span) % dim).toInt

  /** λ table in integer micros, dense over all `dim` buckets. */
  final case class Weights(lambdaMicro: Array[Long]) {
    require(lambdaMicro.length == dim, s"dim ${lambdaMicro.length} != $dim")
  }

  /** Train the λ table from labeled docs: raw counts over ALL docs,
    * target counts over label-true docs, add-1 smoothing, micros floor.
    * Deterministic given the sample (counting is order-free; `ln` runs
    * here and never again).
    */
  def train(docs: Seq[(Long, String, Boolean)]): Weights = {
    val raw = new Array[Long](dim)
    val tgt = new Array[Long](dim)
    var nRaw = 0L
    var nTgt = 0L
    docs.foreach { case (_, text, label) =>
      DedupOps.spansJvm(text, 2).foreach { g =>
        val b = bucketOf(g)
        raw(b) += 1L
        nRaw += 1L
        if (label) { tgt(b) += 1L; nTgt += 1L }
      }
    }
    val lam = new Array[Long](dim)
    var b = 0
    while (b < dim) {
      val lt = math.log((tgt(b) + 1L).toDouble / (nTgt + dim).toDouble)
      val lr = math.log((raw(b) + 1L).toDouble / (nRaw + dim).toDouble)
      lam(b) = math.floor((lt - lr) * 1e6).toLong
      b += 1
    }
    Weights(lam)
  }

  /** (n_grams, Σλ micros) of one text — the single scoring core shared
    * by distributed inference and the train tool's separation report.
    */
  def scoreText(text: String, w: Weights): (Long, Long) = {
    val spans = DedupOps.spansJvm(text, 2)
    var s = 0L
    spans.foreach(g => s += w.lambdaMicro(bucketOf(g)))
    (spans.length.toLong, s)
  }

  /** Length-normalized score: the FLOORED per-gram mean λ. The raw sum
    * is the paper's log importance weight, but it confounds length with
    * distribution match (most λ are negative, so longer docs sum lower
    * regardless of content); the per-gram mean is the length-free
    * ranking signal. Floor division specifically — Spark's `DIV`
    * truncates toward zero while DuckDB's `//` floors, so the mirrors
    * only agree on negative scores via the explicit pmod formulation.
    */
  def perGram(sum: Long, n: Long): Long = Math.floorDiv(sum, n)

  private val scoreSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("dsir_micro", LongType, nullable = false),
    StructField("dsir_pg_micro", LongType, nullable = false)))

  /** Distributed scoring: one narrow pass, λ broadcast, no shuffle.
    * Bigrams are occurrence-counted (the paper's bag-of-ngrams), via
    * the same tokenize/slide core as the fluency/contamination ops —
    * docs shorter than 2 tokens contribute their whole text as one
    * span, exactly like the SQL mirror's CASE.
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
      weights: Weights): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(weights)
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        val lam = bc.value.lambdaMicro
        val w = Weights(lam)
        rows.map { r =>
          val (n, s) = scoreText(r.getString(1), w)
          Row(r.getLong(0), n, s, perGram(s, n))
        }
      }(Encoders.row(scoreSchema))
  }

  /** Deterministic top-k selection by (per-gram score DESC, id ASC)
    * with the selection rank — `TakeOrderedAndProject` at scale (never
    * a global sort). The rank column makes the output a reproducible
    * ordered manifest, not just a set.
    */
  def selectTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = scored.orderBy(col("dsir_pg_micro").desc, col("doc_id"))
      .limit(k)
    top.withColumn("rnk", row_number().over(
      Window.orderBy(col("dsir_pg_micro").desc, col("doc_id"))))
  }

  /** Dense artifact: one row per bucket (4096 rows — tiny, committed). */
  def writeWeights(spark: SparkSession, path: String, w: Weights): Unit = {
    val rows = w.lambdaMicro.zipWithIndex.map {
      case (l, b) => Row(b.toLong, l)
    }.toSeq
    val schema = StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("lambda_micro", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(path)
  }

  def loadWeights(spark: SparkSession, path: String): Weights = {
    val lam = new Array[Long](dim)
    LocalParquet.collect(spark, path).getOrElse(
      graft.ops.ParquetSchema.read(spark, path).collect()).foreach { r =>
      lam(r.getLong(0).toInt) = r.getLong(1)
    }
    Weights(lam)
  }
}
