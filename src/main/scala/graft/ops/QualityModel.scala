package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trained document-quality classifier — the fastText-style linear
  * model real pipelines run where heuristics stop: hashed token
  * features (hashing trick, `polyhash(token) mod dim` buckets), integer
  * weights, score = bias + Σ_token w[bucket(token)], label = score > 0.
  *
  * Everything is exact integer arithmetic, so the committed weights
  * parquet (trained by `graft.tools.TrainQualityModel` — fixed seed/
  * order/epochs, reproducible like the ANN codebooks) lets the DuckDB
  * oracle replay inference to the bit: bucket each token with the same
  * polynomial hash, join the weights table, sum.
  *
  * Training is a deterministic integer perceptron on the existing
  * heuristic gate's labels (`TextOps.qualityOk`): the heuristic
  * bootstraps the label set exactly the way real pipelines bootstrap a
  * quality classifier from rules before human labels exist. The token
  * buckets can then generalize beyond the rules (they see vocabulary,
  * not just ratios).
  *
  * Scale: inference is a narrow per-partition pass with the weight
  * array broadcast (dim longs — a few KB), zero shuffles, fused with
  * the scan; training samples a bounded hash-ordered subset
  * (`sampleDocs`, same pattern as `Codebooks.sampleVectors`) so the
  * driver never holds a corpus.
  */
object QualityModel {

  /** Feature dimension (hash buckets). 4096 ≈ fastText's small-bucket
    * regime: collisions exist and are part of the (deterministic,
    * oracle-mirrored) model.
    */
  val dim = 4096

  val weightsPath = s"${Codebooks.defaultDir}/quality_lr.parquet"

  /** Token → feature bucket: the engine-portable polynomial hash mod
    * `dim` (oracle: `poly131(tok) % 4096`; JVM mirror is bit-identical —
    * pinned by `PolyHashSpec`).
    */
  def bucketOf(token: String): Int =
    (DedupOps.polyHashJvm(token, 131L) % dim).toInt

  private def tokensJvm(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)

  /** Integer linear model: `weights(dim)` + bias; score in exact longs. */
  final case class Model(bias: Long, weights: Array[Long]) {
    require(weights.length == dim, s"weights ${weights.length} != $dim")
    def score(text: String): Long = {
      var s = bias
      tokensJvm(text).foreach(t => s += weights(bucketOf(t)))
      s
    }
  }

  /** Deterministic integer perceptron: docs in ascending-id order,
    * `epochs` fixed passes, learning rate 1 (weights stay integral).
    * Mistake-driven updates (`w += y·x` on misclassification, with
    * score==0 counted as negative so the all-zero start updates on
    * positives). No randomness anywhere — identical corpus ⇒ identical
    * committed weights.
    */
  def train(docs: Seq[(Long, String, Boolean)], epochs: Int = 5): Model = {
    val w = new Array[Long](dim)
    var b = 0L
    val ordered = docs.sortBy(_._1)
    var e = 0
    while (e < epochs) {
      ordered.foreach { case (_, text, label) =>
        val toks = tokensJvm(text)
        var s = b
        toks.foreach(t => s += w(bucketOf(t)))
        val predicted = s > 0L
        if (predicted != label) {
          val y = if (label) 1L else -1L
          b += y
          toks.foreach(t => w(bucketOf(t)) += y)
        }
      }
      e += 1
    }
    Model(b, w)
  }

  /** Bounded deterministic training sample: hash-ordered by doc id (the
    * `Codebooks.sampleVectors` pattern), labeled by the heuristic gate.
    */
  def sampleDocs(df: DataFrame, idCol: String, textCol: String,
      sampleSize: Int = 65536): Seq[(Long, String, Boolean)] =
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast(LongType), col(textCol),
        TextOps.qualityOk(col(textCol)).as("__ok"))
      .orderBy(graft.functions.PolyHash.polyHash(
        col(idCol).cast(StringType), 131L), col(idCol))
      .limit(sampleSize)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .toSeq

  /** Deterministic train/held-out split of the bounded sample: ~20% of
    * docs (id-hash mod 5 == 0 under base 257 — INDEPENDENT of the base-
    * 131 hash that ordered the sample, so the held-out set is not a
    * prefix/suffix of training order) are held out. The shipped weights
    * are trained on the train side only, so the held-out metrics
    * (`evaluate`) measure the COMMITTED artifact, not a shadow model —
    * the codebooks' train/test discipline applied to the classifier.
    */
  def holdOut(id: Long): Boolean =
    DedupOps.polyHashJvm(id.toString, 257L) % 5L == 0L

  def splitSample(sample: Seq[(Long, String, Boolean)])
      : (Seq[(Long, String, Boolean)], Seq[(Long, String, Boolean)]) =
    sample.partition { case (id, _, _) => !holdOut(id) }

  /** Accuracy/precision/recall (permille) of `model` against the
    * heuristic labels of `docs` — exact integer metrics.
    */
  final case class Eval(n: Int, accMilli: Long, precMilli: Long,
      recMilli: Long)

  def evaluate(model: Model, docs: Seq[(Long, String, Boolean)]): Eval = {
    var tp = 0L; var fp = 0L; var tn = 0L; var fn = 0L
    docs.foreach { case (_, text, label) =>
      val p = model.score(text) > 0L
      if (p && label) tp += 1
      else if (p && !label) fp += 1
      else if (!p && !label) tn += 1
      else fn += 1
    }
    val n = docs.size
    def milli(num: Long, den: Long) = if (den == 0L) 0L else num * 1000L / den
    Eval(n, milli(tp + tn, n.toLong), milli(tp, tp + fp), milli(tp, tp + fn))
  }

  private val scoreSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("model_score", LongType, nullable = false),
    StructField("model_ok", BooleanType, nullable = false)))

  /** Distributed inference: one narrow pass, weight array broadcast,
    * no shuffle — the filter-shaped deployment (`model_ok` gates the
    * pipeline exactly like `TextOps.qualityOk`, but from the trained
    * weights).
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { r =>
          val s = m.score(r.getString(1))
          Row(r.getLong(0), s, s > 0L)
        }
      }(Encoders.row(scoreSchema))
  }

  /** Weights artifact: one row per bucket with nonzero weight plus the
    * bias at bucket -1 (sparse — the oracle's join treats missing
    * buckets as zero, same as the array).
    */
  def writeWeights(spark: SparkSession, path: String, model: Model): Unit = {
    val rows = Row(-1L, model.bias) +:
      model.weights.zipWithIndex.collect {
        case (wv, i) if wv != 0L => Row(i.toLong, wv)
      }.toSeq
    val schema = StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("weight", LongType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(path)
  }

  def loadWeights(spark: SparkSession, path: String): Model = {
    val rows = LocalParquet.collect(spark, path).getOrElse(
        graft.ops.ParquetSchema.read(spark, path).collect())
      .map(r => (r.getLong(0), r.getLong(1)))
    val w = new Array[Long](dim)
    var b = 0L
    rows.foreach { case (bk, wv) =>
      if (bk == -1L) b = wv else w(bk.toInt) = wv
    }
    Model(b, w)
  }
}
