package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N-gram language-model perplexity filter — the CCNet-style quality
  * gate (Wenzek et al. 2020 train a LM on a clean reference corpus,
  * score every crawled doc, and keep the low-perplexity head/middle
  * of the distribution). The LM is a stupid-backoff bigram model
  * (Brants et al. 2007 — no discounting, a fixed backoff factor α,
  * which is exactly what makes it shard-parallel trainable at corpus
  * scale):
  *
  *   S(w_i | w_{i-1}) = cnt(w_{i-1} w_i) / cnt(w_{i-1})   if seen,
  *                      α · cnt(w_i) / N                  else,
  *   with α = 0.4; the first token and OOV tokens score on the
  *   unigram / an OOV floor 1/(N+1).
  *
  * Per doc the engine reports Σ −ln S in integer MICROS (`nll_micro`)
  * and the floored per-token mean (`nll_pt_micro`) — the monotone
  * stand-in for perplexity (ppl = exp(nll/n); `exp` would leave the
  * integer-exact regime and adds nothing to a rank-based gate).
  *
  * All transcendental math (`ln`) runs train-side ONLY
  * (`graft.tools.TrainNgramLm`): the committed artifact
  * (`data/codebooks/lm_bigram.parquet`) holds floored-micro costs per
  * 60-bit token/bigram hash plus the α / OOV / tercile constants, and
  * both the shipped inference and the DuckDB oracle consume those same
  * integers — a hash-table lookup sum, exact to the bit.
  *
  * Scale: the bigram table is count-capped (`maxBigrams`, the standard
  * pruned-LM deployment shape), so inference broadcasts two bounded
  * hash maps and runs as one narrow zero-shuffle pass fused with the
  * scan — `QualityModel.scoreDocs` / `Dsir.scoreDocs` shape. Training
  * is bag-of-counts (order-free, mergeable) on a bounded sample.
  */
object NgramLm {

  val alpha = 0.4
  /** Pruned-LM cap: keep the `maxBigrams` most frequent bigrams
    * (count desc, hash asc — deterministic under ties).
    */
  val maxBigrams = 65536

  val modelPath = s"${Codebooks.defaultDir}/lm_bigram.parquet"

  /** Meta-row codes in the committed artifact (kind = 'meta'). */
  val MetaAlpha = 0L
  val MetaOov = 1L
  val MetaT1 = 2L
  val MetaT2 = 3L

  final case class Model(
      uniCostMicro: Map[Long, Long],
      biCostMicro: Map[Long, Long],
      alphaMicro: Long,
      oovMicro: Long,
      t1Micro: Long,
      t2Micro: Long)

  private def h60(s: String): Long = DedupOps.tokenHash60Jvm(s)

  private def toksOf(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)

  /** Train on the TARGET (clean) side of the labeled sample — the CCNet
    * reference-corpus role. Counts are order-free; `ln` runs here and
    * never again. Tercile cuts come from the per-token scores of the
    * FULL train sample (clean + junk — the population the gate will
    * bucket), computed with the finished model.
    */
  def train(docs: Seq[(Long, String, Boolean)]): Model = {
    val uniCnt = scala.collection.mutable.Map.empty[String, Long]
    val biCnt = scala.collection.mutable.Map.empty[String, Long]
    var n = 0L
    docs.foreach { case (_, text, label) =>
      if (label) {
        val toks = toksOf(text)
        toks.foreach { t => uniCnt(t) = uniCnt.getOrElse(t, 0L) + 1L; n += 1L }
        var i = 1
        while (i < toks.length) {
          val b = toks(i - 1) + " " + toks(i)
          biCnt(b) = biCnt.getOrElse(b, 0L) + 1L
          i += 1
        }
      }
    }
    require(n > 0L, "ngram-lm training needs at least one target token")
    def costMicro(p: Double): Long = math.floor(-math.log(p) * 1e6).toLong
    val uni = uniCnt.map { case (w, c) =>
      h60(w) -> costMicro(c.toDouble / n.toDouble)
    }.toMap
    val biAll = biCnt.toSeq.map { case (b, c) =>
      val Array(w1, _) = b.split(" ", 2)
      (h60(b), c, costMicro(c.toDouble / uniCnt(w1).toDouble))
    }
    val bi = biAll.sortBy { case (h, c, _) => (-c, h) }
      .take(maxBigrams).map { case (h, _, cost) => h -> cost }.toMap
    val partial = Model(uni, bi,
      alphaMicro = costMicro(alpha),
      oovMicro = costMicro(1.0 / (n.toDouble + 1.0)),
      t1Micro = 0L, t2Micro = 0L)
    // tercile cut points over the train population's per-token scores
    // (sorted-index floor at 1/3 and 2/3 — the CCNet head/middle/tail)
    val pts = docs.flatMap { case (_, text, _) =>
      val (nTok, _, nll) = scoreText(text, partial)
      if (nTok > 0L) Some(Math.floorDiv(nll, nTok)) else None
    }.sorted
    require(pts.nonEmpty, "ngram-lm tercile fit needs scored docs")
    val t1 = pts((pts.size - 1) / 3)
    val t2 = pts(2 * (pts.size - 1) / 3)
    partial.copy(t1Micro = t1, t2Micro = t2)
  }

  /** (n_tokens, n_oov, nll_micro) of one text — the single scoring core
    * shared by distributed inference, the trainer's tercile fit, and
    * the spec's naive mirror.
    */
  def scoreText(text: String, m: Model): (Long, Long, Long) = {
    val toks = toksOf(text)
    var nll = 0L
    var oov = 0L
    var i = 0
    while (i < toks.length) {
      val uh = h60(toks(i))
      val uc = m.uniCostMicro.get(uh)
      if (uc.isEmpty) oov += 1L
      val uniCost = uc.getOrElse(m.oovMicro)
      if (i == 0) nll += uniCost
      else {
        m.biCostMicro.get(h60(toks(i - 1) + " " + toks(i))) match {
          case Some(bc) => nll += bc
          case None => nll += m.alphaMicro + uniCost
        }
      }
      i += 1
    }
    (toks.length.toLong, oov, nll)
  }

  /** Distributed scoring: one narrow pass, both cost maps broadcast
    * (bounded: |V| + `maxBigrams` entries), no shuffle. Zero-token
    * docs are dropped (no positions to score — mirrored by the
    * oracle's inner unnest). `nll ≥ 0` always (every cost is −ln of a
    * probability ≤ 1), so the per-token mean needs no signed-floor
    * gymnastics. `passthrough` columns ride along through the narrow
    * pass (the gate carries `lang` without a join-back shuffle).
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
      m: Model, passthrough: Seq[String] = Nil): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(m)
    val src = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select((col(idCol).cast(LongType) +: col(textCol) +:
        passthrough.map(col)): _*)
    val schema = StructType(
      StructField("doc_id", LongType, nullable = false) +:
        (passthrough.map(c => src.schema(c)) ++ Seq(
          StructField("n_tokens", LongType, nullable = false),
          StructField("n_oov", LongType, nullable = false),
          StructField("nll_micro", LongType, nullable = false),
          StructField("nll_pt_micro", LongType, nullable = false))))
    val nPass = passthrough.length
    src.mapPartitions { rows =>
      val model = bc.value
      rows.flatMap { r =>
        val (n, oov, nll) = scoreText(r.getString(1), model)
        if (n == 0L) None
        else Some(Row.fromSeq(
          r.getLong(0) +: ((2 until 2 + nPass).map(r.get) ++
            Seq(n, oov, nll, Math.floorDiv(nll, n)))))
      }
    }(Encoders.row(schema))
  }

  /** The CCNet gate: bucket per-token scores by the COMMITTED tercile
    * cuts — `head` (≤ t1), `middle` (≤ t2), `tail` — and keep
    * head+middle. Zero-exchange: the cuts are two committed longs.
    */
  def perplexityGate(scored: DataFrame, m: Model): DataFrame =
    scored
      .withColumn("ppl_bucket",
        when(col("nll_pt_micro") <= lit(m.t1Micro), lit("head"))
          .when(col("nll_pt_micro") <= lit(m.t2Micro), lit("middle"))
          .otherwise(lit("tail")))
      .withColumn("keep", col("ppl_bucket") =!= lit("tail"))

  /** Artifact: kind ('uni'|'bi'|'meta'), h (60-bit hash, or meta code),
    * cost_micro. One parquet both engines read.
    */
  def writeModel(spark: SparkSession, path: String, m: Model): Unit = {
    val rows =
      m.uniCostMicro.toSeq.sorted.map { case (h, c) => Row("uni", h, c) } ++
        m.biCostMicro.toSeq.sorted.map { case (h, c) => Row("bi", h, c) } ++
        Seq(Row("meta", MetaAlpha, m.alphaMicro),
          Row("meta", MetaOov, m.oovMicro),
          Row("meta", MetaT1, m.t1Micro),
          Row("meta", MetaT2, m.t2Micro))
    val schema = StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("h", LongType, nullable = false),
      StructField("cost_micro", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): Model = {
    val rows = LocalParquet.collect(spark, path).getOrElse(
      graft.ops.ParquetSchema.read(spark, path).collect())
    val uni = Map.newBuilder[Long, Long]
    val bi = Map.newBuilder[Long, Long]
    val meta = scala.collection.mutable.Map.empty[Long, Long]
    rows.foreach { r =>
      val (h, c) = (r.getLong(1), r.getLong(2))
      r.getString(0) match {
        case "uni" => uni += h -> c
        case "bi" => bi += h -> c
        case "meta" => meta(h) = c
        case k => sys.error(s"unknown lm artifact kind '$k'")
      }
    }
    Model(uni.result(), bi.result(),
      meta(MetaAlpha), meta(MetaOov), meta(MetaT1), meta(MetaT2))
  }
}
