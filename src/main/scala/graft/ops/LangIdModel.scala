package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trained language identification — the fastText-style classifier
  * (Joulin et al. 2017; fastText's langid ships as compressed
  * multinomial scoring over character n-gram features) that real
  * curation ladders run instead of marker heuristics: a multinomial
  * Naive Bayes over HASHED CHARACTER TRIGRAMS,
  *
  *   pred(d) = argmax_L [ log P(L) + Σ_{trigram g ∈ d} θ_L[bucket(g)] ],
  *   θ_L[b]  = log ((cnt_L(b) + 1) / (tot_L + dim))     (add-1),
  *
  * trained once (`graft.tools.TrainLangId`), floored to integer MICROS
  * and committed (`data/codebooks/langid_nb.parquet`); inference and
  * the DuckDB oracle both consume the committed integers, so the
  * argmax (ties → language name order) is exact on both engines.
  *
  * Training and evaluation run on the committed multilingual corpus
  * (`data/langid/corpus.parquet`, generated deterministically by
  * `graft.tools.GenLangCorpus`): each language has a genuinely
  * distinct character-level distribution (real function words +
  * per-language syllable morphology), θ trains on the train split
  * only, and the registry query `text_langid_model` predicts the
  * held-out test split — so its green certifies real per-language
  * model quality (per-language accuracy floors pinned in
  * `LangIdModelSpec`), not injected markers.
  *
  * Scale: θ is a dense `|langs| × dim` long array (40 KB at the shipped
  * 5×1024) broadcast once; scoring is one narrow zero-exchange pass
  * fused with the scan (`QualityModel`/`Dsir`/`NgramLm` shape).
  */
object LangIdModel {

  /** Feature buckets per language (hashing trick over char trigrams). */
  val dim = 1024

  /** The closed language set of the corpus, in tie-break order. */
  val langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  val modelPath = s"${Codebooks.defaultDir}/langid_nb.parquet"

  /** The committed multilingual corpus (`GenLangCorpus`): columns
    * (doc_id, lang, split, text); ASCII-only text so the DuckDB
    * trigram-hash mirror is byte-exact. Rooted absolutely (the
    * `Codebooks.defaultDir` pattern) because the oracle SQL bakes this
    * path into `read_parquet(...)` and the gate's DuckDB process runs
    * from an arbitrary cwd; `GRAFT_LANGID_DIR` relocates a checkout
    * that is not at /root/repo.
    */
  val corpusPath: String =
    s"${sys.env.getOrElse("GRAFT_LANGID_DIR", "/root/repo/data/langid")}/corpus.parquet"

  /** Char-trigram feature bucket: the engine-portable 60-bit hash of
    * the 3-char substring, mod `dim` (oracle: `shingleHash60 % 1024`).
    */
  def bucketOf(tri: String): Int = (DedupOps.tokenHash60Jvm(tri) % dim).toInt

  /** All char trigrams of a string (spaces included — the standard
    * char-n-gram featurization); strings shorter than 3 chars have
    * none and score on priors alone.
    */
  def trigrams(s: String): Iterator[String] =
    if (s.length < 3) Iterator.empty
    else (0 to s.length - 3).iterator.map(i => s.substring(i, i + 3))

  /** θ in micros, dense per language, plus log-prior micros. */
  final case class Model(thetaMicro: Map[String, Array[Long]],
      priorMicro: Map[String, Long]) {
    require(thetaMicro.keySet == langs.toSet &&
      priorMicro.keySet == langs.toSet, "model must cover the closed set")
  }

  /** Train from (doc_id, lang, text): per-language trigram-bucket
    * counts, add-1 smoothing, floored micros. Order-free counting;
    * `ln` runs here only.
    */
  def train(docs: Seq[(Long, String, String)]): Model = {
    val cnt = langs.map(_ -> new Array[Long](dim)).toMap
    val tot = scala.collection.mutable.Map(langs.map(_ -> 0L): _*)
    val nDocs = scala.collection.mutable.Map(langs.map(_ -> 0L): _*)
    docs.foreach { case (_, lang, text) =>
      require(langs.contains(lang), s"unknown lang '$lang'")
      nDocs(lang) += 1L
      trigrams(text).foreach { g =>
        cnt(lang)(bucketOf(g)) += 1L
        tot(lang) += 1L
      }
    }
    def cm(p: Double): Long = math.floor(math.log(p) * 1e6).toLong
    val theta = langs.map { l =>
      val t = tot(l)
      l -> Array.tabulate(dim) { b =>
        cm((cnt(l)(b) + 1L).toDouble / (t + dim).toDouble)
      }
    }.toMap
    val n = docs.size.toLong
    require(n > 0L, "langid training needs docs")
    val prior = langs.map { l =>
      // add-1 on the doc counts too: a lang absent from the sample gets
      // a finite (strongly negative) prior instead of -inf
      l -> cm((nDocs(l) + 1L).toDouble / (n + langs.size).toDouble)
    }.toMap
    Model(theta, prior)
  }

  /** Per-language score of one text (prior + Σθ) — the shared scoring
    * core; prediction = argmax with ties to language-name order.
    */
  def scoreText(text: String, m: Model): Seq[(String, Long)] = {
    val counts = new Array[Long](dim)
    trigrams(text).foreach(g => counts(bucketOf(g)) += 1L)
    langs.map { l =>
      val th = m.thetaMicro(l)
      var s = m.priorMicro(l)
      var b = 0
      while (b < dim) {
        if (counts(b) != 0L) s += counts(b) * th(b)
        b += 1
      }
      l -> s
    }
  }

  def predict(text: String, m: Model): String =
    scoreText(text, m).maxBy { case (l, s) => (s, -langs.indexOf(l)) } match {
      case (l, _) => l
    }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang_true", StringType, nullable = true),
    StructField("lang_pred", StringType, nullable = false),
    StructField("correct", BooleanType, nullable = true)))

  /** Distributed prediction over (id, trueLang, text): one narrow
    * broadcast pass, no shuffle; emits the per-doc prediction next to
    * the label for exact accuracy audits downstream.
    */
  def predictDocs(df: DataFrame, idCol: String, langCol: String,
      textCol: String, m: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(m)
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast(LongType), col(langCol), col(textCol))
      .mapPartitions { rows =>
        val model = bc.value
        rows.map { r =>
          val t = if (r.isNullAt(1)) null else r.getString(1)
          val p = predict(r.getString(2), model)
          Row(r.getLong(0), t, p, if (t == null) null else t == p)
        }
      }(Encoders.row(outSchema))
  }

  /** Artifact: (lang, bucket, theta_micro); bucket −1 rows carry the
    * log-priors. One parquet both engines read.
    */
  def writeModel(spark: SparkSession, path: String, m: Model): Unit = {
    val rows = langs.flatMap { l =>
      Row(l, -1L, m.priorMicro(l)) +:
        m.thetaMicro(l).zipWithIndex.map { case (t, b) =>
          Row(l, b.toLong, t)
        }.toSeq
    }
    val schema = StructType(Seq(
      StructField("lang", StringType, nullable = false),
      StructField("bucket", LongType, nullable = false),
      StructField("theta_micro", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): Model = {
    val rows = LocalParquet.collect(spark, path).getOrElse(
      graft.ops.ParquetSchema.read(spark, path).collect())
    val theta = langs.map(_ -> new Array[Long](dim)).toMap
    val prior = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { r =>
      val (l, b, t) = (r.getString(0), r.getLong(1), r.getLong(2))
      if (b == -1L) prior(l) = t else theta(l)(b.toInt) = t
    }
    Model(theta, prior.toMap)
  }
}
