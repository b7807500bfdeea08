package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
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
  * The synthetic fixture text is LANGUAGE-UNIFORM (the same vocabulary
  * regardless of the `lang` label), so on the raw text there is nothing
  * for any classifier to learn. The registry query therefore enriches
  * each doc deterministically with per-language marker words scaled by
  * `1 + doc_id % 3` — the `text_pii_scrub` pattern: inject the signal
  * the fixture lacks so the green is non-vacuous by construction, and
  * replay the identical enrichment in SQL. What the oracle certifies is
  * the MACHINERY: training determinism, the committed artifact, the
  * broadcast integer scoring, and the argmax tie discipline.
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
    val rows = spark.read.parquet(path).collect()
    val theta = langs.map(_ -> new Array[Long](dim)).toMap
    val prior = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { r =>
      val (l, b, t) = (r.getString(0), r.getLong(1), r.getLong(2))
      if (b == -1L) prior(l) = t else theta(l)(b.toInt) = t
    }
    Model(theta, prior.toMap)
  }

  /** The deterministic marker enrichment (see the object doc): text
    * plus `1 + doc_id % 3` copies of the language's marker phrase —
    * identical `Column` and SQL forms.
    */
  val markerPhrase: Map[String, String] = Map(
    "de" -> "und nicht aber",
    "en" -> "thee thou hath",
    "es" -> "pero como muy",
    "fr" -> "avec pour dans",
    "zh" -> "de5 shi4 zai4")

  def enrichedCol(textCol: Column, langCol: Column, idCol: Column): Column = {
    val phrase = langs.reverse.foldLeft(lit("")) { case (other, l) =>
      when(langCol === lit(l), lit(" " + markerPhrase(l))).otherwise(other)
    }
    concat(textCol, repeat(phrase, (lit(1) + pmod(idCol, lit(3))).cast("int")))
  }

  /** JVM mirror of `enrichedCol`/`enrichedSql` for the trainer and
    * specs (unknown langs pass through unenriched, like the SQL ELSE).
    */
  def enrichedJvm(text: String, lang: String, id: Long): String = {
    val phrase = markerPhrase.get(lang).map(" " + _).getOrElse("")
    text + phrase * (1 + (id % 3L)).toInt
  }

  val enrichedSql: String = {
    val cases = langs.map { l =>
      s"WHEN lang = '$l' THEN ' ${markerPhrase(l)}'"
    }.mkString(" ")
    s"text || repeat(CASE $cases ELSE '' END, CAST(1 + doc_id % 3 AS INTEGER))"
  }
}
