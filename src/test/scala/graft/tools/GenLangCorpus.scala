package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.ops.LangIdModel

/** Generates the committed multilingual language-ID corpus
  * (`data/langid/corpus.parquet`) — fully deterministic (seeded LCG,
  * ASCII-only text so the DuckDB `ascii()` trigram-hash mirror is
  * byte-exact), so re-running this tool reproduces the committed
  * values and `LangIdCorpusSpec` pins the committed parquet against
  * regeneration.
  *
  *   Test/runMain graft.tools.GenLangCorpus
  *
  * Unlike the driver's fixture `documents` table (whose text is
  * language-uniform — the `lang` label carries no textual signal),
  * each language here has a genuinely distinct character-level
  * distribution, built the way the languages themselves differ:
  *  - a closed set of 10 high-frequency FUNCTION WORDS per language
  *    (real ones: de "und/der/nicht…", en "the/and/of…", zh pinyin
  *    with tone digits "de5/shi4/zai4…"), sampled Zipf-style;
  *  - 64 CONTENT WORDS per language generated from per-language
  *    syllable inventories (onset/nucleus/coda + suffix morphology:
  *    de "sch…ung", en "th…ing", es "…cion", fr "…eaux", zh pinyin
  *    syllable+tone), also Zipf-sampled.
  * A char-trigram classifier trained on the train split therefore
  * learns real cross-language structure ("sch/und" ⇒ de, tone digits
  * ⇒ zh, "tion/eux" ⇒ fr …), and held-out accuracy measures model
  * quality, not injected markers.
  *
  * Layout: 5 langs × 320 docs (doc_id = langIdx·320 + i), 30–60
  * tokens each; `split` = 'test' for i % 5 == 4 (64 held-out docs per
  * language), 'train' otherwise. The trainer (`TrainLangId`) consumes
  * only the train split; the registry query `text_langid_model` and
  * the accuracy floors in `LangIdModelSpec` consume only the test
  * split.
  */
object GenLangCorpus {

  val docsPerLang = 320

  /** Deterministic 64-bit LCG stream (MMIX constants) — the
    * `GenImageFixtures` generator, seeded per (lang, doc).
    */
  private final class Lcg(seed: Long) {
    private var s = seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(n: Int): Int = (((next() >>> 16) % n + n) % n).toInt
    /** uniform double in [0, 1) from the high 53 bits */
    def nextDouble(): Double = (next() >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Zipf-ish rank draw over n items: weight of rank r is 1/(r+1). */
  private def zipf(r: Lcg, n: Int): Int = {
    val u = r.nextDouble() * math.log(n + 1.0)
    math.min(n - 1, math.max(0, (math.exp(u) - 1.0).toInt))
  }

  private final case class LangShape(fn: Seq[String], onsets: Seq[String],
      nuclei: Seq[String], codas: Seq[String], suffixes: Seq[String],
      tones: Boolean)

  private val shapes: Map[String, LangShape] = Map(
    "de" -> LangShape(
      Seq("und", "der", "die", "das", "nicht", "ein", "ist", "mit", "von", "zu"),
      Seq("sch", "st", "br", "kr", "f", "g", "h", "m", "w", "z"),
      Seq("a", "e", "i", "o", "u", "ei", "au", "ie"),
      Seq("n", "r", "t", "ch", "ng", "l", "nd", "cht"),
      Seq("", "ung", "keit", "en", "er", "lich"), tones = false),
    "en" -> LangShape(
      Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
      Seq("th", "wh", "str", "b", "c", "d", "f", "h", "p", "s"),
      Seq("a", "e", "i", "o", "oo", "ea", "ou", "igh"),
      Seq("t", "d", "ng", "s", "ll", "ck", "r", "w"),
      Seq("", "ing", "tion", "ed", "ly", "ness"), tones = false),
    "es" -> LangShape(
      Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
      Seq("b", "c", "d", "f", "g", "l", "m", "p", "r", "t"),
      Seq("a", "e", "i", "o", "u", "ue", "ie", "io"),
      Seq("", "n", "s", "r", "l", "", "n", "s"),
      Seq("", "cion", "dad", "ando", "illo", "os"), tones = false),
    "fr" -> LangShape(
      Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "est"),
      Seq("b", "c", "d", "f", "g", "l", "m", "p", "v", "j"),
      Seq("a", "e", "i", "o", "ou", "eau", "ai", "eu"),
      Seq("", "n", "r", "s", "x", "t", "", "n"),
      Seq("", "eux", "tion", "ment", "ette", "age"), tones = false),
    "zh" -> LangShape(
      Seq("de5", "shi4", "zai4", "le5", "wo3", "ni3", "ta1", "men5", "bu4", "you3"),
      Seq("b", "d", "g", "h", "j", "l", "m", "n", "sh", "zh", "x", "w"),
      Seq("a", "e", "i", "o", "u", "ai", "ao", "ang", "eng", "ong", "uan", "ian"),
      Seq(""), Seq(""), tones = true))

  private def syllable(r: Lcg, s: LangShape): String = {
    val base = s.onsets(r.nextInt(s.onsets.size)) +
      s.nuclei(r.nextInt(s.nuclei.size)) + s.codas(r.nextInt(s.codas.size))
    if (s.tones) base + (1 + r.nextInt(5)).toString else base
  }

  /** The 64-entry content vocabulary of one language (rank order =
    * sample-weight order; generated words may repeat a shape — that
    * only sharpens the language's distribution).
    */
  def contentVocab(lang: String): IndexedSeq[String] = {
    val s = shapes(lang)
    val r = new Lcg(lang.hashCode.toLong * 7919L + 17L)
    IndexedSeq.tabulate(64) { _ =>
      val nSyl = 1 + r.nextInt(2)
      val w = (0 until nSyl).map(_ => syllable(r, s)).mkString
      if (s.tones) w else w + s.suffixes(r.nextInt(s.suffixes.size))
    }
  }

  /** One deterministic doc: 30–60 tokens, ~45% function words. */
  def docText(lang: String, i: Int): String = {
    val s = shapes(lang)
    val vocab = contentVocab(lang)
    val r = new Lcg(LangIdModel.langs.indexOf(lang).toLong * 100003L + i)
    val n = 30 + r.nextInt(31)
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      if (r.nextInt(100) < 45) sb.append(s.fn(zipf(r, s.fn.size)))
      else sb.append(vocab(zipf(r, vocab.size)))
      k += 1
    }
    sb.toString
  }

  /** The full corpus in committed row order. */
  def corpus(): Seq[(Long, String, String, String)] =
    LangIdModel.langs.zipWithIndex.flatMap { case (lang, li) =>
      (0 until docsPerLang).map { i =>
        val split = if (i % 5 == 4) "test" else "train"
        ((li * docsPerLang + i).toLong, lang, split, docText(lang, i))
      }
    }

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("split", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = corpus().map { case (id, lang, split, text) =>
      Row(id, lang, split, text)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(LangIdModel.corpusPath)
    println(s"WROTE ${rows.size} docs -> ${LangIdModel.corpusPath}")
    spark.stop()
  }
}
