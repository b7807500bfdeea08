package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins for the trained char-trigram NB language classifier: θ
  * construction vs a naive mirror, argmax tie discipline, artifact
  * round-trip, distributed-vs-driver agreement, enrichment mirror
  * equality, and the committed artifact's held-out accuracy floor.
  */
class LangIdModelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("train: θ is the add-1 NB estimate in floored micros") {
    val docs = Seq(
      (1L, "de", "und und"), (2L, "en", "thee"), (3L, "es", "pero"),
      (4L, "fr", "avec"), (5L, "zh", "de5"))
    val m = LangIdModel.train(docs)
    // "und und": trigrams "und","nd ","d u"," un","und" -> 5 total for de
    val deTot = 5L
    val bUnd = LangIdModel.bucketOf("und")
    val expect = math.floor(math.log(
      (2L + 1L).toDouble / (deTot + LangIdModel.dim).toDouble) * 1e6).toLong
    assert(m.thetaMicro("de")(bUnd) == expect)
    // priors: each lang 1 doc of 5, add-1 -> ln(2/10)
    val pri = math.floor(math.log(2.0 / 10.0) * 1e6).toLong
    assert(LangIdModel.langs.forall(l => m.priorMicro(l) == pri))
    // determinism under doc order
    assert(LangIdModel.train(docs.reverse).thetaMicro("de").toSeq ==
      m.thetaMicro("de").toSeq)
  }

  test("argmax ties break to language-name order") {
    // empty-ish text (< 3 chars): every score is the prior; equal
    // priors -> 'de' (first in name order) must win
    val docs = LangIdModel.langs.zipWithIndex.map { case (l, i) =>
      (i.toLong, l, "x")
    }
    val m = LangIdModel.train(docs)
    assert(LangIdModel.predict("ab", m) == "de")
  }

  test("artifact round-trip preserves θ and priors exactly") {
    val docs = Seq((1L, "de", "und nicht"), (2L, "en", "thee thou"),
      (3L, "es", "pero como"), (4L, "fr", "avec pour"),
      (5L, "zh", "de5 shi4"))
    val m = LangIdModel.train(docs)
    val path = java.nio.file.Files
      .createTempDirectory("lidrt").toString + "/nb.parquet"
    LangIdModel.writeModel(spark, path, m)
    val r = LangIdModel.loadModel(spark, path)
    assert(r.priorMicro == m.priorMicro)
    LangIdModel.langs.foreach { l =>
      assert(r.thetaMicro(l).toSeq == m.thetaMicro(l).toSeq)
    }
  }

  test("predictDocs matches driver-side predict") {
    val s = spark
    import s.implicits._
    val m = LangIdModel.loadModel(spark, LangIdModel.modelPath)
    val docs = Seq.tabulate(60) { i =>
      val lang = LangIdModel.langs(i % 5)
      (i.toLong, lang, s"filler w${i % 7} body text und the de5")
    }
    val df = docs.toDF("doc_id", "lang", "text").repartition(2)
    val out = LangIdModel.predictDocs(df, "doc_id", "lang", "text", m)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    docs.foreach { case (id, _, text) =>
      assert(out(id) == LangIdModel.predict(text, m))
    }
  }

  /** Held-out corpus test split, committed model only — what the
    * registry green certifies: real per-language classification over
    * genuinely distinct language distributions, no injected markers.
    */
  test("committed artifact: held-out accuracy ≥ 950‰ overall, ≥ 900‰ per lang") {
    val heldOut = spark.read.parquet(LangIdModel.corpusPath)
      .filter(col("split") === "test")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(heldOut.length == LangIdModel.langs.size * 64)
    val m = LangIdModel.loadModel(spark, LangIdModel.modelPath)
    val perLang = heldOut.groupBy(_._2)
    assert(perLang.keySet == LangIdModel.langs.toSet)
    perLang.foreach { case (lang, docs) =>
      val ok = docs.count { case (_, l, t) => LangIdModel.predict(t, m) == l }
      assert(ok * 1000L / docs.length >= 900L,
        s"held-out accuracy for $lang: $ok/${docs.length}")
    }
    val correct = heldOut.count { case (_, lang, text) =>
      LangIdModel.predict(text, m) == lang
    }
    assert(correct * 1000L / heldOut.length >= 950L,
      s"held-out accuracy $correct/${heldOut.length}")
  }

  /** The committed corpus parquet is exactly what `GenLangCorpus`
    * regenerates (values, order, split layout) — the image-fixture
    * pin discipline; drift in the generator or the artifact fails
    * loudly here, not as a silent oracle mismatch.
    */
  test("committed corpus == deterministic regeneration; train/test disjoint") {
    val committed = spark.read.parquet(LangIdModel.corpusPath)
      .select("doc_id", "lang", "split", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val regen = graft.tools.GenLangCorpus.corpus()
    assert(committed == regen)
    // ASCII-only (the DuckDB ascii() hash mirror is byte-exact)
    assert(regen.forall(_._4.forall(c => c < 128 && c >= ' ')))
    val splits = regen.groupBy(_._3).view.mapValues(_.size).toMap
    assert(splits == Map(
      "train" -> LangIdModel.langs.size * 256,
      "test" -> LangIdModel.langs.size * 64))
  }
}
