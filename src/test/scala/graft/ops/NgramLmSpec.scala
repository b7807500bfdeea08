package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins for the stupid-backoff bigram LM (CCNet perplexity filter):
  * cost construction against a naive independent mirror, the backoff /
  * OOV paths, artifact round-trip, distributed-vs-driver agreement,
  * gate bucket semantics, and the committed artifact's held-out
  * direction (clean docs score lower than junk).
  */
class NgramLmSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // naive mirror: recompute S(w_i|w_{i-1}) from raw counts with doubles
  // and floor each −ln to micros — independent of the Model lookups
  private def naiveNll(text: String, target: Seq[String]): Long = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    var n = 0L
    target.foreach { t =>
      val ts = t.split(" ").filter(_.nonEmpty)
      ts.foreach { w => uni(w) = uni.getOrElse(w, 0L) + 1L; n += 1L }
      ts.sliding(2).filter(_.length == 2).foreach { p =>
        bi((p(0), p(1))) = bi.getOrElse((p(0), p(1)), 0L) + 1L
      }
    }
    def cm(p: Double) = math.floor(-math.log(p) * 1e6).toLong
    val oov = cm(1.0 / (n + 1.0))
    val al = cm(0.4)
    var s = 0L
    toks.zipWithIndex.foreach { case (w, i) =>
      val uc = uni.get(w).map(c => cm(c.toDouble / n)).getOrElse(oov)
      if (i == 0) s += uc
      else bi.get((toks(i - 1), w)) match {
        case Some(c) => s += cm(c.toDouble / uni(toks(i - 1)))
        case None => s += al + uc
      }
    }
    s
  }

  test("scoreText equals the naive count-based mirror, incl. OOV/backoff") {
    val target = Seq("a b a b c", "a c a b")
    val docs = target.zipWithIndex.map { case (t, i) => (i.toLong, t, true) }
    val m = NgramLm.train(docs)
    for (text <- Seq(
        "a b c",          // all seen bigrams
        "c a",            // unigrams seen, bigram absent -> backoff
        "z a b q z",      // OOV tokens at edges
        "a",              // single token: unigram only
        "q"))  {          // single OOV token
      val (nTok, nOov, nll) = NgramLm.scoreText(text, m)
      assert(nTok == text.split(" ").count(_.nonEmpty).toLong)
      assert(nll == naiveNll(text, target), s"text '$text'")
      val oovExpected = text.split(" ").filter(_.nonEmpty)
        .count(w => !Seq("a", "b", "c").contains(w))
      assert(nOov == oovExpected.toLong)
    }
  }

  test("train is deterministic and ignores non-target docs' counts") {
    val docs = Seq((1L, "a b a", true), (2L, "junk junk junk", false),
      (3L, "b a b", true))
    val m1 = NgramLm.train(docs)
    val m2 = NgramLm.train(docs.reverse)
    assert(m1.uniCostMicro == m2.uniCostMicro)
    assert(m1.biCostMicro == m2.biCostMicro)
    assert(m1.alphaMicro == m2.alphaMicro && m1.oovMicro == m2.oovMicro)
    // "junk" never entered the vocabulary
    assert(!m1.uniCostMicro.contains(DedupOps.tokenHash60Jvm("junk")))
  }

  test("artifact round-trip preserves the model exactly") {
    val docs = Seq((1L, "a b c a b", true), (2L, "c c a", true),
      (3L, "b", false))
    val m = NgramLm.train(docs)
    val path = java.nio.file.Files
      .createTempDirectory("lmrt").toString + "/lm.parquet"
    NgramLm.writeModel(spark, path, m)
    val r = NgramLm.loadModel(spark, path)
    assert(r == m)
  }

  test("scoreDocs matches driver-side scoreText; passthrough rides along") {
    val s = spark
    import s.implicits._
    val m = NgramLm.loadModel(spark, NgramLm.modelPath)
    val docs = Seq.tabulate(100) { i =>
      (i.toLong, Seq.fill(2 + i % 6)(s"w${i % 9} v${i % 4}").mkString(" "),
        s"lang${i % 3}")
    }
    val df = docs.toDF("doc_id", "text", "lang").repartition(2)
    val out = NgramLm.scoreDocs(df, "doc_id", "text", m,
      passthrough = Seq("lang")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    docs.foreach { case (id, text, lang) =>
      val (n, oov, nll) = NgramLm.scoreText(text, m)
      assert(out(id) == ((lang, n, oov, nll, Math.floorDiv(nll, n))))
    }
  }

  test("gate buckets split on the committed terciles; keep = not tail") {
    val s = spark
    import s.implicits._
    val m = NgramLm.loadModel(spark, NgramLm.modelPath)
    assert(m.t1Micro <= m.t2Micro)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val g = NgramLm.perplexityGate(
      NgramLm.scoreDocs(docs, "doc_id", "text", m), m).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      val pt = r.getAs[Long]("nll_pt_micro")
      val b = r.getAs[String]("ppl_bucket")
      val expect = if (pt <= m.t1Micro) "head"
        else if (pt <= m.t2Micro) "middle" else "tail"
      assert(b == expect)
      assert(r.getAs[Boolean]("keep") == (b != "tail"))
    }
    // the committed cuts came from terciles of a same-distribution
    // population: all three buckets must be inhabited
    assert(g.map(_.getAs[String]("ppl_bucket")).distinct.sorted.toSeq ==
      Seq("head", "middle", "tail"))
  }

  test("committed artifact: held-out clean docs score below junk (median)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sample = QualityModel.sampleDocs(docs, "doc_id", "text")
    val (_, heldOut) = QualityModel.splitSample(sample)
    val m = NgramLm.loadModel(spark, NgramLm.modelPath)
    val scores = heldOut.flatMap { case (_, text, label) =>
      val (n, _, nll) = NgramLm.scoreText(text, m)
      if (n > 0L) Some((Math.floorDiv(nll, n), label)) else None
    }
    def med(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val clean = scores.collect { case (v, true) => v }
    val junk = scores.collect { case (v, false) => v }
    assert(clean.nonEmpty && junk.nonEmpty)
    // direction pin: the LM trained on the clean side assigns clean
    // held-out docs a lower median per-token NLL. The margin is small on
    // this uniform synthetic corpus (the trainer prints it); the
    // DIRECTION is the invariant.
    assert(med(clean) < med(junk),
      s"median clean ${med(clean)} !< junk ${med(junk)}")
  }
}
