package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** BPE pins: a hand-derived merge sequence, the reconstruction
  * invariant, a differential against an independently-formulated apply
  * loop, and the committed artifact's shape/quality.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("train derives the hand-computed merge sequence") {
    // ab×5, abc×3: pair counts start (a,b)=8, (b,</w>)=5, (b,c)=3,
    // (c,</w>)=3 → merges follow frequency then lexicographic ties
    val merges = Bpe.train(Seq("ab" -> 5L, "abc" -> 3L), 10)
    assert(merges.map(m => (m.l, m.r)) == Seq(
      ("a", "b"), ("ab", "</w>"), ("ab", "c"), ("abc", "</w>")))
    val ranks = merges.map(m => (m.l, m.r) -> m.rank).toMap
    assert(Bpe.tokenizeWord("ab", ranks) == Vector("ab</w>"))
    assert(Bpe.tokenizeWord("abc", ranks) == Vector("abc</w>"))
    // unseen word: known prefixes merge, the tail stays characters
    assert(Bpe.tokenizeWord("abx", ranks) == Vector("ab", "x", "</w>"))
  }

  test("tokenization always reconstructs the word") {
    val rnd = new scala.util.Random(3)
    val alpha = "abcd"
    def word() = Seq.fill(1 + rnd.nextInt(8))(
      alpha(rnd.nextInt(alpha.length))).mkString
    val corpus = Seq.fill(40)(word()).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }.toSeq
    val ranks = Bpe.train(corpus, 30).map(m => (m.l, m.r) -> m.rank).toMap
    (corpus.map(_._1) ++ Seq.fill(20)(word())).foreach { w =>
      val toks = Bpe.tokenizeWord(w, ranks)
      assert(toks.mkString == w + Bpe.endMark, s"reconstruction of $w")
    }
  }

  test("apply loop equals the rank-ascending-with-restart formulation") {
    // independent reference: walk ranks in ascending order, merge the
    // first applicable, restart — equivalent to min-rank-first, but a
    // different code path
    def reference(word: String, merges: Seq[Bpe.Merge]): Vector[String] = {
      var syms = Bpe.initSymbols(word)
      var changed = true
      while (changed) {
        changed = false
        val it = merges.sortBy(_.rank).iterator
        while (!changed && it.hasNext) {
          val m = it.next()
          val merged = Bpe.mergePass(syms, m.l, m.r)
          if (merged != syms) { syms = merged; changed = true }
        }
      }
      syms
    }
    val rnd = new scala.util.Random(17)
    val alpha = "abc"
    def word() = Seq.fill(1 + rnd.nextInt(10))(
      alpha(rnd.nextInt(alpha.length))).mkString
    val corpus = Seq.fill(60)(word()).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }.toSeq
    val merges = Bpe.train(corpus, 40)
    val ranks = merges.map(m => (m.l, m.r) -> m.rank).toMap
    (0 until 300).foreach { _ =>
      val w = word()
      assert(Bpe.tokenizeWord(w, ranks) == reference(w, merges),
        s"differential at $w")
    }
  }

  test("committed artifact: 96 contiguous ranks, sane corpus fertility, " +
      "distributed stats match driver-side tokenization") {
    val s = spark
    import s.implicits._
    val merges = Bpe.loadMerges(spark, Bpe.mergesPath)
    assert(merges.size == 96)
    assert(merges.map(_.rank) == (0 until 96))
    val ranks = merges.map(m => (m.l, m.r) -> m.rank).toMap
    val docs = Seq(
      (1L, "customer window customer"),
      (2L, "join"),
      (3L, ""))
    val out = Bpe.tokenStats(docs.toDF("doc_id", "text"), "doc_id", "text",
      merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    docs.foreach { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val nt = ws.map(w => Bpe.tokenizeWord(w, ranks).length.toLong).sum
      val nw = ws.length.toLong
      val fert = if (nw == 0) 0L else nt * 1000L / nw
      assert(out(id) == ((nw, nt, fert)), s"doc $id")
    }
    // the real corpus tokenizes at a sane fertility: between "every
    // word one token" (1000) and "no merges learned" (chars)
    val fixture = spark.read.parquet(
      "/root/testdata/sf0.01/documents.parquet")
    val stats = Bpe.tokenStats(fixture, "doc_id", "text", merges)
      .agg(org.apache.spark.sql.functions.expr(
        "sum(n_bpe_tokens) * 1000 DIV sum(n_words)"))
      .collect()(0).getLong(0)
    assert(stats >= 1000L && stats <= 2000L, s"corpus fertility $stats")
  }
}
