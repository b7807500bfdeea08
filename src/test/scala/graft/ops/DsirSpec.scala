package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins for DSIR importance scoring: the committed λ artifact's shape,
  * distributed-vs-driver score agreement, selection determinism under
  * repartitioning, and the artifact's target/non-target separation on
  * fresh (non-training-sample) docs.
  */
class DsirSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("committed artifact is dense over all buckets") {
    val rows = spark.read.parquet(Dsir.weightsPath).collect()
    assert(rows.length == Dsir.dim)
    val buckets = rows.map(_.getLong(0)).toSet
    assert(buckets == (0L until Dsir.dim.toLong).toSet)
  }

  test("train: λ is the smoothed log-ratio in floored micros") {
    // tiny corpus: bigram "a b" only in the target doc, "x y" only in
    // the non-target doc
    val docs = Seq((1L, "a b", true), (2L, "x y", false))
    val w = Dsir.train(docs)
    // nTgt=1, nRaw=2: target-only bucket λ = ln((1+1)/(1+4096)) −
    // ln((1+1)/(2+4096)); absent bucket λ = ln(1/4097) − ln(1/4098)
    val bAB = Dsir.bucketOf("a b")
    val bXY = Dsir.bucketOf("x y")
    def lam(t: Long, r: Long) = math.floor(
      (math.log((t + 1).toDouble / 4097.0) -
        math.log((r + 1).toDouble / 4098.0)) * 1e6).toLong
    assert(w.lambdaMicro(bAB) == lam(1, 1))
    assert(w.lambdaMicro(bXY) == lam(0, 1))
    assert(w.lambdaMicro(bAB) > 0 && w.lambdaMicro(bXY) < 0)
    // unseen buckets carry the small positive smoothing constant
    val other = (0 until Dsir.dim).find(b => b != bAB && b != bXY).get
    assert(w.lambdaMicro(other) == lam(0, 0))
  }

  test("scoreDocs matches driver-side scoreText; topK is stable") {
    val s = spark
    import s.implicits._
    val w = Dsir.loadWeights(spark, Dsir.weightsPath)
    val docs = Seq.tabulate(200) { i =>
      (i.toLong, Seq.fill(3 + i % 5)(s"tok${i % 17} w${i % 7}")
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dsir.scoreDocs(df, "doc_id", "text", w).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    docs.foreach { case (id, text) =>
      val (n, s) = Dsir.scoreText(text, w)
      assert(got(id) == ((n, s, Dsir.perGram(s, n))), s"doc $id")
    }
    val a = Dsir.selectTopK(
      Dsir.scoreDocs(df.coalesce(1), "doc_id", "text", w), 20)
      .collect().map(_.toSeq)
    val b = Dsir.selectTopK(
      Dsir.scoreDocs(df.repartition(7), "doc_id", "text", w), 20)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("committed λ separates quality docs on the HELD-OUT split") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val w = Dsir.loadWeights(spark, Dsir.weightsPath)
    // λ trained on the train side of this split only (TrainDsir), so
    // the held-out side measures the committed artifact's generalization
    val (_, heldOut) = QualityModel.splitSample(
      QualityModel.sampleDocs(docs, "doc_id", "text"))
    val scores = heldOut.map { case (_, text, ok) =>
      val (n, s) = Dsir.scoreText(text, w)
      (Dsir.perGram(s, n), ok)
    }
    val tgt = scores.collect { case (v, true) => v }.sorted
    val non = scores.collect { case (v, false) => v }.sorted
    assert(tgt.nonEmpty && non.nonEmpty)
    def med(xs: Seq[Long]) = xs(xs.size / 2)
    assert(med(tgt) > med(non),
      s"target median ${med(tgt)} !> non-target median ${med(non)}")
  }
}
