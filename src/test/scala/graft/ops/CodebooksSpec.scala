package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The determinism contract behind the committed codebook artifacts:
  * training is a pure function of (corpus, params, seed) — the property
  * the entire parquet-codebook oracle design rests on. If training
  * depended on partitioning or iteration order, `TrainCodebooks` re-runs
  * would drift from the committed artifacts and the "reproducible
  * byte-for-byte" claim would be false.
  */
class CodebooksSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("k-means training is bit-deterministic and partitioning-invariant") {
    val a = Codebooks.trainCoarse(emb, "vec_id", "embedding", nlist = 8)
    val b = Codebooks.trainCoarse(emb, "vec_id", "embedding", nlist = 8)
    // identical run-to-run, element for element (doubles compared exactly)
    assert(a.length == b.length &&
      a.zip(b).forall { case (x, y) => x.sameElements(y) })
    // identical under a different physical layout: the hash-ordered
    // bounded sample must not depend on partitioning
    val c = Codebooks.trainCoarse(emb.repartition(7), "vec_id",
      "embedding", nlist = 8)
    assert(a.zip(c).forall { case (x, y) => x.sameElements(y) },
      "training depends on partitioning — the sample order leaked")

    val p1 = Codebooks.trainPq(emb, "vec_id", "embedding", m = 8,
      ksub = 16)
    val p2 = Codebooks.trainPq(emb.repartition(5), "vec_id", "embedding",
      m = 8, ksub = 16)
    assert(p1.length == p2.length && p1.zip(p2).forall { case (ws1, ws2) =>
      ws1.length == ws2.length &&
        ws1.zip(ws2).forall { case (w1, w2) => w1.sameElements(w2) }
    }, "PQ training depends on partitioning")

    // a different seed draws a different sample ⇒ different centroids
    // (guards against the seed being silently ignored)
    val d = Codebooks.trainCoarse(emb, "vec_id", "embedding", nlist = 8,
      seed = 7L)
    assert(!a.zip(d).forall { case (x, y) => x.sameElements(y) })
  }

  test("parquet round trip returns the exact trained doubles") {
    val dir = java.nio.file.Files
      .createTempDirectory("codebooks-spec").toString
    val coarse = Codebooks.trainCoarse(emb, "vec_id", "embedding",
      nlist = 8)
    Codebooks.writeCoarse(spark, s"$dir/coarse", coarse)
    val back = Codebooks.loadCoarse(spark, s"$dir/coarse")
    assert(coarse.length == back.length &&
      coarse.zip(back).forall { case (x, y) => x.sameElements(y) },
      "coarse centroids changed across the parquet round trip")

    val pq = Codebooks.trainPq(emb, "vec_id", "embedding", m = 8,
      ksub = 16, residualOf = Some(coarse))
    Codebooks.writePq(spark, s"$dir/pq", pq)
    val pqBack = Codebooks.loadPq(spark, s"$dir/pq")
    assert(pq.length == pqBack.length &&
      pq.zip(pqBack).forall { case (ws1, ws2) =>
        ws1.zip(ws2).forall { case (w1, w2) => w1.sameElements(w2) }
      }, "PQ codebook changed across the parquet round trip")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("degenerate corpora stay well-defined") {
    val s = spark
    import s.implicits._
    // fewer distinct vectors than requested codewords: the codebook
    // clamps to what exists instead of fabricating duplicates
    val tiny = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Codebooks.trainCoarse(tiny, "vec_id", "embedding",
      nlist = 8)
    assert(cents.length == 2)
    val pq = Codebooks.trainPq(tiny, "vec_id", "embedding", m = 1,
      ksub = 8)
    assert(pq.head.length == 2)
  }
}
