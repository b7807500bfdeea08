package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins for the trained quality classifier: training determinism (the
  * committed-artifact contract, like `CodebooksSpec`), fit floor on the
  * bootstrap labels, inference/driver equality, and weight-artifact
  * round trip.
  */
class QualityModelSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def corpus() = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("training is deterministic and partitioning-invariant") {
    val docs = corpus()
    val s1 = QualityModel.sampleDocs(docs, "doc_id", "text")
    val s2 = QualityModel.sampleDocs(docs.repartition(7), "doc_id", "text")
    assert(s1 == s2, "hash-ordered sample depends on partitioning")
    val m1 = QualityModel.train(s1)
    val m2 = QualityModel.train(s2)
    assert(m1.bias == m2.bias)
    assert(m1.weights.sameElements(m2.weights))
  }

  test("perceptron fits the heuristic bootstrap labels (>= 85%)") {
    val sample = QualityModel.sampleDocs(corpus(), "doc_id", "text")
    val m = QualityModel.train(sample)
    val correct = sample.count { case (_, text, label) =>
      (m.score(text) > 0L) == label
    }
    assert(correct * 1000 >= sample.size * 850,
      s"train accuracy $correct/${sample.size}")
    // both classes must actually occur — otherwise the floor is vacuous
    assert(sample.exists(_._3) && sample.exists(!_._3))
  }

  test("distributed scoreDocs equals driver-side model.score per doc") {
    val docs = corpus()
    val m = QualityModel.train(QualityModel.sampleDocs(docs, "doc_id", "text"))
    val scored = QualityModel.scoreDocs(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        val s = m.score(r.getString(1))
        assert(scored(r.getLong(0)) == (s, s > 0L))
      }
    }
  }

  test("weights parquet round-trips the exact model") {
    val m = QualityModel.train(
      QualityModel.sampleDocs(corpus(), "doc_id", "text"))
    val path = java.nio.file.Files
      .createTempDirectory("qw").toString + "/w.parquet"
    QualityModel.writeWeights(spark, path, m)
    val back = QualityModel.loadWeights(spark, path)
    assert(back.bias == m.bias && back.weights.sameElements(m.weights))
  }

  test("committed artifact reproduces from the sf0.01 corpus (the " +
    "TrainQualityModel contract: train split only)") {
    val committed = new java.io.File(QualityModel.weightsPath)
    assume(committed.exists, "no committed weights artifact")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val (trainSet, _) = QualityModel.splitSample(
      QualityModel.sampleDocs(docs, "doc_id", "text"))
    val retrained = QualityModel.train(trainSet, epochs = 5)
    val loaded = QualityModel.loadWeights(spark, QualityModel.weightsPath)
    assert(loaded.bias == retrained.bias)
    assert(loaded.weights.sameElements(retrained.weights))
  }

  /** The COMMITTED weights generalize to docs they never saw: the
    * held-out side of the deterministic hash split (base-257, disjoint
    * from training by construction — `QualityModel.holdOut`). Floors sit
    * well under the recorded values (held-out acc 980 / prec 979 / rec
    * 1000 permille at training time) so label-noise-level drift does not
    * flake the suite, while a model that memorized instead of
    * generalizing fails loudly.
    */
  test("committed artifact clears held-out accuracy/precision/recall " +
    "floors (train accuracy alone overstates a perceptron)") {
    val committed = new java.io.File(QualityModel.weightsPath)
    assume(committed.exists, "no committed weights artifact")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val (trainSet, heldOut) = QualityModel.splitSample(
      QualityModel.sampleDocs(docs, "doc_id", "text"))
    assert(heldOut.nonEmpty && trainSet.nonEmpty)
    // both classes occur held-out — otherwise the floors are vacuous
    assert(heldOut.exists(_._3) && heldOut.exists(!_._3))
    // split is genuinely disjoint
    val trainIds = trainSet.map(_._1).toSet
    assert(heldOut.forall(d => !trainIds.contains(d._1)))
    val m = QualityModel.loadWeights(spark, QualityModel.weightsPath)
    val e = QualityModel.evaluate(m, heldOut)
    assert(e.accMilli >= 900L, s"held-out accuracy ${e.accMilli} permille")
    assert(e.precMilli >= 900L, s"held-out precision ${e.precMilli} permille")
    assert(e.recMilli >= 900L, s"held-out recall ${e.recMilli} permille")
  }
}
