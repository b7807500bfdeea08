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
    "TrainQualityModel contract)") {
    val committed = new java.io.File(QualityModel.weightsPath)
    assume(committed.exists, "no committed weights artifact")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val retrained = QualityModel.train(
      QualityModel.sampleDocs(docs, "doc_id", "text"), epochs = 5)
    val loaded = QualityModel.loadWeights(spark, QualityModel.weightsPath)
    assert(loaded.bias == retrained.bias)
    assert(loaded.weights.sameElements(retrained.weights))
  }
}
