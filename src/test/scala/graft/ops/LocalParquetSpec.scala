package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins `LocalParquet.collect` to value-identity with
  * `spark.read.parquet(path).collect()` for every committed artifact
  * layout the loaders read (round-18 optimization: artifact loads no
  * longer launch cluster jobs — the values may not move).
  */
class LocalParquetSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def canon(rows: Seq[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toSeq.map {
      // Spark collect yields mutable.ArraySeq — match the base Seq type
      case s: scala.collection.Seq[_] => s.mkString("[", ",", "]")
      case v => String.valueOf(v)
    }.mkString("|")).sorted

  test("artifacts: local collect == spark collect") {
    for (p <- Seq(Codebooks.coarsePath, Codebooks.pqPath,
      Codebooks.pqResPath, Dsir.weightsPath, QualityModel.weightsPath,
      LangIdModel.modelPath, Bpe.mergesPath, NgramLm.modelPath)) {
      val local = LocalParquet.collect(spark, p)
      assert(local.isDefined, s"no local collect for $p")
      val viaSpark = spark.read.parquet(p).collect()
      assert(canon(local.get.toSeq) === canon(viaSpark.toSeq), s"values for $p")
    }
  }

  test("unsupported layouts return None (fallback, never a failure)") {
    // a fixture table with types outside the artifact set (timestamp)
    val events = "/root/testdata/sf0.001/events.parquet"
    assert(LocalParquet.collect(spark, events).isEmpty ||
      canon(LocalParquet.collect(spark, events).get.toSeq) ===
        canon(spark.read.parquet(events).collect().toSeq))
    // nonexistent path
    assert(LocalParquet.collect(spark, "/no/such/path").isEmpty)
  }

  test("loaders produce identical models through the local path") {
    // loadCoarse sorts locally by cw — compare against the Spark order
    val viaLocal = Codebooks.loadCoarse(spark, Codebooks.coarsePath)
    val viaSpark = spark.read.parquet(Codebooks.coarsePath).orderBy("cw")
      .collect().map(_.getSeq[Double](1).toArray)
    assert(viaLocal.map(_.toSeq).toSeq === viaSpark.map(_.toSeq).toSeq)
    val pqLocal = Codebooks.loadPq(spark, Codebooks.pqPath)
    assert(pqLocal.length > 0 && pqLocal.head.length > 0)
  }
}
