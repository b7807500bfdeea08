package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins `ParquetSchema.of` to byte-identity with Spark's own inference
  * for every fixture table and committed artifact layout the engine
  * reads — the footer fast path must never change a schema (round-18
  * optimization: the inference JOB is skipped, the result may not move).
  */
class ParquetSchemaSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def check(path: String): Unit = {
    // same flag table() sets before reading fixture tables
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fast = ParquetSchema.of(spark, path)
    assert(fast.isDefined, s"no driver-side schema for $path")
    val inferred = spark.read.parquet(path).schema
    assert(fast.get === inferred, s"schema mismatch for $path")
  }

  test("fixture tables: footer schema == inferred schema (all sfs)") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1");
         t <- Seq("region", "nation", "customer", "supplier", "part",
           "orders", "lineitem", "events", "documents", "embeddings")) {
      val p = s"/root/testdata/$sf/$t.parquet"
      if (new java.io.File(p).exists()) check(p)
    }
  }

  test("committed artifacts: footer schema == inferred schema") {
    for (p <- Seq(Codebooks.coarsePath, Codebooks.pqPath,
      Codebooks.pqResPath, Dsir.weightsPath, QualityModel.weightsPath,
      LangIdModel.modelPath, LangIdModel.corpusPath, Bpe.mergesPath,
      NgramLm.modelPath)) check(p)
  }

  test("hive-partitioned trees fall back to inference (None)") {
    val idx = Codebooks.dedupIndexRoot
    if (new java.io.File(idx).exists())
      assert(ParquetSchema.of(spark, idx).isEmpty)
  }

  test("read() returns identical rows to inference") {
    val p = "/root/testdata/sf0.001/events.parquet"
    val a = ParquetSchema.read(spark, p)
    val b = spark.read.parquet(p)
    assert(a.schema === b.schema)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
