package graft.cep

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming CEP state must survive a real stop/restart through the
  * checkpointed state store: a partial match started before the restart
  * completes after it, proving the SerRun snapshot/restore round-trip
  * against an on-disk state store (not just cross-batch in-memory state).
  */
class CheckpointRestartSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("partial match completes across a checkpointed restart") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ckpt").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/checkpoint"
    val outDir = s"$dir/out"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", LongType)))

    val q = CepQuery(
      Pattern.Combine(Contiguity.Strict, Pattern.spat("a", "signup", "True"),
        Pattern.spat("b", "purchase", "True")),
      Vector("signup" -> Vector("event_id", "value"),
        "purchase" -> Vector("event_id", "value")))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))

    def startQuery() = {
      val in = graft.sources.EventSource.jsonStream(spark, inDir, schema)
      StreamingCep.matchPattern(in, q, spec)
        .selectExpr("user_id", "a[0] as a_id", "b[0] as b_id")
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // batch 1: signup only — leaves a live partial run in the state store
    Seq((1L, 1L, "signup", 0L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // restart from the checkpoint; batch 2 completes the pair
    Seq((1L, 2L, "purchase", 10L))
      .toDF("user_id", "event_id", "event_type", "value")
      .write.mode("append").json(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.schema(StructType(Seq(
      StructField("user_id", LongType), StructField("a_id", LongType),
      StructField("b_id", LongType)))).json(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 2L)))
  }
}
