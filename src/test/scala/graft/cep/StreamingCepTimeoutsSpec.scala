package graft.cep

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The matchPattern ↔ timedOutPartials CHECKPOINT INTERCHANGE pin: the
  * two arrival-order operators share the state codec and the
  * `VariantArrival` tag (their run-state evolution is identical — only
  * the kept side output differs), and their scaladoc claims a
  * checkpoint written by either restores into the other. This spec
  * makes the claim a test: a run OPENED under the match operator times
  * out correctly after a restart under the timeouts operator.
  * (batch==stream and event-time behavior are pinned in
  * `TimeoutPartialSpec`.)
  */
class StreamingCepTimeoutsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val spec = SparkCep.CepSpec(Some("user_id"), "event_id",
    "event_type", Seq("value"))
  private val schema: Vector[(String, Vector[String])] = Vector(
    "signup" -> Vector("event_id", "value"),
    "click" -> Vector("event_id", "value"),
    "purchase" -> Vector("event_id", "value"))

  private val query = CepQuery(
    Pattern.Combine(Contiguity.Relaxed,
      Pattern.spat("s", "signup", "True"),
      Pattern.spat("p", "purchase", "True")),
    schema, within = Some(6))

  test("a matchPattern checkpoint restores into the timeouts operator " +
    "mid-run, and the spanning run times out there") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("cep-timeouts-compat").toString
    val inDir = s"$dir/in"
    val ckpt = s"$dir/ckpt"
    val outDir = s"$dir/out"
    def feed(rows: (Long, Long, String, Long)*): Unit =
      rows.toSeq.toDF("user_id", "event_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(inDir)

    // batch 1 through the MATCH operator: a signup opens a run
    feed((7L, 1L, "signup", 0L), (7L, 2L, "click", 1L))
    val inSchema = spark.read.parquet(inDir).schema
    def streamIn = spark.readStream.schema(inSchema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q1 = StreamingCep.matchPattern(streamIn, query, spec)
      .writeStream.format("json").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()

    // restart the SAME checkpoint through the TIMEOUTS operator and
    // push the stream past the window with clicks only — the restored
    // signup run must time out and surface here
    feed((7L, 3L, "click", 0L), (7L, 4L, "click", 0L),
      (7L, 5L, "click", 0L), (7L, 6L, "click", 0L),
      (7L, 7L, "click", 0L), (7L, 8L, "click", 0L))
    val q2 = StreamingCep.timedOutPartials(streamIn, query, spec)
      .writeStream.format("json").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("s", ArrayType(LongType)),
      StructField("p", ArrayType(LongType))))
    val rows = spark.read.schema(outSchema).json(outDir)
      .where(col("user_id").isNotNull).collect().toVector
    assert(rows.length == 1)
    assert(rows.head.getSeq[Long](rows.head.fieldIndex("s")) == Seq(1L))
    assert(rows.head.getSeq[Long](rows.head.fieldIndex("p")).isEmpty)
  }
}
