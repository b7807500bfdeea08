package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the round-18 HOF→codegen rewrites in `TextOps` to the original
  * higher-order-function semantics: `tokens` (array_remove∘split vs
  * filter∘split) and the quality-metric char sum (translate vs
  * aggregate∘transform) must agree on every edge shape — empty text,
  * runs of spaces, leading/trailing spaces, NULL.
  */
class TextOpsTokensSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def docs() = {
    val rows = Seq(
      "the cat sat", "", " ", "   ", "a  b   c ", " leading",
      "trailing ", "one", null, "Punct, and. more! stuff?",
      "the the the", "多字节 字符 test"
    ).map(s => org.apache.spark.sql.Row(s))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true))))
  }

  test("tokens == filter-HOF formulation on all edge shapes") {
    val d = docs()
    val hof = filter(split(col("text"), " "), t => t =!= "")
    val mism = d.filter(
      !(TextOps.tokens(col("text")) <=> hof)).count()
    assert(mism === 0)
  }

  test("quality char sum == aggregate-HOF formulation") {
    val d = docs()
    val hofSum = aggregate(
      transform(filter(split(col("text"), " "), t => t =!= ""),
        t => length(t).cast(LongType)),
      lit(0L), (a, c) => a + c)
    val cg = length(translate(col("text"), " ", "")).cast(LongType)
    val mism = d.filter(!(hofSum <=> cg)).count()
    assert(mism === 0)
  }

  test("qualityScore values unchanged on the sf0.001 documents") {
    val d = graft.Queries.table(spark, "/root/testdata/sf0.001", "documents")
    // HOF reference formulation of the full metric tuple
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val nTok = size(toks).cast(LongType)
    val nStop = size(filter(toks,
      t => lower(t).isin(TextOps.stopwords.map(lit): _*))).cast(LongType)
    val charSum = aggregate(transform(toks, t => length(t).cast(LongType)),
      lit(0L), (a, c) => a + c)
    val stopRatio = when(nTok > 0, floor(nStop * 1000.0 / nTok))
      .otherwise(0L).cast(LongType)
    val meanLen = when(nTok > 0, floor(charSum * 1000.0 / nTok))
      .otherwise(0L).cast(LongType)
    val ref = d.select(col("doc_id"), nTok.as("n_tokens"),
      stopRatio.as("stop_ratio_milli"), meanLen.as("mean_word_len_milli"))
    val got = TextOps.qualityScore(d, "doc_id", "text")
      .select("doc_id", "n_tokens", "stop_ratio_milli", "mean_word_len_milli")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }
}
