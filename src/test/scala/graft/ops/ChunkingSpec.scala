package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Hand-computed pins for `Chunking.chunkByTokens` plus the no-shuffle
  * plan guarantee (the op must stay a narrow explode at any scale).
  */
class ChunkingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("windows, offsets, partial tails, overlap — hand computed") {
    // 7 tokens, chunk 3, overlap 1 → stride 2 → offs 0,2,4,6
    val df = docs(1L -> "a b c d e f g", 2L -> "x", 3L -> "  ", 4L -> "p q")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", 3, 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 3L, "a b c"),
      (1L, 1L, 2L, 3L, "c d e"),
      (1L, 2L, 4L, 3L, "e f g"),
      (1L, 3L, 6L, 1L, "g"),
      (2L, 0L, 0L, 1L, "x"), // single token doc: one chunk
      // doc 3 (whitespace only → zero tokens) emits nothing
      (4L, 0L, 0L, 2L, "p q")))
  }

  test("zero overlap partitions the token stream exactly") {
    val df = docs(1L -> "a b c d e")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(4)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((0L, 0L, "a b"), (1L, 2L, "c d"),
      (2L, 4L, "e")))
  }

  test("invalid params rejected; plan has no exchange") {
    val df = docs(1L -> "a b")
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "doc_id", "text", 4, 4)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "doc_id", "text", 0)
    }
    val plan = Chunking.chunkByTokens(df, "doc_id", "text", 3, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
