package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native PolyHash expression must equal the interpreted HOF
  * formulation and the JVM mirror on arbitrary inputs, handle nulls, and
  * run inside whole-stage codegen.
  */
class PolyHashSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def hofHash(text: org.apache.spark.sql.Column, base: Long) =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast(LongType)),
      lit(0L),
      (acc, c) => (acc * base + c) % 1000000007L)

  test("native expression equals HOF formulation and JVM mirror") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val printable = (32 to 126).map(_.toChar)
    val samples = Seq("", "a", "hello world!", "  spaces  ", "123,456?!") ++
      (1 to 40).map(_ =>
        Vector.fill(rnd.nextInt(60))(
          printable(rnd.nextInt(printable.length))).mkString)
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (base <- Seq(31L, 131L, 257L)) {
      val rows = df.select(col("id"),
        PolyHash.polyHash(col("text"), base).as("native"),
        hofHash(col("text"), base).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)} base=$base")
      }
      // JVM mirror (the dedup ops' tight-loop formulation)
      def polyHashJvm(str: String, b: Long): Long = {
        var acc = 0L; var i = 0
        while (i < str.length) {
          acc = (acc * b + str.charAt(i).toLong) % 1000000007L; i += 1
        }
        acc
      }
      val jvm = samples.map(t => polyHashJvm(t, base))
      rows.sortBy(_.getLong(0)).zip(jvm).foreach { case (r, j) =>
        assert(r.getLong(1) == j)
      }
    }
  }

  test("null input yields null; codegen plan executes") {
    // spark.range (not a local Seq) so ConvertToLocalRelation can't
    // pre-evaluate the projection — the hash must run in generated code
    val df = spark.range(2).select(col("id"),
      when(col("id") === 1, lit(null))
        .otherwise(concat(lit("ab"), col("id"))).as("text"))
    val out = df.select(col("id"),
      PolyHash.polyHash(col("text"), 31L).as("h"))
    // the "*(n)" prefix marks whole-stage-codegen'd operators; the
    // projection containing polyhash must carry it
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.linesIterator.exists(l =>
      l.contains("polyhash") && l.trim.startsWith("*(")), planStr)
    val rows = out.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // "ab0" hashed; null row stays null
    assert(rows(0L).contains((((('a' * 31L) + 'b') * 31 + '0') % 1000000007L)))
    assert(rows(1L).isEmpty)
  }
}
