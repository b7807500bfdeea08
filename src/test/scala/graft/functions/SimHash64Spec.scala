package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The native SimHash64 expression must equal the JVM tight-loop
  * formulation (split on single spaces, skip empties, ±1 bit votes over
  * tokenHash60) on arbitrary inputs, handle nulls, run inside
  * whole-stage codegen, and be callable from SQL via the extension.
  */
class SimHash64Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The pre-expression formulation, verbatim. */
  private def jvmSimHash(text: String): Long = {
    def polyHashJvm(str: String, b: Long): Long = {
      var acc = 0L; var i = 0
      while (i < str.length) {
        acc = (acc * b + str.charAt(i).toLong) % 1000000007L; i += 1
      }
      acc
    }
    val sums = new Array[Int](64)
    for (tok <- text.split(" ") if tok.nonEmpty) {
      val th = polyHashJvm(tok, 131L) + polyHashJvm(tok, 257L) * 1073741824L
      var b = 0
      while (b < 64) {
        if (((th >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
    }
    var h = 0L
    var b = 0
    while (b < 64) { if (sums(b) > 0) h |= (1L << b); b += 1 }
    h
  }

  test("native expression equals the JVM loop; nulls pass through") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val printable = (32 to 126).map(_.toChar)
    val samples = Seq("", " ", "one", "a b c", "  double  spaces ",
      "w1 w2 w3 w4 w5 w6 w7 w8") ++
      (1 to 40).map(_ =>
        Vector.fill(rnd.nextInt(80))(
          printable(rnd.nextInt(printable.length))).mkString)
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select(col("id"),
      SimHash64.simHash64(col("text")).as("h")).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    samples.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i) == jvmSimHash(t), s"sample $i: '${t.take(30)}'")
    }
    val withNull = Seq((0L, Option("a b")), (1L, None: Option[String]))
      .toDF("id", "text")
      .select(SimHash64.simHash64(col("text")).as("h")).collect()
    assert(!withNull(0).isNullAt(0) && withNull(1).isNullAt(0))
  }

  test("runs inside whole-stage codegen and from SQL") {
    val s = spark
    import s.implicits._
    // spark.range avoids ConvertToLocalRelation pre-evaluation; `*(n)`
    // prefixes mark codegen stages in the executed plan
    val df = s.range(8).select(
      SimHash64.simHash64(concat(lit("tok"), col("id").cast("string")))
        .as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen stage in:\n$plan")
    assert(df.collect().forall(!_.isNullAt(0)))

    val viaSql = s.sql("SELECT simhash64('a b c') AS h").head.getLong(0)
    assert(viaSql == jvmSimHash("a b c"))
  }
}
