package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins for the log-bucket quantile sketch: the bucket map against an
  * independent JVM formulation, the one-sided error bound, shard
  * mergeability, and rank semantics vs Spark's own `percentile_disc`.
  */
class QuantilesSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Independent reference: leading-bit arithmetic via
    * numberOfLeadingZeros (the SQL uses a CASE chain — different code
    * path, same function).
    */
  private def bucketRef(v: Long): Long =
    if (v < 32L) v
    else {
      val hi = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val e = hi - 5
      (e + 1).toLong * 32L + ((v >>> e) & 31L)
    }

  private def repRef(b: Long): Long =
    if (b < 32L) b
    else {
      val e = (b / 32L).toInt - 1
      (32L + b % 32L) << e
    }

  test("bucketCol/repCol match the leading-bit reference and bound error") {
    val s = spark
    import s.implicits._
    val vs = (0L to 2000L) ++
      Seq.tabulate(57)(i => (1L << (i + 5)) - 1) ++
      Seq.tabulate(57)(i => 1L << (i + 5)) ++
      Seq.tabulate(57)(i => (1L << (i + 5)) + 1) ++
      Seq(Long.MaxValue / 2, (1L << 62) - 1)
    val out = vs.toDF("v")
      .select(col("v"), Quantiles.bucketCol("v").as("b"))
      .withColumn("rep", Quantiles.repCol("b"))
      .collect()
    out.foreach { r =>
      val (v, b, rep) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(b == bucketRef(v), s"bucket($v)")
      assert(rep == repRef(b), s"rep($b)")
      assert(rep <= v, s"lower bound at $v")
      assert(v - rep < math.max(1L, rep / 32L + 1L), s"width at $v")
    }
    // monotone: sorting by bucket never inverts value order across buckets
    val byBucket = out.map(r => (r.getLong(1), r.getLong(0))).sortBy(_._2)
    assert(byBucket.map(_._1).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("shard sketches merge by cell-wise count sum") {
    val s = spark
    import s.implicits._
    val a = Seq(("x", 5L), ("x", 900L), ("y", 33L)).toDF("g", "v")
    val b = Seq(("x", 5L), ("x", 1000000L), ("y", 34L)).toDF("g", "v")
    val whole = Quantiles.quantileSketch(a.union(b), "v", Seq("g"))
    val merged = Quantiles.quantileSketch(a, "v", Seq("g"))
      .union(Quantiles.quantileSketch(b, "v", Seq("g")))
      .groupBy("g", "qb").agg(sum("cnt").as("cnt"))
    val w = whole.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val m = merged.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(w == m)
  }

  test("rankPick matches percentile_disc; report audits one-sided error") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(5000) { i =>
      val g = if (i % 3 == 0) "a" else "b"
      (g, math.abs(rnd.nextLong()) % (if (g == "a") 100000L else 1000L))
    }
    val df = rows.toDF("g", "v")
    val qs = Seq(500, 900, 990)
    val rep = Quantiles.quantileReport(df, "v", Seq("g"), qs).collect()
    assert(rep.length == 6)
    rep.foreach { r =>
      val (est, exact) = (r.getLong(3), r.getLong(4))
      assert(est <= exact, s"one-sided at $r")
      assert(exact - est < math.max(1L, est / 32L + 1L), s"error at $r")
    }
    // exact_v replays percentile_disc semantics exactly
    val disc = df.groupBy("g").agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT)")
        .as("p500"),
      expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS BIGINT)")
        .as("p900"),
      expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY v) AS BIGINT)")
        .as("p990"))
      .collect().map(r => r.getString(0) ->
        Map(500 -> r.getLong(1), 900 -> r.getLong(2), 990 -> r.getLong(3)))
      .toMap
    rep.foreach { r =>
      assert(r.getLong(4) == disc(r.getString(0))(r.getLong(1).toInt),
        s"percentile_disc mismatch at $r")
    }
  }

  test("madOutliers: hand-computed median/MAD/outliers, zero-MAD " +
      "degenerate flags any deviation") {
    val s = spark
    import s.implicits._
    // g=a: 1..9 + 100 → med 5 (rank ⌈5⌉), devs sorted 0,1,1,2,2,3,3,4,
    // 4,95 → MAD 2, 3×MAD outliers: d > 6 → only the 95
    // g=b: 7,7,7,9 → med 7, MAD 0 → any nonzero deviation flags
    val df = ((1L to 9L) :+ 100L).map(("a", _)) ++
      Seq(("b", 7L), ("b", 7L), ("b", 7L), ("b", 9L))
    val out = Quantiles.madOutliers(df.toDF("g", "v"), "v", Seq("g"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((10L, 5L, 2L, 1L)))
    assert(out("b") == ((4L, 7L, 0L, 1L)))
  }

  test("sketch quantiles are partitioning-invariant") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(2000)(i =>
      ("g", math.abs(rnd.nextLong()) % 500000L)).toDF("g", "v")
    val one = Quantiles.quantileReport(df.coalesce(1), "v", Seq("g"),
      Seq(500, 990)).collect().map(_.toSeq).toSet
    val many = Quantiles.quantileReport(df.repartition(7), "v", Seq("g"),
      Seq(500, 990)).collect().map(_.toSeq).toSet
    assert(one == many)
  }
}
