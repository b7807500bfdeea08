package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sketch-vs-exact scale probe: the log-bucket quantile sketch against
  * `percentile_disc`, and the HLL register profile against
  * `count(DISTINCT)`, at row counts far beyond the fixtures — the two
  * claims worth evidence are (a) wall-clock: the sketch aggregations
  * beat the sort/shuffle-based exacts as values-per-group grows, and
  * (b) error: the one-sided quantile error stays ≤ 1/32 and the HLL
  * estimate lands inside its ~6.5% (m=256) standard error.
  *
  * Data: deterministic skewed longs — value = hash² mod range so the
  * histogram is zipf-ish dense at the low end (many occupied buckets,
  * the realistic shape), across 5 groups of very different sizes
  * (1:2:4:8:16) to exercise the hot-group case that breaks the exact
  * percentile's per-group value buffer.
  *
  * Usage: DriveSketchScale [threads] [nRows] [stageSubstr]
  * Stages: sketch_quantiles, exact_quantiles, audit, hll, exact_distinct.
  * `exact_quantiles` at probe scale is EXPECTED to OOM the executor
  * (hot group's value buffer) which kills a local SparkContext — run it
  * as its own invocation, that failure is the finding.
  */
object DriveSketchScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(50000000L)
    val only = args.drop(2).headOption
    def enabled(stage: String) = only.forall(stage.contains)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"SKETCH_SCALE n=$n threads=$threads " +
      s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")

    val df = spark.range(n).toDF("id")
      // group g with |g| ∝ 2^g: the hot-group shape
      .withColumn("g", concat(lit("g"), floor(log2(pmod(
        hash(col("id") * 7 + 1), lit(31)) + 1)).cast("int")))
      .withColumn("v", pmod(
        hash(col("id") * 13 + 5).cast("long") *
          hash(col("id") * 13 + 5).cast("long"), lit(1000000000L)))
      .select("g", "v")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warm the input path once so both contenders read warmed caches
    time("materialize input")(df.write.mode("overwrite")
      .parquet("/tmp/sketch_scale_input"))
    val in = spark.read.parquet("/tmp/sketch_scale_input")

    def sketchQuantiles(d: org.apache.spark.sql.DataFrame) = {
      val cells = graft.ops.Quantiles.quantileSketch(d, "v", Seq("g"))
      val c = cells.count()
      println(s"  sketch cells: $c")
      graft.ops.Quantiles.rankPick(cells, Seq("g"), "qb", Seq(500, 990))
        .withColumn("est_v", graft.ops.Quantiles.repCol("__picked"))
        .drop("__picked")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
        .toMap
    }
    def exactQuantiles(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) " +
          "AS BIGINT)").as("p500"),
        expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY v) " +
          "AS BIGINT)").as("p990"))
        .collect().flatMap(r => Seq((r.getString(0), 500L) -> r.getLong(1),
          (r.getString(0), 990L) -> r.getLong(2))).toMap

    if (enabled("sketch_quantiles"))
      time(s"quantile sketch n=$n")(sketchQuantiles(in))
    if (enabled("exact_quantiles"))
      // the exact aggregate buffers every value per group — at probe
      // scale the hot group's buffer blows the executor heap, which in
      // local mode takes the SparkContext with it: run this stage alone
      scala.util.Try(time(s"percentile_disc n=$n")(exactQuantiles(in)))
        .fold(e => println(s"percentile_disc n=$n FAILED: " +
          s"${e.getClass.getSimpleName} (per-group value buffer)"),
          _ => ())
    if (enabled("audit")) {
      // error-bound audit at a size the exact side survives
      val nSmall = n / 10
      val small = in.limit(nSmall.toInt).cache()
      small.count()
      val skS = time(s"quantile sketch n=$nSmall")(sketchQuantiles(small))
      val exS = time(s"percentile_disc n=$nSmall")(exactQuantiles(small))
      small.unpersist()
      exS.foreach { case (k @ (g, q), ex) =>
        val est = skS(k)
        require(est <= ex && ex - est <= math.max(1L, est / 32L),
          s"quantile error bound violated at $g/$q: est=$est exact=$ex")
      }
      println(s"quantile one-sided ≤1/32 bound held on ${exS.size} points")
    }

    // time the sketch WITHOUT its audit column (hllReport bundles the
    // exact count for the oracle; here the contenders race separately)
    val m = graft.ops.Sketches.hllM
    if (enabled("hll")) locally {
      val est = time("hll registers (sketch)") {
      val regs = graft.ops.Sketches
        .hllSketch(in.select(col("v").cast("string").as("k")), "k")
        .collect().map(r => r.getLong(1))
      val d = regs.map(r => 1L << (graft.ops.Sketches.hllK - r.toInt)).sum
      ((m.toLong * m * (1L << graft.ops.Sketches.hllK) / d) *
        graft.ops.Sketches.hllAlphaMicro(m)) / 1000000L
    }
      val cd = time("count distinct (exact)") {
        in.agg(countDistinct(col("v"))).collect()(0).getLong(0)
      }
      val errPct = 100.0 * (est - cd) / cd
      println(f"hll est=$est exact=$cd err=$errPct%.2f%%")
      require(math.abs(est - cd) <= cd / 5, "hll outside 20% of exact")
    }
    spark.stop()
  }
}
