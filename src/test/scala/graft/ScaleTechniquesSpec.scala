package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The two scale techniques that are configuration + layout rather than
  * operators — bucketed co-located joins and skew salting — proven on
  * real plans, not just documented:
  *   - writing both join sides bucketed+sorted on the key makes the join
  *     exchange-free (the Exchange that the plain parquet join needs
  *     disappears);
  *   - the salted replicated join produces row-identical results to the
  *     plain join while its exchange keys carry the salt.
  */
class ScaleTechniquesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val warehouse = s"/tmp/graft-warehouse-${ProcessHandle.current.pid}"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir", warehouse)
      // deterministic plan shapes for the string assertions
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    if (spark != null) {
      spark.sql("DROP TABLE IF EXISTS graft_b1")
      spark.sql("DROP TABLE IF EXISTS graft_b2")
      spark.sql("DROP TABLE IF EXISTS graft_bev")
      spark.stop()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warehouse))
  }

  test("bucketed co-located join elides the shuffle the plain join needs") {
    val docs = Queries.table(spark, dir, "documents")
      .select("doc_id", "lang", "n_chars")
    docs.write.bucketBy(4, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("graft_b1")
    docs.write.bucketBy(4, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("graft_b2")

    val bucketed = spark.table("graft_b1")
      .join(spark.table("graft_b2"), "doc_id")
    val pb = bucketed.queryExecution.executedPlan.toString
    assert(pb.contains("SortMergeJoin"), "expected a sort-merge join")
    assert(!pb.contains("Exchange"),
      s"bucketed join still shuffles:\n$pb")
    assert(pb.contains("SelectedBucketsCount"), "bucketed scan not used")

    val plain = docs.join(
      Queries.table(spark, dir, "documents").select("doc_id", "source"),
      "doc_id")
    val pp = plain.queryExecution.executedPlan.toString
    assert(pp.contains("Exchange"),
      "control check: the plain parquet join should need an exchange")
    // and the results agree
    assert(bucketed.count() == plain.count())
  }

  test("bucketed events make the Catalyst CEP operator exchange-free") {
    // CepMatchExec DECLARES ClusteredDistribution(key) +
    // requiredChildOrdering(key, ord): a copy of events bucketed on
    // user_id and sorted by (user_id, event_id) must therefore plan with
    // ZERO Exchange end-to-end — the bucketed scan's HashPartitioning
    // satisfies the declared need (prepare's key cast folds away on the
    // already-long user_id). The plain parquet run of the identical
    // query is the control: it must shuffle, and both runs must match.
    val ev = Queries.table(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "value")
    ev.write.bucketBy(4, "user_id").sortBy("user_id", "event_id")
      .mode("overwrite").saveAsTable("graft_bev")

    val query = Queries.cepRegistryQueries("cep_lpat_strict_clicks")
    val bucketed = graft.cep.SparkCep.matchPatternExec(
      spark.table("graft_bev"), query, Queries.eventSpec)
    val pb = bucketed.queryExecution.executedPlan.toString
    assert(pb.contains("CepMatch"), s"exec operator not planned:\n$pb")
    assert(!pb.contains("Exchange"),
      s"bucketed CEP input still shuffles:\n$pb")

    val plain = graft.cep.SparkCep.matchPatternExec(ev, query,
      Queries.eventSpec)
    val pp = plain.queryExecution.executedPlan.toString
    assert(pp.contains("Exchange"),
      "control check: plain parquet CEP input should need an exchange")

    val a = bucketed.collect().map(_.toString).sorted.toVector
    val b = plain.collect().map(_.toString).sorted.toVector
    assert(a.nonEmpty && a == b,
      "bucketed and plain CEP runs diverged")
  }

  test("partitioned layout prunes partitions at the scan") {
    val out = s"$warehouse/docs_by_lang"
    Queries.table(spark, dir, "documents")
      .write.partitionBy("lang").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.matches(".*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang predicate not applied as a partition filter:\n$plan")
    // the pruned scan must agree with the unpartitioned filter
    val expected = Queries.table(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("lang") === "en").count()
    assert(back.count() == expected)
  }

  test("range join plans a hash equi-join, never a nested loop") {
    // broadcast is off and AQE is off (beforeAll), so a naive inequality
    // join here would have to plan CartesianProduct — the control check
    // proves that's what Spark does without the rewrite. The bucket
    // expansion must instead produce a plain equi-join exchange.
    val events = Queries.table(spark, dir, "events")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value"))
    val bands = Queries.table(spark, dir, "nation").select(
      org.apache.spark.sql.functions.col("n_nationkey").as("band_id"),
      (org.apache.spark.sql.functions.col("n_nationkey").cast("double")
        * 20d).as("lo"),
      (org.apache.spark.sql.functions.col("n_nationkey").cast("double")
        * 20d + 30d).as("hi"))

    val ranged = graft.ops.Skew.rangeJoin(events, "value", bands,
      "lo", "hi", bucketWidth = 32)
    val plan = ranged.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to a nested loop:\n$plan")
    assert(plan.contains("Join"), s"no join planned:\n$plan")

    val naive = events.join(bands,
      org.apache.spark.sql.functions.col("value") >=
        org.apache.spark.sql.functions.col("lo") &&
      org.apache.spark.sql.functions.col("value") <
        org.apache.spark.sql.functions.col("hi"))
    val pn = naive.queryExecution.executedPlan.toString
    assert(pn.contains("NestedLoop") || pn.contains("Cartesian"),
      "control check: the naive inequality join should be a nested loop")

    val a = ranged.select("event_id", "band_id", "value")
      .collect().map(_.toString).sorted.toVector
    val b = naive.select("event_id", "band_id", "value")
      .collect().map(_.toString).sorted.toVector
    assert(a.nonEmpty && a == b, "range join diverged from the naive join")
  }

  test("range join is exact on fractional bounds and boundary values") {
    val s = spark
    import s.implicits._
    // hi=20.5 at width 20: matches in bucket 1 above hi-1 would be lost
    // by a floor((hi-1)/w) upper replica bound — this pins floor(hi/w).
    // Also: v exactly at lo (inclusive), at hi (exclusive), inverted and
    // empty bands (match nothing), negative values.
    val probe = Seq(20.3, 19.0, 20.5, 0.0, -5.0, 39.999, 40.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("event_id", "value")
    val bands = Seq(
      (0L, 19.0, 20.5),   // fractional hi crossing a bucket boundary
      (1L, -10.0, 0.5),   // negative lo
      (2L, 40.0, 40.0),   // empty band — matches nothing
      (3L, 50.0, 30.0),   // inverted band — matches nothing
      (4L, 20.5, 40.0)    // lo on a fraction; hi on a bucket boundary
    ).toDF("band_id", "lo", "hi")
    val got = graft.ops.Skew.rangeJoin(probe, "value", bands,
        "lo", "hi", bucketWidth = 20)
      .select("event_id", "band_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set(
      (0L, 0L),  // 20.3 in [19.0, 20.5) — the (hi-1) trap
      (1L, 0L),  // 19.0 at lo: inclusive
      (2L, 4L),  // 20.5 at lo of band 4 (and NOT in band 0 — hi exclusive)
      (3L, 1L),  // 0.0 in [-10, 0.5)
      (4L, 1L),  // -5.0 negative value
      (5L, 4L))  // 39.999 < 40.0; 40.0 itself matches nothing
    assert(got == want, s"got $got")
  }

  test("salted join is row-identical to the plain join") {
    val orders = Queries.table(spark, dir, "orders")
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_custkey").as("custkey"))
    val cust = Queries.table(spark, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_custkey").as("custkey"),
        org.apache.spark.sql.functions.col("c_nationkey"))
    val salted = graft.ops.Skew.saltedJoin(orders, cust, Seq("custkey"),
      org.apache.spark.sql.functions.col("o_orderkey"), buckets = 8)
    val plain = orders.join(cust, "custkey")
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    val s = salted.collect().map(_.toString).sorted
    val p = plain.collect().map(_.toString).sorted
    assert(s.sameElements(p), "salted join diverged from the plain join")
    // the exchange key carries the salt — the hot key is now 8 sub-keys
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*hashpartitioning\\([^)]*__salt.*"),
      s"salt missing from the join exchange:\n$plan")
  }
}
