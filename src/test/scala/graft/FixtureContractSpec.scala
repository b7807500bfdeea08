package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Fixture-schema contract: pins the EXACT Spark-read schema of every
  * driver-generated testdata table this engine consumes.
  *
  * Exists because the driver regenerated fixtures between rounds 5 and 6
  * with `ts` flipped timestamp[ns] → timestamp[us] (TIMESTAMP_NTZ), and
  * nothing screamed: three registry queries silently crashed for two full
  * rounds (VERDICT r7). Any future drift must fail HERE, in `sbt test`,
  * with a message naming the drifted column — not downstream as an
  * unresolvable-expression AnalysisException in some query.
  *
  * Also pins the `Queries.normalizeTs` canonicalization: after `table()`,
  * `ts` is long epoch micros whose values match the raw NTZ wall-clock
  * read (micros since the epoch literal), independent of session timezone.
  */
class FixtureContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** table → (column, raw Spark read type SQL string), in file order. */
  private val contract: Map[String, Seq[(String, String)]] = Map(
    "events" -> Seq("event_id" -> "BIGINT", "ts" -> "TIMESTAMP_NTZ",
      "user_id" -> "BIGINT", "event_type" -> "STRING", "value" -> "DOUBLE",
      "props" -> "STRING"),
    "lineitem" -> Seq("l_orderkey" -> "BIGINT", "l_partkey" -> "BIGINT",
      "l_suppkey" -> "BIGINT", "l_linenumber" -> "INT",
      "l_quantity" -> "DOUBLE", "l_extendedprice" -> "DOUBLE",
      "l_discount" -> "DOUBLE", "l_tax" -> "DOUBLE",
      "l_returnflag" -> "STRING", "l_linestatus" -> "STRING",
      "l_shipdate" -> "TIMESTAMP_NTZ"),
    "orders" -> Seq("o_orderkey" -> "BIGINT", "o_custkey" -> "BIGINT",
      "o_orderstatus" -> "STRING", "o_totalprice" -> "DOUBLE",
      "o_orderdate" -> "TIMESTAMP_NTZ", "o_orderpriority" -> "STRING"),
    "customer" -> Seq("c_custkey" -> "BIGINT", "c_name" -> "STRING",
      "c_nationkey" -> "INT", "c_acctbal" -> "DOUBLE",
      "c_mktsegment" -> "STRING"),
    "supplier" -> Seq("s_suppkey" -> "BIGINT", "s_name" -> "STRING",
      "s_nationkey" -> "INT", "s_acctbal" -> "DOUBLE"),
    "part" -> Seq("p_partkey" -> "BIGINT", "p_name" -> "STRING",
      "p_brand" -> "STRING", "p_type" -> "STRING", "p_size" -> "INT",
      "p_retailprice" -> "DOUBLE"),
    "nation" -> Seq("n_nationkey" -> "INT", "n_name" -> "STRING",
      "n_regionkey" -> "INT"),
    "region" -> Seq("r_regionkey" -> "INT", "r_name" -> "STRING"),
    "documents" -> Seq("doc_id" -> "BIGINT", "text" -> "STRING",
      "lang" -> "STRING", "source" -> "STRING", "n_chars" -> "BIGINT"),
    "embeddings" -> Seq("vec_id" -> "BIGINT",
      "embedding" -> "ARRAY<FLOAT>", "label" -> "INT"))

  for ((name, expect) <- contract.toSeq.sortBy(_._1))
    test(s"testdata table `$name` matches the pinned schema") {
      val got = spark.read.parquet(s"$sfDir/$name.parquet")
        .schema.fields.map(f => f.name -> f.dataType.sql).toSeq
      assert(got == expect,
        s"\nFIXTURE SCHEMA DRIFT in $name.parquet —\n  pinned: $expect\n" +
          s"  read:   $got\nThe driver regenerated testdata with a new " +
          "schema. Update Queries/oracles for every drifted column (see " +
          "FIXTURES.md drift note), then re-pin here.")
    }

  test("normalizeTs canonicalizes events.ts to long epoch micros " +
    "(timezone-independent)") {
    val df = Queries.table(spark, sfDir, "events")
    val f = df.schema.fields.find(_.name == "ts").get
    assert(f.dataType == LongType, s"ts normalized to ${f.dataType.sql}")
    // ground truth from the raw NTZ read: micros since the epoch literal
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("min(timestampdiff(MICROSECOND, " +
        "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))")
      .head().getLong(0)
    val got = df.selectExpr("min(ts)").head().getLong(0)
    assert(got == raw, s"normalized min(ts)=$got != raw micros $raw")
    // sanity: fixture epoch is 2024-01-01T00:00Z ≤ ts < 2030 — micros, not
    // nanos/millis/seconds (a unit slip moves this by 1000x)
    assert(got >= 1704067200000000L && got < 1900000000000000L,
      s"min(ts)=$got is not plausible epoch MICROS for the 2024 fixture")
  }

  test("normalizeTs fails LOUDLY on an unknown ts type") {
    val bad = spark.range(3).selectExpr("CAST(id AS STRING) AS ts")
    val e = intercept[IllegalStateException] {
      Queries.normalizeTs(bad, "scratch")
    }
    assert(e.getMessage.contains("FIXTURE SCHEMA DRIFT"))
    assert(e.getMessage.contains("STRING"))
  }

  test("normalizeTs accepts the legacy long-nanos read (floor to micros)") {
    val ns = spark.range(1).selectExpr(
      "CAST(1704067798778549123 AS BIGINT) AS ts")
    val got = Queries.normalizeTs(ns, "scratch").head().getLong(0)
    assert(got == 1704067798778549L)
  }

  test("normalizeTs rejects a long ts too small to be nanos (ADVICE r8)") {
    // if the driver regenerates the fixture with ts already in MICROS,
    // the legacy /1000 rescale would silently shift every timestamp
    // 1000x — the magnitude guard must fail loudly at runtime instead
    val us = spark.range(1).selectExpr(
      "CAST(1704067798778549 AS BIGINT) AS ts") // 2024 in micros
    val e = intercept[Exception] {
      Queries.normalizeTs(us, "scratch").head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("FIXTURE SCHEMA DRIFT")),
      s"expected a FIXTURE SCHEMA DRIFT failure, got: $e")
  }
}
