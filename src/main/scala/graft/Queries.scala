package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cep._
import graft.cep.SparkCep.CepSpec

/** The query registry behind `SparkEntry.queries` / `oracleSql`.
  *
  * Every entry returns a *deterministically ordered* DataFrame whose column
  * names and types match its DuckDB oracle exactly (the driver sorts columns
  * by name and hashes values — see the builder contract). Monetary doubles
  * are reduced to exact integer cents via `decimal(18,2) * 100 → bigint` on
  * both sides so float-summation order can never flip a hash.
  */
object Queries {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries timestamp[ns] (TESTDATA schema), which Spark 4
    // rejects by default; read it as long (we never consume ts directly).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events → CEP event model mapping (FIXTURES.md §3): keyed by user,
    * ordered by the monotone event_id, `value` visible to conditions as a
    * truncated long.
    */
  private val eventSpec =
    CepSpec(Some("user_id"), "event_id", "event_type", Seq("value"))

  private val eventSchema: Vector[(String, Vector[String])] = Vector(
    "click" -> Vector("event_id", "value"),
    "purchase" -> Vector("event_id", "value"),
    "error" -> Vector("event_id", "value"),
    "signup" -> Vector("event_id", "value"),
    "view" -> Vector("event_id", "value"))

  private def cep(spark: SparkSession, dir: String, q: CepQuery): DataFrame =
    SparkCep.matchPattern(table(spark, dir, "events"), q, eventSpec)

  /** array<long> → "1,2,3" (string ids survive any hash comparison). */
  private def idsCol(c: String) =
    expr(s"array_join(transform($c, x -> cast(x as string)), ',')")

  // =======================================================================
  // CEP queries over the events table — one per operator of SURVEY.md §2.
  // =======================================================================

  /** §2 #1 spat: single purchase below 40. */
  def cepSpatPurchase(spark: SparkSession, dir: String): DataFrame =
    cep(spark, dir,
      CepQuery(Pattern.spat("a", "purchase", "value < 40"), eventSchema))
      .select(col("user_id"), element_at(col("a"), 1).as("a_id"))
      .orderBy("user_id", "a_id")

  val cepSpatPurchaseSql: String =
    """SELECT user_id, event_id AS a_id FROM events
      |WHERE event_type = 'purchase' AND CAST(FLOOR(value) AS BIGINT) < 40
      |ORDER BY user_id, a_id""".stripMargin

  /** §2 #4+#11 combine strict: signup immediately followed by purchase. */
  def cepNextSignupPurchase(spark: SparkSession, dir: String): DataFrame =
    cep(spark, dir,
      CepQuery(
        Pattern.Combine(Contiguity.Strict,
          Pattern.spat("a", "signup", "True"),
          Pattern.spat("b", "purchase", "True")),
        eventSchema))
      .select(col("user_id"), element_at(col("a"), 1).as("a_id"),
        element_at(col("b"), 1).as("b_id"))
      .orderBy("user_id", "a_id")

  val cepNextSignupPurchaseSql: String =
    """SELECT user_id, event_id AS a_id, next_id AS b_id FROM (
      |  SELECT user_id, event_id, event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type,
      |    LEAD(event_id)   OVER (PARTITION BY user_id ORDER BY event_id) AS next_id
      |  FROM events) t
      |WHERE event_type = 'signup' AND next_type = 'purchase'
      |ORDER BY user_id, a_id""".stripMargin

  /** §2 #2+#11 lpat strict {3,3}: three consecutive clicks (every window). */
  def cepLpatStrictClicks(spark: SparkSession, dir: String): DataFrame =
    cep(spark, dir,
      CepQuery(
        Pattern.lpat("a", "click", "True", Contiguity.Strict, 3, 3),
        eventSchema))
      .select(col("user_id"), element_at(col("a"), 1).as("a1"),
        element_at(col("a"), 2).as("a2"), element_at(col("a"), 3).as("a3"))
      .orderBy("user_id", "a1")

  val cepLpatStrictClicksSql: String =
    """SELECT user_id, event_id AS a1, i1 AS a2, i2 AS a3 FROM (
      |  SELECT user_id, event_id, event_type,
      |    LEAD(event_type, 1) OVER w AS t1, LEAD(event_id, 1) OVER w AS i1,
      |    LEAD(event_type, 2) OVER w AS t2, LEAD(event_id, 2) OVER w AS i2
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)) t
      |WHERE event_type = 'click' AND t1 = 'click' AND t2 = 'click'
      |ORDER BY user_id, a1""".stripMargin

  /** §2 #2+#12 lpat relaxed {2,2}: consecutive pairs in the per-user
    * subsequence of cheap purchases (relaxed skips only non-matching events).
    */
  def cepLpatRelaxedPurchasePairs(spark: SparkSession, dir: String): DataFrame =
    cep(spark, dir,
      CepQuery(
        Pattern.lpat("a", "purchase", "value < 40", Contiguity.Relaxed, 2, 2),
        eventSchema))
      .select(col("user_id"), element_at(col("a"), 1).as("a1"),
        element_at(col("a"), 2).as("a2"))
      .orderBy("user_id", "a1")

  val cepLpatRelaxedPurchasePairsSql: String =
    """SELECT user_id, a1, a2 FROM (
      |  SELECT user_id, event_id AS a1,
      |    LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS a2
      |  FROM events
      |  WHERE event_type = 'purchase' AND CAST(FLOOR(value) AS BIGINT) < 40) t
      |WHERE a2 IS NOT NULL
      |ORDER BY user_id, a1""".stripMargin

  /** §2 #2+#13 lpat nd-relaxed {2,2}: *all* ordered pairs of clicks. */
  def cepNdRelaxedClickPairs(spark: SparkSession, dir: String): DataFrame =
    cep(spark, dir,
      CepQuery(
        Pattern.lpat("a", "click", "True", Contiguity.NdRelaxed, 2, 2),
        eventSchema))
      .select(col("user_id"), element_at(col("a"), 1).as("a1"),
        element_at(col("a"), 2).as("a2"))
      .orderBy("user_id", "a1", "a2")

  val cepNdRelaxedClickPairsSql: String =
    """SELECT a.user_id AS user_id, a.event_id AS a1, b.event_id AS a2
      |FROM (SELECT user_id, event_id FROM events WHERE event_type = 'click') a
      |JOIN (SELECT user_id, event_id FROM events WHERE event_type = 'click') b
      |  ON a.user_id = b.user_id AND b.event_id > a.event_id
      |ORDER BY 1, 2, 3""".stripMargin

  /** §2 #6 gpat-times {2,2} of (signup · purchase): four consecutive events
    * alternating signup/purchase — exercises group unrolling.
    */
  def cepGpatTimesSp2(spark: SparkSession, dir: String): DataFrame =
    cep(spark, dir,
      CepQuery(
        Pattern.GpatTimes(
          Pattern.Combine(Contiguity.Strict,
            Pattern.spat("a", "signup", "True"),
            Pattern.spat("b", "purchase", "True")),
          2, 2),
        eventSchema))
      .select(col("user_id"), element_at(col("a"), 1).as("a1"),
        element_at(col("b"), 1).as("b1"), element_at(col("a"), 2).as("a2"),
        element_at(col("b"), 2).as("b2"))
      .orderBy("user_id", "a1")

  val cepGpatTimesSp2Sql: String =
    """SELECT user_id, event_id AS a1, i1 AS b1, i2 AS a2, i3 AS b2 FROM (
      |  SELECT user_id, event_id, event_type,
      |    LEAD(event_type, 1) OVER w AS t1, LEAD(event_id, 1) OVER w AS i1,
      |    LEAD(event_type, 2) OVER w AS t2, LEAD(event_id, 2) OVER w AS i2,
      |    LEAD(event_type, 3) OVER w AS t3, LEAD(event_id, 3) OVER w AS i3
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)) t
      |WHERE event_type = 'signup' AND t1 = 'purchase'
      |  AND t2 = 'signup' AND t3 = 'purchase'
      |ORDER BY user_id, a1""".stripMargin

  /** §2 #16 SkipPastLastEvent: greedy non-overlapping consecutive click
    * pairs (each accept clears all partial runs).
    */
  def cepSkipPastClickPairs(spark: SparkSession, dir: String): DataFrame =
    cep(spark, dir,
      CepQuery(
        Pattern.lpat("a", "click", "True", Contiguity.Strict, 2, 2),
        eventSchema, AfterMatchStrategy.SkipPastLastEvent))
      .select(col("user_id"), element_at(col("a"), 1).as("a1"),
        element_at(col("a"), 2).as("a2"))
      .orderBy("user_id", "a1")

  val cepSkipPastClickPairsSql: String =
    """WITH seqd AS (
      |  SELECT user_id, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS seq
      |  FROM events),
      |clicks AS (
      |  SELECT user_id, event_id, seq,
      |    row_number() OVER (PARTITION BY user_id ORDER BY seq) AS rn
      |  FROM seqd WHERE event_type = 'click'),
      |segs AS (
      |  SELECT user_id, event_id, seq, seq - rn AS seg,
      |    row_number() OVER (PARTITION BY user_id, seq - rn ORDER BY seq) AS prn
      |  FROM clicks),
      |paired AS (
      |  SELECT user_id, event_id AS a1, prn,
      |    LEAD(event_id) OVER (PARTITION BY user_id, seg ORDER BY seq) AS a2
      |  FROM segs)
      |SELECT user_id, a1, a2 FROM paired
      |WHERE prn % 2 = 1 AND a2 IS NOT NULL
      |ORDER BY user_id, a1""".stripMargin

  /** §2 #9 iterative condition: 2–3 consecutive purchases whose running
    * value-sum stays ≤ 100 (per-take register fold).
    */
  def cepIterBudget(spark: SparkSession, dir: String): DataFrame =
    cep(spark, dir,
      CepQuery(
        Pattern.lpat("a", "purchase", "X + value <= 100", Contiguity.Strict,
          2, 3, Vector(Pattern.varDef("X", 0, "X + value"))),
        eventSchema))
      .select(col("user_id"), idsCol("a").as("ids"))
      .orderBy("user_id", "ids")

  val cepIterBudgetSql: String =
    """WITH w AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(value) AS BIGINT) AS v0,
      |    LEAD(event_type, 1) OVER w1 AS t1, LEAD(event_id, 1) OVER w1 AS i1,
      |    CAST(FLOOR(LEAD(value, 1) OVER w1) AS BIGINT) AS v1,
      |    LEAD(event_type, 2) OVER w1 AS t2, LEAD(event_id, 2) OVER w1 AS i2,
      |    CAST(FLOOR(LEAD(value, 2) OVER w1) AS BIGINT) AS v2
      |  FROM events WINDOW w1 AS (PARTITION BY user_id ORDER BY event_id))
      |SELECT user_id, CAST(event_id AS VARCHAR) || ',' || CAST(i1 AS VARCHAR) AS ids
      |FROM w WHERE event_type = 'purchase' AND t1 = 'purchase'
      |  AND v0 <= 100 AND v0 + v1 <= 100
      |UNION ALL
      |SELECT user_id,
      |  CAST(event_id AS VARCHAR) || ',' || CAST(i1 AS VARCHAR) || ',' || CAST(i2 AS VARCHAR)
      |FROM w WHERE event_type = 'purchase' AND t1 = 'purchase' AND t2 = 'purchase'
      |  AND v0 <= 100 AND v0 + v1 <= 100 AND v0 + v1 + v2 <= 100
      |ORDER BY user_id, ids""".stripMargin

  /** §2 #3+#10+#15 lpat-inf + until + SkipToNext (rows-only check: the
    * NoSkip/SkipToNext×until semantics are pinned by the golden suites;
    * no simple SQL equivalent).
    */
  def cepUntilErrorRuns(spark: SparkSession, dir: String): DataFrame =
    cep(spark, dir,
      CepQuery(
        Pattern.Combine(Contiguity.Relaxed,
          Pattern.spat("s", "signup", "True"),
          Pattern.lpatInf("p", "purchase", "value < 40", Contiguity.Relaxed,
            1, Some("value >= 400"))),
        eventSchema, AfterMatchStrategy.SkipToNext))
      .select(col("user_id"), element_at(col("s"), 1).as("s_id"),
        idsCol("p").as("p_ids"))
      .orderBy("user_id", "s_id", "p_ids")

  // =======================================================================
  // Relational queries (Spark built-ins; exact-integer outputs for hashing)
  // =======================================================================

  /** Exact cents: double → decimal(18,2) → ×100 → bigint (both engines). */
  private def cents(c: String) =
    (col(c).cast(DecimalType(18, 2)) * 100).cast(LongType)

  /** TPC-H Q1-style pricing summary (scan → partial agg → final agg). */
  def relQ1Pricing(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(cents("l_quantity")).as("sum_qty_c"),
        sum(cents("l_extendedprice")).as("sum_price_c"),
        sum(cents("l_discount")).as("sum_disc_c"))
      .orderBy("l_returnflag", "l_linestatus")

  val relQ1PricingSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |  CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_qty_c,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_price_c,
      |  CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_disc_c
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: 3-way join, revenue top-10. The customer filter is a
    * broadcast-able dimension side.
    */
  def relQ3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val orders = table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey")
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), cents("l_extendedprice").as("price_c"))
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("price_c")).as("revenue_c"))
      .orderBy(col("revenue_c").desc, col("o_orderkey"))
      .limit(10)
  }

  val relQ3TopOrdersSql: String =
    """SELECT o_orderkey,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_c
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey
      |ORDER BY revenue_c DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** Broadcast dimension join: per-nation customer stats. */
  def relNationStats(spark: SparkSession, dir: String): DataFrame = {
    val nation = table(spark, dir, "nation").select(
      col("n_nationkey"), col("n_name"))
    table(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"), sum(cents("c_acctbal")).as("bal_c"))
      .orderBy("n_name")
  }

  val relNationStatsSql: String =
    """SELECT n_name, count(*) AS cnt,
      |  CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS bal_c
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Window ranking: top-3 orders per customer by price (deterministic
    * tie-break on orderkey).
    */
  def relWindowTop3(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(cents("o_totalprice").desc, col("o_orderkey"))
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        cents("o_totalprice").as("price_c"),
        row_number().over(w).cast(LongType).as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy("o_custkey", "rnk")
  }

  val relWindowTop3Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
      |  rnk
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) DESC,
      |               o_orderkey) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3
      |ORDER BY o_custkey, rnk""".stripMargin

  // =======================================================================
  // Registry
  // =======================================================================

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cep_spat_purchase" -> cepSpatPurchase _,
    "cep_next_signup_purchase" -> cepNextSignupPurchase _,
    "cep_lpat_strict_clicks" -> cepLpatStrictClicks _,
    "cep_lpat_relaxed_purchase_pairs" -> cepLpatRelaxedPurchasePairs _,
    "cep_ndrelaxed_click_pairs" -> cepNdRelaxedClickPairs _,
    "cep_gpat_times_sp2" -> cepGpatTimesSp2 _,
    "cep_skip_past_click_pairs" -> cepSkipPastClickPairs _,
    "cep_iter_budget" -> cepIterBudget _,
    "cep_until_error_runs" -> cepUntilErrorRuns _,
    "rel_q1_pricing" -> relQ1Pricing _,
    "rel_q3_top_orders" -> relQ3TopOrders _,
    "rel_nation_stats" -> relNationStats _,
    "rel_window_top3" -> relWindowTop3 _
  )

  val oracles: Map[String, String] = Map(
    "cep_spat_purchase" -> cepSpatPurchaseSql,
    "cep_next_signup_purchase" -> cepNextSignupPurchaseSql,
    "cep_lpat_strict_clicks" -> cepLpatStrictClicksSql,
    "cep_lpat_relaxed_purchase_pairs" -> cepLpatRelaxedPurchasePairsSql,
    "cep_ndrelaxed_click_pairs" -> cepNdRelaxedClickPairsSql,
    "cep_gpat_times_sp2" -> cepGpatTimesSp2Sql,
    "cep_skip_past_click_pairs" -> cepSkipPastClickPairsSql,
    "cep_iter_budget" -> cepIterBudgetSql,
    "rel_q1_pricing" -> relQ1PricingSql,
    "rel_q3_top_orders" -> relQ3TopOrdersSql,
    "rel_nation_stats" -> relNationStatsSql,
    "rel_window_top3" -> relWindowTop3Sql
  )
}
