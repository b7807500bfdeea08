package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cep._

/** Scale probe for the MEASURES join-back (`CepMeasures.project` /
  * `allRows`): synthetic event streams through the funnel pattern at two
  * match densities, timing the measures projection and recording which
  * physical join AQE picks for the explode→events join — validating the
  * Scaladoc claim that the match side broadcasts at typical
  * selectivities and finding where it tips to a shuffle join. Also
  * reports the skew gauge's max live-run count, pinning that operator
  * state stays O(pattern runs), not O(events), when measures ride on
  * order ids alone.
  *
  * Usage: DriveMeasuresScale [threads] [nEvents]
  */
object DriveMeasuresScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("16")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(4000000L)

    val schema = Vector(
      "click" -> Vector("event_id", "value"),
      "view" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"),
      "signup" -> Vector("event_id", "value"))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq("value"))
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,2} -> p) " +
        "MEASURES FIRST(s) AS s_id, COUNT(c) AS n_c, SUM(c.value) AS " +
        "c_sum, AVG(c.value) AS c_avg, LAST(p) AS p_id " +
        "DEFINE s AS signup; c AS click; p AS purchase WITHIN 8", schema)

    /** type layout: dense = uniform {click,purchase,signup,view} (~1
      * match per ~13 events); sparse = signup 1-in-`rarity` (matches
      * rare — the typical production funnel shape).
      */
    def events(rarity: Int): DataFrame =
      spark.range(n).select(
        (col("id") % 4000).as("user_id"),
        col("id").as("event_id"),
        when(pmod(hash(col("id")), lit(rarity)) === 0, lit("signup"))
          .otherwise(element_at(
            array(lit("click"), lit("view"), lit("purchase")),
            (pmod(hash(col("id") * 31), lit(3)) + 1).cast("int")))
          .as("event_type"),
        pmod(col("id") * 40503, lit(500)).as("value"))

    def joinKind(plan: String): String =
      if (plan.contains("BroadcastHashJoin")) "broadcast"
      else if (plan.contains("SortMergeJoin")) "sortmerge"
      else if (plan.contains("ShuffledHashJoin")) "shuffledhash"
      else "none"

    /** Execute THIS DataFrame's own adaptive plan to completion and
      * report (rowCount, seconds, final join kind). `df.count()` would
      * spawn a separate QueryExecution and leave `df.queryExecution`'s
      * adaptive plan unfinalized — its static form always says
      * sortmerge, hiding the runtime broadcast conversion this probe
      * exists to observe.
      */
    def run(df: DataFrame): (Long, Double, String) = {
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      val rows = qe.executedPlan.execute().count()
      val sec = (System.nanoTime() - t0) / 1e9
      (rows, sec, joinKind(qe.executedPlan.toString))
    }

    for ((label, rarity) <- Seq("dense" -> 4, "sparse" -> 1000)) {
      val df = events(rarity)
      val skew = CepSkewAccumulator.registered(spark, s"meas_skew_$label")
      val frames = SparkCep.matchPatternExec(df, st.query, spec,
        skewAcc = Some(skew))
      val proj = CepMeasures.project(frames, df, st.query, spec,
        st.measures)
      val (matches, sec, join) = run(proj)
      val sk = skew.value
      println(f"MEASURES_SCALE config=$label events=$n matches=$matches " +
        f"seconds=$sec%.1f events_per_sec=${(n / sec).toLong} " +
        s"join=$join max_live_runs=${sk.maxRuns}")

      val ar = CepMeasures.allRows(frames, df, st.query, spec, st.measures)
      val (rows, sec1, join1) = run(ar)
      println(f"ALLROWS_SCALE config=$label rows=$rows seconds=$sec1%.1f " +
        s"join=$join1")
    }
    spark.stop()
  }
}
