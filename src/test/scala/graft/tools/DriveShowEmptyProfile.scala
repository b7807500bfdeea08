package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cep._
import graft.cep.SparkCep.CepSpec

/** One-off stage profile for the show-empty pipeline (scratch; see
  * DriveShowEmptyScale for the kept probe).
  */
object DriveShowEmptyProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 2000000L
    val path = s"/tmp/graft_show_empty_scale_$n"
    val df = spark.read.parquet(path)
    val schema: Vector[(String, Vector[String])] = Vector(
      "click" -> Vector("event_id", "value"),
      "view" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"),
      "signup" -> Vector("event_id", "value"),
      "error" -> Vector("event_id", "value"))
    val st = CepSql.parseStatement(
      "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c, SUM(c.value) AS sv " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY user_id ORDER BY event_id TYPE event_type " +
        "DEFINE c AS click AFTER MATCH SKIP PAST LAST ROW", schema)
    val spec = st.spec
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s n=$r%9d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val m0 = SparkCep.matchPatternExec(df, st.query, spec)
    t("nfa-count")(m0.count())
    val m = m0.localCheckpoint(eager = true)
    t("checkpointed-count")(m.count())
    val names = SparkCep.patternNames(st.query.patseq)
    // spans coverage join alone
    val evProj = df.select(col("user_id"),
      col("event_id").cast("long").as("__site"))
    val spans = m.select(col("user_id"),
      array_min(concat(names.map(col): _*)).as("__s"),
      array_max(concat(names.map(col): _*)).as("__e"))
    val covers = spans.groupBy(col("user_id"))
      .agg(collect_list(struct(col("__s"), col("__e"))).as("__covers"))
    val sites = evProj.join(covers, Seq("user_id"), "left")
      .where(col("__covers").isNull ||
        !exists(col("__covers"), c =>
          c.getField("__s") <= col("__site") &&
            col("__site") <= c.getField("__e")))
      .drop("__covers")
    t("sites-count")(sites.count())
    // seed union + numbering window
    val emptyArr = array().cast("array<bigint>")
    val emptySeed = sites.select(col("user_id") +:
      names.map(nm => emptyArr.as(nm)) :+ col("__site").as("__anchor"): _*)
    val realSeed = m.select(col("user_id") +: names.map(col) :+
      array_min(concat(names.map(col): _*)).as("__anchor"): _*)
    val withNo = realSeed.unionByName(emptySeed).withColumn("match_no",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("__anchor") +: names.map(col): _*)))
    t("numbered-count")(withNo.count())
    // exploded
    val exploded = withNo.select(col("user_id"), col("match_no"),
      col("__anchor"),
      explode_outer(flatten(array(names.map(nm =>
        transform(col(nm), o => struct(lit(nm).as("nm"), o.as("ord")))): _*)))
        .as("__pr"))
    t("exploded-count")(exploded.count())
    t("full-count")(CepMeasures.run(df, st).count())
    spark.stop()
  }
}
