package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A/B lab for higher-order-function hot paths (round-18 optimization):
  * Spark HOFs (`filter`, `transform`, `aggregate`) are CodegenFallback —
  * the lambda evaluates interpreted per row/element. Measures exact
  * HOF-free reformulations against the current forms on the sf0.1
  * documents table, and asserts value-identity inline.
  */
object HofLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Queries
      .table(spark, "/root/testdata/sf0.1", "documents").cache()
    docs.count()

    val text = col("text")
    def tokensHof: Column = filter(split(text, " "), t => t =!= "")
    def tokensCg: Column = array_remove(split(text, " "), "")
    val stop = graft.ops.TextOps.stopwords
    def nStopHof(toks: Column): Column =
      size(filter(toks, t => lower(t).isin(stop.map(lit): _*))).cast(LongType)
    def charSumHof(toks: Column): Column =
      aggregate(transform(toks, t => length(t).cast(LongType)),
        lit(0L), (a, c) => a + c)
    def charSumCg: Column =
      length(regexp_replace(text, " ", "")).cast(LongType)
    def charSumCg2: Column =
      (length(text) -
        (length(text) - length(translate(text, " ", "")))).cast(LongType)

    // sanity: identical values
    val chk = docs.filter(text.isNotNull).select(
      size(tokensHof).as("a"), size(tokensCg).as("b"),
      charSumHof(tokensHof).as("c"), charSumCg.as("d"), charSumCg2.as("e"))
      .filter(col("a") =!= col("b") || col("c") =!= col("d") ||
        col("c") =!= col("e")).count()
    println(s"HLAB mismatches=$chk (must be 0)")

    def t(label: String)(c: => Column): Unit = {
      // amplify: 20 passes per measurement
      val t0 = System.nanoTime()
      var i = 0
      while (i < 20) {
        docs.select(sum(size(c)).as("s")).collect()
        i += 1
      }
      println(f"HLAB $label%-28s ${(System.nanoTime() - t0) / 20e9}%.3fs/pass")
    }
    def tl(label: String)(c: => Column): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 20) {
        docs.select(sum(c).as("s")).collect()
        i += 1
      }
      println(f"HLAB $label%-28s ${(System.nanoTime() - t0) / 20e9}%.3fs/pass")
    }
    for (r <- 1 to 2) {
      println(s"--- round $r ---")
      t("tokens_hof")(tokensHof)
      t("tokens_arrayremove")(tokensCg)
      tl("charsum_hof")(charSumHof(tokensHof))
      tl("charsum_regex")(charSumCg)
      tl("charsum_translate")(charSumCg2)
      tl("nstop_hof")(nStopHof(tokensHof))
      tl("qualityok_current")(
        graft.ops.TextOps.qualityOk(text).cast("long"))
      tl("explode_tf_hof") {
        lit(0L) // placeholder; measured below separately
      }
      // explode+agg shape (the tf pass)
      val t0 = System.nanoTime()
      var i = 0
      while (i < 5) {
        docs.select(col("doc_id"), explode(tokensHof).as("tok"))
          .groupBy("tok").count().select(sum("count")).collect()
        i += 1
      }
      println(f"HLAB explode_hof                  ${(System.nanoTime() - t0) / 5e9}%.3fs/pass")
      val t1 = System.nanoTime()
      i = 0
      while (i < 5) {
        docs.select(col("doc_id"), explode(tokensCg).as("tok"))
          .groupBy("tok").count().select(sum("count")).collect()
        i += 1
      }
      println(f"HLAB explode_arrayremove          ${(System.nanoTime() - t1) / 5e9}%.3fs/pass")
    }
    spark.stop()
  }
}
