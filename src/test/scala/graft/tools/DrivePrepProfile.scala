package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Queries.table
import graft.ops.{CacheScope, Contamination, Packing, Sampling}
import graft.ops.TextOps

/** Stage-by-stage wall profile of pipeline_prep_shards at
  * SPARK_GRAFT_SF_DIR — isolates which stage carries the steady-state
  * cost (run twice; read the second block).
  */
object DrivePrepProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      CacheScope.withCaches(spark) {
        val docs = table(spark, dir, "documents")
        val bench = docs.filter(col("doc_id") % 10 === 7)
        val train = docs.filter(col("doc_id") % 10 =!= 7)
          .filter(TextOps.qualityOk(col("text")))
        val kept = Contamination.decontaminate(train, bench, "doc_id",
          "text", n = 5).cache()
        time("A kept (quality+decontam)")(kept.count())
        val scrubbed = Contamination
          .scrubDupPassages(kept, "doc_id", "text", n = 8, minDocs = 2)
          .filter(col("n_tokens") - col("n_removed") > 0L)
        time("B scrubbed")(scrubbed.count())
        val withLang = scrubbed.join(
          docs.select(col("doc_id").cast("long").as("doc_id"), col("lang")),
          "doc_id")
        val balanced = Sampling.quotaSample(withLang, "doc_id", "lang",
          Map("en" -> 60L), defaultQuota = 40L).cache()
        time("C balanced")(balanced.count())
        val packed = Packing.packGlobalByBudget(balanced, "doc_id",
          "clean_text", budgetTokens = 256L)
        time("D packed+join")(
          packed.join(balanced.select(col("doc_id"), col("lang")), "doc_id")
            .count())
      }
      time("E full query")(CacheScope.withCaches(spark) {
        graft.Queries.all("pipeline_prep_shards")(spark, dir).count()
      })
    }
    spark.stop()
  }
}
