package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A/B lab for the capped n-gram Jaccard pair pipeline (round-18
  * optimization forensics): each variant recomputes the same output;
  * wall-clock compared within one JVM, caches cleared between runs.
  */
object JaccardLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Queries.table(spark, "/root/testdata/sf0.1", "documents")
    docs.count()

    val idCol = "doc_id"; val textCol = "text"
    val n = 3; val simMilli = 500; val maxShingleFreq = 64L

    // codegen shingle index: explode + PolyHash expression (no Row boundary)
    def idxCodegen: DataFrame =
      docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
        .select(col(idCol).cast(LongType).as(idCol),
          explode(graft.ops.DedupOps.shingles(col(textCol), n)).as("s"))
        .select(col(idCol), graft.ops.DedupOps.tokenHash60(col("s")).as("sh"))

    def idxMapPartitions: DataFrame =
      graft.ops.DedupOps.shingleIndex(docs, idCol, textCol, n)

    // tail shared by all variants: cap, cache, self-join, counts, filter
    def tail(idx: DataFrame, viaGroupBy: Boolean,
        joinFreq2: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val filtered =
        if (!viaGroupBy)
          idx.withColumn("freq", count(lit(1)).over(
            Window.partitionBy(col("sh"))))
            .filter(col("freq") <= maxShingleFreq)
        else {
          val freqs = idx.groupBy(col("sh"))
            .agg(count(lit(1)).as("freq"))
            .filter(col("freq") <= maxShingleFreq)
          idx.join(freqs, "sh")
        }
      val idx2 = filtered.cache()
      val counts = idx2.groupBy(col(idCol))
        .agg(count(lit(1)).as("n_sh"))
      val joinIn = if (joinFreq2) idx2.filter(col("freq") >= 2L) else idx2
      joinIn.as("a").join(joinIn.as("b"), col("a.sh") === col("b.sh"))
        .filter(col(s"a.$idCol") < col(s"b.$idCol"))
        .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
        .groupBy(col("id1"), col("id2"))
        .agg(count(lit(1)).as("inter"))
        .join(counts.select(col(idCol).as("id1"), col("n_sh").as("n1")), "id1")
        .join(counts.select(col(idCol).as("id2"), col("n_sh").as("n2")), "id2")
        .withColumn("uni", col("n1") + col("n2") - col("inter"))
        .filter(col("inter") * 1000 >= col("uni") * simMilli)
        .select(col("id1"), col("id2"), col("inter"), col("uni"))
    }

    def current(): DataFrame = graft.ops.DedupOps.ngramJaccardPairs(
      docs, idCol, textCol, n, simMilli, maxShingleFreq)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "v0_current" -> (() => current()),
      "v1_groupby_freq" -> (() => tail(idxMapPartitions, viaGroupBy = true,
        joinFreq2 = false)),
      "v2_codegen_idx" -> (() => tail(idxCodegen, viaGroupBy = false,
        joinFreq2 = false)),
      "v3_codegen_groupby" -> (() => tail(idxCodegen, viaGroupBy = true,
        joinFreq2 = false)),
      "v4_codegen_groupby_freq2" -> (() => tail(idxCodegen,
        viaGroupBy = true, joinFreq2 = true)),
      "v5_freq2_only" -> (() => tail(idxMapPartitions, viaGroupBy = false,
        joinFreq2 = true)),
    )
    for (r <- 1 to 3; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val c = graft.ops.CacheScope.withCaches(spark) { f().count() }
      println(f"JLAB $name%-26s round$r: $c%6d pairs " +
        f"${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
