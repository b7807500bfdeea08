package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.ops.{Codebooks, IncrementalDedup}

/** Builds the committed per-scale-factor persisted MinHash dedup
  * indexes (`Codebooks.dedupIndexRoot`) from each sf's documents
  * corpus (doc_id % 10 != 0 — the same corpus/batch split the
  * incremental registry rows use), hot-bucket cap 64. sf0.001 shares
  * sf0.01's index (identical documents table). Deterministic given the
  * corpus: signatures and band keys are seeded integer hashes, so
  * re-running reproduces the committed values (file names differ,
  * values do not).
  *
  *   Test/runMain graft.tools.BuildDedupIndex [sfDir ...]
  */
object BuildDedupIndex {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val out = Codebooks.dedupIndexPathFor(dir)
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 10 =!= 0)
      IncrementalDedup.writeIndex(corpus, "doc_id", "text", out,
        maxBucketSize = 64L)
      val nb = spark.read.parquet(s"$out/bands").count()
      val ns = spark.read.parquet(s"$out/sigs").count()
      println(s"INDEXED bands=$nb sigs=$ns at $out from $dir")
    }
    spark.stop()
  }
}
