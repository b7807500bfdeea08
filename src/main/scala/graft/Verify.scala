package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Run every query, dumping results to `outDir/<name>` parquet.
    *
    * A crashed query must leave a COUNTABLE artifact, not a vanished key:
    * in rounds 6-7 three queries crashed at plan time and a
    * catch-and-continue silently dropped them from the correctness report
    * for two rounds. Every failure writes a `_FAILED_<name>` sentinel
    * (exception class + message) and lands in the returned map (→
    * `errors.json`); a stale sentinel from an earlier run into the same
    * outDir is cleared before the query runs, so a fixed query cannot be
    * reported failed by leftover artifacts. Spec-pinned by
    * `VerifySentinelSpec` (VERDICT r7 #3 done-criterion).
    */
  private[graft] def runAll(spark: SparkSession, sfDir: String,
      outDir: String,
      queries: Iterable[(String, (SparkSession, String) => DataFrame)])
      : Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      Files.deleteIfExists(Paths.get(s"$outDir/_FAILED_$name"))
      // ops cache/checkpoint intermediates (shingle index, signatures, CC
      // rounds) for their own self-joins; the scope releases every block
      // persisted by the query once its result is written
      try graft.ops.CacheScope.withCaches(spark) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${e.getMessage}"
        failed(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        // A reused outDir may hold a stale (or partially overwritten)
        // result dir from an earlier run of this query; a driver keyed on
        // dir existence instead of sentinels would consume it. A failed
        // query leaves ONLY the failure artifact.
        deleteRecursively(Paths.get(s"$outDir/$name"))
        Files.writeString(Paths.get(s"$outDir/_FAILED_$name"), msg + "\n")
      }
    }
    failed.toMap
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively(_)) finally children.close()
      }
      Files.deleteIfExists(p)
    }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[graft] def writeJson(path: String,
      entries: Iterable[(String, String)]): Unit =
    Files.writeString(Paths.get(path),
      entries.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ran = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = runAll(spark, sfDir, outDir, ran)
    writeJson(s"$outDir/oracle_sql.json", SparkEntry.oracleSql)
    writeJson(s"$outDir/errors.json", failed)
    println(s"[verify] n_ok=${ran.size - failed.size} n_failed=${failed.size}" +
      s" n_total=${ran.size}" +
      (if (failed.isEmpty) "" else s" failed=${failed.keys.mkString(",")}"))
    // Exit 0 even with failures: the driver must still consume the good
    // parquet dumps; the _FAILED_ sentinels + errors.json carry the bad.
    spark.stop()
  }
}
