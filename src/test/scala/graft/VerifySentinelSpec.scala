package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** VERDICT r7 #3 done-criterion: a query that crashes inside the Verify
  * dump must show up as a COUNTABLE artifact (a `_FAILED_<name>` sentinel
  * + an `errors.json` entry), never as a silently vanished key — and a
  * later healthy run into the same outDir must clear the stale sentinel,
  * so reused artifact directories stay self-consistent.
  */
class VerifySentinelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val good: (SparkSession, String) => DataFrame =
    (s, dir) => Queries.table(s, dir, "nation")
  private val crash: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("deliberate test failure")

  test("a crashed query leaves a countable sentinel; a fixed rerun " +
    "clears it") {
    val out = Files.createTempDirectory("verify-sentinel").toString

    val failed = Verify.runAll(spark, sfDir, out,
      Seq("ok_query" -> good, "bad_query" -> crash))
    assert(failed.keySet == Set("bad_query"))
    assert(failed("bad_query").contains("deliberate test failure"))
    val sentinel = Paths.get(s"$out/_FAILED_bad_query")
    assert(Files.exists(sentinel), "no countable failure artifact")
    assert(Files.readString(sentinel).contains("deliberate test failure"))
    assert(Files.exists(Paths.get(s"$out/ok_query")),
      "healthy query's dump missing")
    assert(!Files.exists(Paths.get(s"$out/_FAILED_ok_query")))
    Verify.writeJson(s"$out/errors.json", failed)
    assert(Files.readString(Paths.get(s"$out/errors.json"))
      .contains("bad_query"))

    // the bug is fixed; the same outDir must not keep reporting failure
    val failed2 = Verify.runAll(spark, sfDir, out,
      Seq("bad_query" -> good))
    assert(failed2.isEmpty)
    assert(!Files.exists(sentinel),
      "stale sentinel survived a healthy rerun — reused outDir would " +
        "report a fixed query as failed")
    assert(Files.exists(Paths.get(s"$out/bad_query")))
  }
}
