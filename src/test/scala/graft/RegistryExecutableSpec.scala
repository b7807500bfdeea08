package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Registry-completeness gate: EVERY `SparkEntry.queries` entry must
  * execute end-to-end at sf0.001. A query that cannot run can never ship.
  *
  * Exists because rounds 6-7 shipped three registry queries that crashed
  * at plan time: nothing in `sbt test` exercised the registry as a whole,
  * and `Verify.scala` swallowed the crashes (VERDICT r7). This spec would
  * have failed on day one. Count-only — correctness vs the DuckDB oracle
  * is the driver's job; this pins *executability*.
  */
class RegistryExecutableSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("every query has an oracle (or is explicitly rows-only)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"registry queries without oracle SQL: ${missing.toSeq.sorted}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle SQL without a registry query: ${orphans.toSeq.sorted}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"registry query `$name` executes at sf0.001") {
      val n = graft.ops.CacheScope.withCaches(spark) {
        fn(spark, sfDir).count()
      }
      assert(n >= 0L) // count() itself is the gate; -ve impossible
    }
}
