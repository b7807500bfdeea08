package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` must make `polyhash`
  * callable from plain SQL. Owns its session (extensions bind at session
  * creation; forked tests run suites sequentially so no other session is
  * active).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-installed polyhash works from SQL") {
    val s = SparkSession.builder()
      .master("local[1]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val v = s.sql("SELECT polyhash('ab', 31) AS h").collect()(0).getLong(0)
      assert(v == ('a' * 31L + 'b') % 1000000007L)
      // usable inside larger SQL (views / expressions)
      val n = s.sql(
        "SELECT count(*) AS n FROM (SELECT polyhash(x, 131) AS h FROM " +
          "VALUES ('a'), ('b'), ('a') AS t(x)) GROUP BY h ORDER BY n DESC")
        .collect().map(_.getLong(0)).toSeq
      assert(n == Seq(2L, 1L))
    } finally s.stop()
  }
}
