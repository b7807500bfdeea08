package graft.tools

import graft.cep._

/** Drives the SKIP TO anchor parse-time validation at the public
  * surface (`CepSql.parse`): malformed/unknown anchors must fail at
  * parse time with an actionable message; well-formed anchors must
  * still parse and execute.
  */
object DriveSkipToValidation {
  private val schema =
    Vector("A" -> Vector("id", "v"), "B" -> Vector("id", "v"))

  private def probe(tag: String, sql: String): Unit =
    try {
      val q = CepSql.parse(sql, schema)
      println(s"$tag OK strategy=${q.strategy}")
    } catch {
      case e: IllegalArgumentException =>
        println(s"${tag}_ERR ${e.getMessage.linesIterator.next()}")
    }

  def main(args: Array[String]): Unit = {
    // typo'd clauses that previously parsed as bare-TO sugar
    probe("FORGOTTEN_VAR",
      "PATTERN (a{2,2}~~) DEFINE a AS A AFTER MATCH SKIP TO FIRST")
    probe("TRAILING_JUNK",
      "PATTERN (a{2,2}~~) DEFINE a AS A AFTER MATCH SKIP TO NEXT ROWS")
    probe("UNKNOWN_ANCHOR",
      "PATTERN (a{2,2}~~) DEFINE a AS A AFTER MATCH SKIP TO z")
    probe("NEGATION_ANCHOR",
      "PATTERN (a ->!fby(n) b) DEFINE a AS A; b AS B; n AS B " +
        "AFTER MATCH SKIP TO FIRST n")
    // happy paths keep parsing and the query still RUNS
    probe("BARE_TO_OK",
      "PATTERN (a{2,2}~~) DEFINE a AS A AFTER MATCH SKIP TO a")
    val q = CepSql.parse(
      "PATTERN (a{2,2}~~) DEFINE a AS A AFTER MATCH SKIP TO LAST a",
      schema)
    val evs = Vector.tabulate(6)(i =>
      Event("A", Vector("id" -> i.toLong, "v" -> (i * 10L))))
    println(s"MATCHES=${CepOperator.run(q, evs).size}")
  }
}
