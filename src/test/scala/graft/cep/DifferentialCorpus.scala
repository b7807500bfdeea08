package graft.cep

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Shared loader for the reference-engine differential corpora
  * (`tools/gen_differential.py` and `tools/gen_differential_long.py`):
  * gzipped JSONL of `{id, query: <yaml>, input: [[type, name, price]...],
  * expected: <reference MatchStream repr>}`.
  */
object DifferentialCorpus {

  def loadCases(resource: String)
      : Iterator[(Int, String, Vector[(String, Int, Int)], String)] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"differential corpus $resource missing — " +
      "run the matching tools/gen_differential*.py")
    val gz = new java.util.zip.GZIPInputStream(in)
    scala.io.Source.fromInputStream(gz, "UTF-8").getLines().map { line =>
      val j = JsonMethods.parse(line)
      val id = (j \ "id") match { case JInt(v) => v.toInt; case _ => -1 }
      val JString(query) = (j \ "query"): @unchecked
      val JString(expected) = (j \ "expected"): @unchecked
      val input = (j \ "input") match {
        case JArray(evs) => evs.map {
          case JArray(List(JString(t), JInt(n), JInt(p))) =>
            (t, n.toInt, p.toInt)
          case other => sys.error(s"bad input $other")
        }.toVector
        case other => sys.error(s"bad input list $other")
      }
      (id, query, input, expected)
    }
  }

  /** Run every case through the pure executor and return the first
    * few divergences (empty = all matched) plus the case count.
    */
  def runAll(resource: String): (Int, Seq[String]) = {
    var n = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    loadCases(resource).foreach { case (id, queryYaml, input, expected) =>
      n += 1
      val q = YamlQuery.fromYaml(queryYaml)
      val events = input.zipWithIndex.map { case ((t, nm, pr), i) =>
        Event(t, Vector("id" -> (i + 1).toLong, "name" -> nm.toLong,
          "price" -> pr.toLong))
      }
      val got = GoldenUtil.streamRepr(CepOperator.run(q, events))
      if (got != expected && failures.length < 5)
        failures += s"case $id (${input.length} events):\n" +
          s"  query: ${queryYaml.replace("\n", " | ")}\n" +
          s"  expected: ${expected.take(500)}\n  got:      ${got.take(500)}"
    }
    (n, failures.toSeq)
  }
}
