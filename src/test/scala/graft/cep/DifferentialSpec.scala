package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Differential test: 27,783 generated cases (pattern-shape × contiguity ×
  * loop bounds × until × skip-strategy × 2 inputs — the same cross-product
  * families the reference validates against real FlinkCEP) with expected
  * outputs produced by the reference engine itself
  * (`tools/gen_differential.py`). Every case must match exactly, including
  * match order.
  */
class DifferentialSpec extends AnyFunSuite {

  private def loadCases()
      : Iterator[(Int, String, Vector[(String, Int, Int)], String)] = {
    val in = getClass.getResourceAsStream("/differential/cases.jsonl.gz")
    require(in != null, "differential corpus missing — run tools/gen_differential.py")
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
          case other => fail(s"bad input $other")
        }.toVector
        case other => fail(s"bad input list $other")
      }
      (id, query, input, expected)
    }
  }

  test("all differential cases match the reference engine output exactly") {
    var n = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    loadCases().foreach { case (id, queryYaml, input, expected) =>
      n += 1
      val q = YamlQuery.fromYaml(queryYaml)
      val events = input.zipWithIndex.map { case ((t, nm, pr), i) =>
        Event(t, Vector("id" -> (i + 1).toLong, "name" -> nm.toLong,
          "price" -> pr.toLong))
      }
      val got = GoldenUtil.streamRepr(CepOperator.run(q, events))
      if (got != expected && failures.length < 5)
        failures += s"case $id:\n  query: ${queryYaml.replace("\n", " | ")}\n  expected: $expected\n  got:      $got"
    }
    assert(failures.isEmpty,
      s"${failures.length}+ of $n cases diverged:\n${failures.mkString("\n")}")
    info(s"$n cases matched")
  }
}
