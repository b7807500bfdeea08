package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import GoldenUtil._
import Pattern._

/** The state-explosion safety valve: nd-relaxed run sets past the cap fail
  * loudly; bounded patterns run unaffected under the same cap.
  */
class MaxRunsSpec extends AnyFunSuite {

  test("nd-relaxed growth trips the cap; capped strict run is unaffected") {
    val stream = eventsOf(Seq.fill(30)((1, 0)): _*)
    val nd = CepQuery(
      lpatInf("a", "e", "name == 1", Contiguity.NdRelaxed, 1), schemaINP)
    val exNd = new Executor(DstCompiler.compile(nd), nd.strategy, Some(100))
    exNd.reset()
    val e = intercept[IllegalStateException] {
      stream.foreach(exNd.feed)
    }
    assert(e.getMessage.contains("maxRuns=100"))

    val strict = CepQuery(
      lpat("a", "e", "name == 1", Contiguity.Strict, 2, 2), schemaINP)
    val exS = new Executor(DstCompiler.compile(strict), strict.strategy,
      Some(100))
    exS.reset()
    val out = stream.flatMap(exS.feed)
    assert(out.length == 29) // sliding pairs, never near the cap
  }
}
