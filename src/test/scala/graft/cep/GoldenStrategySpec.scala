package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import GoldenUtil._
import Pattern._

/** Golden ports of `/root/reference/tests/test_strategy.py` (3 tests): the
  * three after-match skip strategies on the same input (6 / 3 / 1 matches).
  */
class GoldenStrategySpec extends AnyFunSuite {

  private def query(strategy: AfterMatchStrategy): CepQuery =
    CepQuery(
      Combine(Contiguity.Relaxed,
        lpatInf("b", "e", "name == 2", Contiguity.Relaxed, 1),
        spat("c", "e", "name == 3")),
      schemaINP, strategy)

  private val input = eventsOf((2, 0), (2, 1), (2, 2), (3, 0))

  test("NoSkip") {
    val out = runQuery(query(AfterMatchStrategy.NoSkip), input)
    assert(fancyRepr(out) ==
      """b: e(1,2,0), e(2,2,1), e(3,2,2); c: e(4,3,0)
b: e(1,2,0), e(2,2,1); c: e(4,3,0)
b: e(1,2,0); c: e(4,3,0)
b: e(2,2,1), e(3,2,2); c: e(4,3,0)
b: e(2,2,1); c: e(4,3,0)
b: e(3,2,2); c: e(4,3,0)""")
  }

  test("SkipToNext") {
    val out = runQuery(query(AfterMatchStrategy.SkipToNext), input)
    assert(fancyRepr(out) ==
      """b: e(1,2,0), e(2,2,1), e(3,2,2); c: e(4,3,0)
b: e(2,2,1), e(3,2,2); c: e(4,3,0)
b: e(3,2,2); c: e(4,3,0)""")
  }

  test("SkipPastLastEvent") {
    val out = runQuery(query(AfterMatchStrategy.SkipPastLastEvent), input)
    assert(fancyRepr(out) ==
      """b: e(1,2,0), e(2,2,1), e(3,2,2); c: e(4,3,0)""")
  }
}
