package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import GoldenUtil._
import Pattern._

/** Golden ports of `/root/reference/tests/test_group.py` (4 tests). */
class GoldenGroupSpec extends AnyFunSuite {

  private def childAB: Pattern =
    Combine(Contiguity.Strict,
      spat("a", "e", "name == 1"), spat("b", "e", "name == 2"))

  test("gpat hello") {
    val q = CepQuery(Gpat(childAB), schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (2, 0), (1, 2), (2, 8)))
    assert(fancyRepr(out) ==
      """a: e(2,1,5); b: e(3,2,0)
a: e(4,1,2); b: e(5,2,8)""")
  }

  test("gpat loop times") {
    val q = CepQuery(GpatTimes(childAB, 2, 3), schemaINP)
    val out =
      runQuery(q, eventsOf((1, 0), (2, 5), (1, 0), (2, 2), (1, 0), (2, 2), (2, 8)))
    assert(fancyRepr(out) ==
      """a: e(1,1,0), e(3,1,0); b: e(2,2,5), e(4,2,2)
a: e(1,1,0), e(3,1,0), e(5,1,0); b: e(2,2,5), e(4,2,2), e(6,2,2)
a: e(3,1,0), e(5,1,0); b: e(4,2,2), e(6,2,2)""")
  }

  test("gpat loop inf") {
    val q = CepQuery(GpatInf(childAB, 2), schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (2, 5), (1, 0), (2, 2), (1, 0), (2, 2),
      (1, 0), (2, 5), (1, 8)))
    assert(fancyRepr(out) ==
      """a: e(1,1,0), e(3,1,0); b: e(2,2,5), e(4,2,2)
a: e(1,1,0), e(3,1,0), e(5,1,0); b: e(2,2,5), e(4,2,2), e(6,2,2)
a: e(3,1,0), e(5,1,0); b: e(4,2,2), e(6,2,2)
a: e(1,1,0), e(3,1,0), e(5,1,0), e(7,1,0); b: e(2,2,5), e(4,2,2), e(6,2,2), e(8,2,5)
a: e(3,1,0), e(5,1,0), e(7,1,0); b: e(4,2,2), e(6,2,2), e(8,2,5)
a: e(5,1,0), e(7,1,0); b: e(6,2,2), e(8,2,5)""")
  }

  test("gpat loop inf until") {
    val q = CepQuery(GpatInf(childAB, 2, Some(Expr.parse("price > 5"))),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (2, 5), (1, 0), (2, 2), (1, 7), (2, 2),
      (1, 0), (2, 5), (1, 8)))
    assert(fancyRepr(out) ==
      """a: e(1,1,0), e(3,1,0); b: e(2,2,5), e(4,2,2)""")
  }
}
