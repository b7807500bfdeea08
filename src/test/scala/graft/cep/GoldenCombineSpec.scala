package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import GoldenUtil._
import Pattern._

/** Golden ports of `/root/reference/tests/test_combine.py` (5 tests). */
class GoldenCombineSpec extends AnyFunSuite {

  test("cat strict (hello)") {
    val q = CepQuery(
      Combine(Contiguity.Strict,
        spat("a", "e", "name == 1"), spat("b", "e", "name == 2")),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (2, 0), (1, 2), (2, 8)))
    assert(streamRepr(out) ==
      "[{'a': [e(2,1,5)], 'b': [e(3,2,0)]}, {'a': [e(4,1,2)], 'b': [e(5,2,8)]}]")
  }

  test("cat strict nested") {
    val q = CepQuery(
      Combine(Contiguity.Strict,
        Combine(Contiguity.Strict,
          spat("a", "e", "name == 1"), spat("b", "e", "name == 2")),
        spat("c", "e", "name == 3")),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (2, 0), (3, 2), (2, 8)))
    assert(streamRepr(out) ==
      "[{'a': [e(2,1,5)], 'b': [e(3,2,0)], 'c': [e(4,3,2)]}]")
  }

  test("cat strict looping") {
    val q = CepQuery(
      Combine(Contiguity.Strict,
        lpatInf("a", "e", "name == 1", Contiguity.NdRelaxed, 1),
        lpat("b", "e", "name == 2", Contiguity.Relaxed, 2, 3)),
      schemaINP)
    val out =
      runQuery(q, eventsOf((1, 0), (1, 5), (2, 0), (3, 2), (1, 8), (2, 8), (2, 8)))
    assert(out.map(dictRepr).mkString("\n") ==
      """{'a': [e(1,1,0), e(2,1,5)], 'b': [e(3,2,0), e(6,2,8)]}
{'a': [e(2,1,5)], 'b': [e(3,2,0), e(6,2,8)]}
{'a': [e(1,1,0), e(2,1,5), e(5,1,8)], 'b': [e(6,2,8), e(7,2,8)]}
{'a': [e(1,1,0), e(2,1,5)], 'b': [e(3,2,0), e(6,2,8), e(7,2,8)]}
{'a': [e(1,1,0), e(5,1,8)], 'b': [e(6,2,8), e(7,2,8)]}
{'a': [e(2,1,5), e(5,1,8)], 'b': [e(6,2,8), e(7,2,8)]}
{'a': [e(2,1,5)], 'b': [e(3,2,0), e(6,2,8), e(7,2,8)]}
{'a': [e(5,1,8)], 'b': [e(6,2,8), e(7,2,8)]}""")
  }

  test("cat relaxed") {
    val q = CepQuery(
      Combine(Contiguity.Relaxed,
        lpatInf("a", "e", "name == 1", Contiguity.NdRelaxed, 1),
        lpat("b", "e", "name == 2", Contiguity.Relaxed, 1, 3)),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (1, 1), (3, 0), (2, 0), (2, 1)))
    assert(streamRepr(out) ==
      "[{'a': [e(1,1,0), e(2,1,1)], 'b': [e(4,2,0)]}, {'a': [e(1,1,0)], 'b': [e(4,2,0)]}, {'a': [e(2,1,1)], 'b': [e(4,2,0)]}, {'a': [e(1,1,0), e(2,1,1)], 'b': [e(4,2,0), e(5,2,1)]}, {'a': [e(1,1,0)], 'b': [e(4,2,0), e(5,2,1)]}, {'a': [e(2,1,1)], 'b': [e(4,2,0), e(5,2,1)]}]")
  }

  test("cat nd-relaxed") {
    val q = CepQuery(
      Combine(Contiguity.NdRelaxed,
        lpatInf("a", "e", "name == 1", Contiguity.NdRelaxed, 1),
        lpat("b", "e", "name == 2", Contiguity.Relaxed, 1, 3)),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (1, 1), (3, 0), (2, 0), (2, 1)))
    assert(streamRepr(out) ==
      "[{'a': [e(1,1,0), e(2,1,1)], 'b': [e(4,2,0)]}, {'a': [e(1,1,0)], 'b': [e(4,2,0)]}, {'a': [e(2,1,1)], 'b': [e(4,2,0)]}, {'a': [e(1,1,0), e(2,1,1)], 'b': [e(4,2,0), e(5,2,1)]}, {'a': [e(1,1,0), e(2,1,1)], 'b': [e(5,2,1)]}, {'a': [e(1,1,0)], 'b': [e(4,2,0), e(5,2,1)]}, {'a': [e(1,1,0)], 'b': [e(5,2,1)]}, {'a': [e(2,1,1)], 'b': [e(4,2,0), e(5,2,1)]}, {'a': [e(2,1,1)], 'b': [e(5,2,1)]}]")
  }
}
