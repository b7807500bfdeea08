package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import GoldenUtil._
import Pattern._

/** Golden ports of `/root/reference/tests/test_basic.py` (11 tests): spat
  * hello + all lpat/lpat-inf × contiguity × until combinations. Expected
  * strings are verbatim from the reference suite.
  */
class GoldenBasicSpec extends AnyFunSuite {

  test("hello (spat)") {
    val q = CepQuery(spat("a1", "e", "name == 1 and price < 4"), schemaNP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (2, 0), (1, 2), (1, 8)))
    assert(streamRepr(out) == "[{'a1': [e(1,1,0)]}, {'a1': [e(4,1,2)]}]")
  }

  test("lpat n-n strict") {
    val q = CepQuery(
      lpat("al", "e", "name == 1 and price < 4", Contiguity.Strict, 2, 2),
      schemaNP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (1, 1), (1, 2), (1, 3)))
    assert(streamRepr(out) ==
      "[{'al': [e(3,1,1), e(4,1,2)]}, {'al': [e(4,1,2), e(5,1,3)]}]")
  }

  test("lpat n-m strict") {
    val q = CepQuery(
      lpat("al", "e", "name == 1 and price < 4", Contiguity.Strict, 2, 3),
      schemaNP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (1, 1), (1, 2), (1, 3)))
    assert(streamRepr(out) ==
      "[{'al': [e(3,1,1), e(4,1,2)]}, {'al': [e(3,1,1), e(4,1,2), e(5,1,3)]}, {'al': [e(4,1,2), e(5,1,3)]}]")
  }

  test("lpat n-m relaxed") {
    val q = CepQuery(
      lpat("al", "e", "name == 1", Contiguity.Relaxed, 2, 3), schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (2, 1), (1, 2)))
    assert(streamRepr(out) ==
      "[{'al': [e(1,1,0), e(2,1,5)]}, {'al': [e(1,1,0), e(2,1,5), e(4,1,2)]}, {'al': [e(2,1,5), e(4,1,2)]}]")
  }

  test("lpat n-m nd-relaxed") {
    val q = CepQuery(
      lpat("al", "e", "name == 1 and price < 4", Contiguity.NdRelaxed, 2, 3),
      schemaNP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (1, 1), (1, 2)))
    assert(streamRepr(out) ==
      "[{'al': [e(1,1,0), e(3,1,1)]}, {'al': [e(1,1,0), e(3,1,1), e(4,1,2)]}, {'al': [e(1,1,0), e(4,1,2)]}, {'al': [e(3,1,1), e(4,1,2)]}]")
  }

  test("lpat n-m iterative condition") {
    val q = CepQuery(
      lpat("al", "e", "X + price <= 5", Contiguity.Strict, 2, 3,
        Vector(varDef("X", 0, "X + price"))),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 1), (1, 4), (1, 1), (1, 2), (1, 3)))
    for (m <- out) {
      val sum = m.collectFirst { case ("al", evs) => evs.map(_("price")).sum }
      assert(sum.exists(_ <= 5))
    }
    assert(streamRepr(out) ==
      "[{'al': [e(1,1,1), e(2,1,4)]}, {'al': [e(2,1,4), e(3,1,1)]}, {'al': [e(3,1,1), e(4,1,2)]}, {'al': [e(4,1,2), e(5,1,3)]}]")
  }

  test("lpat n-inf strict") {
    val q = CepQuery(
      lpatInf("al", "e", "name == 1 and price < 4", Contiguity.Strict, 2),
      schemaNP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)))
    for (m <- out) assert(m.head._2.length >= 2)
    assert(streamRepr(out) ==
      "[{'al': [e(3,1,1), e(4,1,2)]}, {'al': [e(3,1,1), e(4,1,2), e(5,1,3)]}, {'al': [e(4,1,2), e(5,1,3)]}, {'al': [e(3,1,1), e(4,1,2), e(5,1,3), e(6,1,3)]}, {'al': [e(4,1,2), e(5,1,3), e(6,1,3)]}, {'al': [e(5,1,3), e(6,1,3)]}]")
  }

  test("lpat n-inf relaxed") {
    val q = CepQuery(
      lpatInf("al", "e", "name == 1 and price < 4", Contiguity.Relaxed, 2),
      schemaNP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)))
    assert(streamRepr(out) ==
      "[{'al': [e(1,1,0), e(3,1,1)]}, {'al': [e(1,1,0), e(3,1,1), e(4,1,2)]}, {'al': [e(3,1,1), e(4,1,2)]}, {'al': [e(1,1,0), e(3,1,1), e(4,1,2), e(5,1,3)]}, {'al': [e(3,1,1), e(4,1,2), e(5,1,3)]}, {'al': [e(4,1,2), e(5,1,3)]}, {'al': [e(1,1,0), e(3,1,1), e(4,1,2), e(5,1,3), e(6,1,3)]}, {'al': [e(3,1,1), e(4,1,2), e(5,1,3), e(6,1,3)]}, {'al': [e(4,1,2), e(5,1,3), e(6,1,3)]}, {'al': [e(5,1,3), e(6,1,3)]}]")
  }

  test("lpat n-inf nd-relaxed") {
    val q = CepQuery(
      lpatInf("al", "e", "name == 1 and price < 4", Contiguity.NdRelaxed, 3),
      schemaNP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)))
    for (m <- out) assert(m.head._2.length >= 3)
    assert(streamRepr(out) ==
      "[{'al': [e(1,1,0), e(3,1,1), e(4,1,2)]}, {'al': [e(1,1,0), e(3,1,1), e(4,1,2), e(5,1,3)]}, {'al': [e(1,1,0), e(3,1,1), e(5,1,3)]}, {'al': [e(1,1,0), e(4,1,2), e(5,1,3)]}, {'al': [e(3,1,1), e(4,1,2), e(5,1,3)]}, {'al': [e(1,1,0), e(3,1,1), e(4,1,2), e(5,1,3), e(6,1,3)]}, {'al': [e(1,1,0), e(3,1,1), e(4,1,2), e(6,1,3)]}, {'al': [e(1,1,0), e(3,1,1), e(5,1,3), e(6,1,3)]}, {'al': [e(1,1,0), e(3,1,1), e(6,1,3)]}, {'al': [e(1,1,0), e(4,1,2), e(5,1,3), e(6,1,3)]}, {'al': [e(1,1,0), e(4,1,2), e(6,1,3)]}, {'al': [e(1,1,0), e(5,1,3), e(6,1,3)]}, {'al': [e(3,1,1), e(4,1,2), e(5,1,3), e(6,1,3)]}, {'al': [e(3,1,1), e(4,1,2), e(6,1,3)]}, {'al': [e(3,1,1), e(5,1,3), e(6,1,3)]}, {'al': [e(4,1,2), e(5,1,3), e(6,1,3)]}]")
  }

  test("lpat n-inf until strict") {
    val q = CepQuery(
      lpatInf("al", "e", "name == 1 and price < 4", Contiguity.Strict, 2,
        Some("X + price >= 6"), Vector(varDef("X", 0, "X + price"))),
      schemaNP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)))
    for (m <- out) {
      assert(m.head._2.length >= 2)
      assert(m.head._2.map(_("price")).sum < 6)
    }
    assert(streamRepr(out) ==
      "[{'al': [e(3,1,1), e(4,1,2)]}, {'al': [e(4,1,2), e(5,1,3)]}]")
  }

  test("lpat n-inf until relaxed") {
    val q = CepQuery(
      lpatInf("al", "e", "name == 1 and price < 4", Contiguity.Relaxed, 2,
        Some("X + price >= 6"), Vector(varDef("X", 0, "X + price"))),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)))
    assert(streamRepr(out) ==
      "[{'al': [e(1,1,0), e(3,1,1)]}, {'al': [e(1,1,0), e(3,1,1), e(4,1,2)]}, {'al': [e(3,1,1), e(4,1,2)]}, {'al': [e(4,1,2), e(5,1,3)]}]")
  }

  test("lpat n-inf until nd-relaxed") {
    val q = CepQuery(
      lpatInf("al", "e", "name == 1 and price < 4", Contiguity.NdRelaxed, 2,
        Some("X + price >= 6"), Vector(varDef("X", 0, "X + price"))),
      schemaNP)
    val out = runQuery(q, eventsOf((1, 0), (1, 5), (1, 1), (1, 2), (1, 3), (1, 3)))
    assert(streamRepr(out) ==
      "[{'al': [e(1,1,0), e(3,1,1)]}, {'al': [e(1,1,0), e(3,1,1), e(4,1,2)]}, {'al': [e(1,1,0), e(4,1,2)]}, {'al': [e(3,1,1), e(4,1,2)]}, {'al': [e(1,1,0), e(3,1,1), e(5,1,3)]}, {'al': [e(1,1,0), e(4,1,2), e(5,1,3)]}, {'al': [e(1,1,0), e(5,1,3)]}, {'al': [e(3,1,1), e(5,1,3)]}, {'al': [e(4,1,2), e(5,1,3)]}, {'al': [e(1,1,0), e(3,1,1), e(6,1,3)]}, {'al': [e(1,1,0), e(4,1,2), e(6,1,3)]}, {'al': [e(1,1,0), e(6,1,3)]}, {'al': [e(3,1,1), e(6,1,3)]}, {'al': [e(4,1,2), e(6,1,3)]}]")
  }
}
