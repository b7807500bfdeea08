package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import GoldenUtil._
import Pattern._

/** Golden ports of `/root/reference/tests/test_cornercase.py` (5 tests):
  * ε/optional/until interactions. The inline-YAML regressions go through our
  * YAML loader, which also exercises it.
  */
class GoldenCornerSpec extends AnyFunSuite {

  test("corner case 01: lpat nd-relaxed 2..5") {
    val q = CepQuery(
      lpat("p", "e", "name == 1", Contiguity.NdRelaxed, 2, 5), schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (1, 1), (1, 2)))
    assert(fancyRepr(out) ==
      """p: e(1,1,0), e(2,1,1)
p: e(1,1,0), e(2,1,1), e(3,1,2)
p: e(1,1,0), e(3,1,2)
p: e(2,1,1), e(3,1,2)""")
  }

  test("circ until") {
    val q = YamlQuery.fromYaml(
      """
type: "query"
patseq:
  type: "combine"
  contiguity: "relaxed"
  left:
    type: "spat"
    name: "c"
    event: "e"
    cndt:
      expr: name == 3
  right:
    type: "lpat-inf"
    name: "a"
    event: "e"
    cndt:
      expr: name == 1
    loop:
      contiguity: relaxed
      from: 1
    until:
      expr: name == 2
context:
  schema:
    e: ["id", "name", "price"]
""")
    val out = runQuery(q, eventsOf((3, 0), (2, 0), (1, 0), (1, 0)))
    assert(fancyRepr(out) ==
      """c: e(1,3,0); a: e(3,1,0)
c: e(1,3,0); a: e(3,1,0), e(4,1,0)""")
  }

  test("circ until optional") {
    val q = CepQuery(
      Combine(Contiguity.Relaxed,
        spat("c", "e", "name == 3"),
        lpatInf("a", "e", "name == 1", Contiguity.Relaxed, 0,
          Some("name == 2"))),
      schemaINP)
    val out = runQuery(q, eventsOf((3, 0), (2, 0), (1, 0), (1, 0)))
    assert(fancyRepr(out) ==
      """c: e(1,3,0)
c: e(1,3,0); a: e(3,1,0)
c: e(1,3,0); a: e(3,1,0), e(4,1,0)""")
  }

  test("circ lpat n-m until optional") {
    // `until` on a bounded lpat is accepted but (as in the reference
    // compiler, compile.py:73-205) has no effect — only lpat-inf/gpat-inf
    // apply the rewrite.
    val q = CepQuery(
      Combine(Contiguity.Relaxed,
        spat("c", "e", "name == 3"),
        lpat("a", "e", "name == 1", Contiguity.Relaxed, 0, 1)),
      schemaINP)
    val out = runQuery(q, eventsOf((3, 0), (2, 0), (1, 0), (1, 0)))
    assert(fancyRepr(out) ==
      """c: e(1,3,0)
c: e(1,3,0); a: e(3,1,0)""")
  }

  test("nested until") {
    val q = CepQuery(
      GpatInf(
        Gpat(lpatInf("a", "e", "name == 1", Contiguity.Relaxed, 1)),
        1, Some(Expr.parse("name == 3"))),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (1, 0), (3, 0), (1, 0), (2, 0), (3, 0)))
    assert(fancyRepr(out) ==
      """a: e(1,1,0)
a: e(1,1,0), e(2,1,0)
a: e(1,1,0), e(2,1,0)
a: e(2,1,0)
a: e(4,1,0)""")
  }
}
