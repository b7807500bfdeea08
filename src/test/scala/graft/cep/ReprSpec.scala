package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import Pattern._

/** Pattern pretty-printer matches the reference's `ast_repr` format
  * (verified against strings produced by `/root/reference`'s repr of the
  * same shapes).
  */
class ReprSpec extends AnyFunSuite {
  test("repr formats") {
    assert(Pattern.repr(spat("a1", "e", "name == 1 and price < 4")) ==
      "a1:e:[name == 1 and price < 4]")
    assert(Pattern.repr(
      lpat("al", "e", "name == 1", Contiguity.Relaxed, 2, 3)) ==
      "al:e:[name == 1]_∘{2,3}")
    assert(Pattern.repr(
      lpatInf("al", "e", "name == 1", Contiguity.NdRelaxed, 2,
        Some("X + price >= 6"))) ==
      "al:e:[name == 1]_⊙{2,inf}U(X + price >= 6)")
    assert(Pattern.repr(
      Combine(Contiguity.Strict, spat("a", "e", "name == 1"),
        spat("b", "e", "name == 2"))) ==
      "a:e:[name == 1]⋅b:e:[name == 2]")
    assert(Pattern.repr(
      GpatTimes(Gpat(spat("a", "e", "True")), 2, 3)) ==
      "((a:e:[True])){2,3}")
    // precedence parens: output must re-parse to the same AST
    val mixed = Expr.parse("(name == 1 or name == 2) and price < 4")
    val rendered = Pattern.repr(Spat("a", "e", mixed))
    assert(rendered == "a:e:[(name == 1 or name == 2) and price < 4]")
    val negSum = Expr.Neg(Expr.Arith("+", Expr.Ref("a"), Expr.Ref("b")))
    assert(Pattern.repr(Spat("x", "e", negSum)) == "x:e:[-(a + b)]")
    val q = CepQuery(spat("a", "e", "True"),
      Vector("e" -> Vector("id")), AfterMatchStrategy.SkipToNext)
    assert(q.toString == "SkipToNext(a:e:[True])")
  }
}
