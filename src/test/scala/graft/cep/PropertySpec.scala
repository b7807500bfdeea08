package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants over random patterns and streams — semantic
  * laws that must hold regardless of shape (complementing the exact
  * differential corpus):
  *
  *  - every bound event satisfies its take condition and type;
  *  - strict-lpat bindings are consecutive in arrival order;
  *  - bindings are strictly increasing in arrival order;
  *  - SkipToNext / SkipPastLastEvent emit subsequences of NoSkip;
  *  - loop bindings respect the declared bounds.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus bridge in
    * the offline dependency set).
    */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val schema = Vector("e" -> Vector("id", "name", "price"))

  private val streamGen: Gen[Vector[Event]] =
    Gen.chooseNum(0, 14).flatMap { len =>
      Gen.listOfN(len, Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(0, 9)))
        .map(_.zipWithIndex.map { case ((n, p), i) =>
          Event("e", "id" -> (i + 1).toLong, "name" -> n.toLong,
            "price" -> p.toLong)
        }.toVector)
    }

  private val contGen: Gen[Contiguity] =
    Gen.oneOf(Contiguity.Strict, Contiguity.Relaxed, Contiguity.NdRelaxed)

  private val lpatGen: Gen[Pattern] = for {
    cont <- contGen
    nm <- Gen.oneOf((0, 3), (1, 3), (2, 2), (3, 3))
  } yield Pattern.lpat("al", "e", "name == 1", cont, nm._1, nm._2)

  test("bound events satisfy the take condition; ids strictly increase") {
    check(Prop.forAll(lpatGen, streamGen) { (pat, stream) =>
      val q = CepQuery(pat, schema)
      for (m <- CepOperator.run(q, stream); (_, evs) <- m) {
        assert(evs.forall(_("name") == 1L))
        val ids = evs.map(_("id"))
        assert(ids == ids.sorted && ids.distinct == ids)
      }
      true
    })
  }

  test("strict lpat bindings are consecutive; bounds respected") {
    check(Prop.forAll(Gen.oneOf((2, 2), (2, 3), (1, 3)), streamGen) {
      (nm, stream) =>
        val q = CepQuery(
          Pattern.lpat("al", "e", "name == 1", Contiguity.Strict, nm._1,
            nm._2), schema)
        for (m <- CepOperator.run(q, stream); (_, evs) <- m) {
          assert(evs.length >= nm._1 && evs.length <= nm._2)
          val ids = evs.map(_("id"))
          assert(ids.zip(ids.tail).forall { case (a, b) => b == a + 1 })
        }
        true
    })
  }

  test("skip strategies emit subsequences of NoSkip") {
    val patGen: Gen[Pattern] = Gen.oneOf(
      lpatGen,
      contGen.map(c => Pattern.Combine(c,
        Pattern.spat("a", "e", "name == 1"),
        Pattern.spat("b", "e", "name == 2"))))
    check(Prop.forAll(patGen, streamGen) { (pat, stream) =>
      val noSkip = CepOperator.run(
        CepQuery(pat, schema, AfterMatchStrategy.NoSkip), stream)
      for (strat <- Seq(AfterMatchStrategy.SkipToNext,
          AfterMatchStrategy.SkipPastLastEvent)) {
        val skipped = CepOperator.run(CepQuery(pat, schema, strat), stream)
        // subsequence check
        var i = 0
        for (m <- skipped) {
          val j = noSkip.indexOf(m, i)
          assert(j >= 0, s"$strat emitted a match NoSkip never emits")
          i = j + 1
        }
      }
      true
    })
  }

  test("relaxed match set contains the strict match set (same bounds)") {
    check(Prop.forAll(Gen.oneOf((2, 2), (2, 3)), streamGen) { (nm, stream) =>
      def run(c: Contiguity) = CepOperator.run(
        CepQuery(Pattern.lpat("al", "e", "name == 1", c, nm._1, nm._2),
          schema), stream).toSet
      assert(run(Contiguity.Strict).subsetOf(run(Contiguity.Relaxed)))
      assert(run(Contiguity.Relaxed).subsetOf(run(Contiguity.NdRelaxed)))
      true
    })
  }
}
