package graft.cep

import org.scalatest.funsuite.AnyFunSuite

/** Negative patterns (`CombineNot` — FlinkCEP notNext/notFollowedBy,
  * beyond-parity): hand-verified semantics derived from FlinkCEP's
  * documented behavior. Each expected match set is worked out by hand in
  * the test comment; divergences from FlinkCEP are documented on
  * `DstCompiler.compileCombineNot`.
  */
class GoldenNegativeSpec extends AnyFunSuite {

  private val schema: Vector[(String, Vector[String])] =
    Vector("A" -> Vector("id", "v"), "B" -> Vector("id", "v"),
      "C" -> Vector("id", "v"))

  private def ev(tpe: String, id: Long, v: Long = 0L): Event =
    Event(tpe, Vector("id" -> id, "v" -> v))

  /** Matches as name -> bound event ids, in emission order. */
  private def run(q: CepQuery, events: Event*): Vector[Map[String, Vector[Long]]] =
    CepOperator.run(q, events.toVector)
      .map(_.toMap.view.mapValues(_.map(_("id"))).toMap)

  private def q(pat: Pattern): CepQuery = CepQuery(pat, schema)

  // ---------------------------------------------------------------- notNext

  test("notNext strict: an event matching both the head and the negated " +
    "condition kills the run (stop-state, not take)") {
    // x:A ⋅ !next(n:C[v < 0]) y:C — plain strict combine would match both
    val pat = Pattern.CombineNot(Contiguity.Strict,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "C", "v < 0"),
      Pattern.NegMode.NotNext,
      Pattern.spat("y", "C", "True"))
    assert(run(q(pat), ev("A", 1), ev("C", 2, v = 5)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(2L))))
    assert(run(q(pat), ev("A", 1), ev("C", 2, v = -1)) == Vector())
    // sanity: the unnegated combine DOES match the v = -1 stream
    val plain = Pattern.Combine(Contiguity.Strict,
      Pattern.spat("x", "A", "True"), Pattern.spat("y", "C", "True"))
    assert(run(q(plain), ev("A", 1), ev("C", 2, v = -1)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(2L))))
  }

  test("notNext relaxed: only the event IMMEDIATELY after the left match " +
    "is checked; later negated events pass") {
    // x:A ∘ !next(n:B) y:C
    val pat = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "B", "True"),
      Pattern.NegMode.NotNext,
      Pattern.spat("y", "C", "True"))
    // B immediately after A kills the run
    assert(run(q(pat), ev("A", 1), ev("B", 2), ev("C", 3)) == Vector())
    // B later (after a non-B ignorable) does NOT kill: A1, A2, B3, C4 —
    // run(A1): next is A2 (not B, ignored), B3 is past its guard and
    // ignorable, C4 taken -> match. run(A2): next is B3 -> killed.
    assert(run(q(pat), ev("A", 1), ev("A", 2), ev("B", 3), ev("C", 4)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(4L))))
    // no B at all: both runs match (emission in S/run order)
    assert(run(q(pat), ev("A", 1), ev("A", 2), ev("C", 3)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(3L)),
        Map("x" -> Vector(2L), "y" -> Vector(3L))))
  }

  test("notNext checks the CONDITION, not just the type") {
    // x:A ∘ !next(n:B[v > 10]) y:C — a mild B passes the guard
    val pat = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "B", "v > 10"),
      Pattern.NegMode.NotNext,
      Pattern.spat("y", "C", "True"))
    assert(run(q(pat), ev("A", 1), ev("B", 2, v = 5), ev("C", 3)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(3L))))
    assert(run(q(pat), ev("A", 1), ev("B", 2, v = 11), ev("C", 3)) ==
      Vector())
  }

  // ---------------------------------------------------------- notFollowedBy

  test("notFollowedBy relaxed: any negated event between left's match and " +
    "right's first take kills the run; events after the take are out of " +
    "scope") {
    // x:A ∘ !fby(n:B) y:C
    val pat = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "B", "True"),
      Pattern.NegMode.NotFollowedBy,
      Pattern.spat("y", "C", "True"))
    // B anywhere in the gap kills — immediate or not
    assert(run(q(pat), ev("A", 1), ev("B", 2), ev("C", 3)) == Vector())
    assert(run(q(pat), ev("A", 1), ev("A", 2), ev("B", 3), ev("C", 4)) ==
      Vector())
    // B after the C take is out of scope ("between two events")
    assert(run(q(pat), ev("A", 1), ev("C", 2), ev("B", 3)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(2L))))
    // clean gap matches
    assert(run(q(pat), ev("A", 1), ev("C", 2)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(2L))))
  }

  test("notFollowedBy composes with data registers (iterative negation)") {
    // x:A[s := v] ∘ !fby(n:B[v == s]) y:C — only a B echoing the A's
    // value kills the run
    val pat = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.Spat("x", "A", Expr.True,
        Vector(Pattern.varDef("s", 0L, "v"))),
      Pattern.negSpec("n", "B", "v == s"),
      Pattern.NegMode.NotFollowedBy,
      Pattern.spat("y", "C", "True"))
    assert(run(q(pat), ev("A", 1, v = 7), ev("B", 2, v = 5), ev("C", 3)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(3L))))
    assert(run(q(pat), ev("A", 1, v = 7), ev("B", 2, v = 7), ev("C", 3)) ==
      Vector())
  }

  test("notFollowedBy scope ends at right's FIRST take (multi-event right)") {
    // x:A ∘ !fby(n:B) y:C_∘{2,2} — B between the two C takes is out of
    // the not-scope (it is the lpat's own relaxed ignore from there on)
    val pat = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "B", "True"),
      Pattern.NegMode.NotFollowedBy,
      Pattern.lpat("y", "C", "True", Contiguity.Relaxed, 2, 2))
    assert(run(q(pat), ev("A", 1), ev("C", 2), ev("B", 3), ev("C", 4)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(2L, 4L))))
    assert(run(q(pat), ev("A", 1), ev("B", 2), ev("C", 3), ev("C", 4)) ==
      Vector())
  }

  test("notFollowedBy nd-relaxed: the ignore-fork run keeps its own " +
    "not-scope until ITS first take") {
    // x:A ⊙ !fby(n:B) y:C on A1 C2 B3 C4: the run that takes C2 matches
    // (scope closed before B3); the fork that ignored C2 is still
    // waiting, B3 kills it, so no (1,4) match
    val pat = Pattern.CombineNot(Contiguity.NdRelaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "B", "True"),
      Pattern.NegMode.NotFollowedBy,
      Pattern.spat("y", "C", "True"))
    assert(run(q(pat), ev("A", 1), ev("C", 2), ev("B", 3), ev("C", 4)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(2L))))
    // without the B, both fork paths complete
    assert(run(q(pat), ev("A", 1), ev("C", 2), ev("C", 3)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(2L)),
        Map("x" -> Vector(1L), "y" -> Vector(3L))))
  }

  test("an event matching both the right head and the negation kills " +
    "(notFollowedBy)") {
    // x:A ∘ !fby(n:C[v < 0]) y:C[True]: a negative-priced C is a stop,
    // not a take
    val pat = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "C", "v < 0"),
      Pattern.NegMode.NotFollowedBy,
      Pattern.spat("y", "C", "True"))
    assert(run(q(pat), ev("A", 1), ev("C", 2, v = -3), ev("C", 3, v = 1)) ==
      Vector())
    assert(run(q(pat), ev("A", 1), ev("C", 2, v = 1)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(2L))))
  }

  // ------------------------------------------------------------ guard rails

  test("compile-time rejections: optional left, optional right, group " +
    "right") {
    def compile(p: Pattern): Unit =
      DstCompiler.compile(CepQuery(p, schema))
    val optLeft = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.LpatInf("x", "A", Expr.True, Contiguity.Relaxed, 0),
      Pattern.negSpec("n", "B", "True"),
      Pattern.NegMode.NotFollowedBy,
      Pattern.spat("y", "C", "True"))
    val e1 = intercept[IllegalArgumentException](compile(optLeft))
    assert(e1.getMessage.contains("optional"))
    val optRight = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "B", "True"),
      Pattern.NegMode.NotFollowedBy,
      Pattern.LpatInf("y", "C", Expr.True, Contiguity.Relaxed, 0))
    val e2 = intercept[IllegalArgumentException](compile(optRight))
    assert(e2.getMessage.contains("optional"))
    val groupRight = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "B", "True"),
      Pattern.NegMode.NotFollowedBy,
      Pattern.GpatTimes(Pattern.spat("y", "C", "True"), 2, 2))
    intercept[IllegalArgumentException](compile(groupRight))
  }

  test("skip strategies apply to surviving matches unchanged") {
    // SkipPastLastEvent with two live runs: first match wins, rest drop
    val pat = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "B", "True"),
      Pattern.NegMode.NotFollowedBy,
      Pattern.spat("y", "C", "True"))
    val query = CepQuery(pat, schema, AfterMatchStrategy.SkipPastLastEvent)
    assert(run(query, ev("A", 1), ev("A", 2), ev("C", 3)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(3L))))
  }

  test("repr renders the negative link") {
    val pat = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "B", "v > 10"),
      Pattern.NegMode.NotNext,
      Pattern.spat("y", "C", "True"))
    assert(Pattern.repr(pat) ==
      "x:A:[True]∘!next(n:B:[v > 10])y:C:[True]")
  }

  test("yaml surface: npat parses to CombineNot and runs") {
    val yaml =
      """patseq:
        |  type: npat
        |  mode: not_followed_by
        |  contiguity: relaxed
        |  neg:
        |    name: n
        |    event: B
        |    cndt: {expr: "True"}
        |  left:
        |    type: spat
        |    name: x
        |    event: A
        |    cndt: {expr: "True"}
        |  right:
        |    type: spat
        |    name: y
        |    event: C
        |    cndt: {expr: "True"}
        |context:
        |  schema:
        |    A: [id, v]
        |    B: [id, v]
        |    C: [id, v]
        |""".stripMargin
    val parsed = YamlQuery.fromYaml(yaml)
    assert(parsed.patseq.isInstanceOf[Pattern.CombineNot])
    assert(CepOperator.run(parsed,
      Vector(ev("A", 1), ev("B", 2), ev("C", 3))).isEmpty)
    assert(CepOperator.run(parsed,
      Vector(ev("A", 1), ev("C", 2))).nonEmpty)
  }

  // ------------------------------------------- composition with windows

  test("notFollowedBy composes with the step window: negation kills, " +
    "window prunes, both apply") {
    // x:A ∘ ¬(n:B) y:C, within = 2 steps
    val pat = Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "B", "True"),
      Pattern.NegMode.NotFollowedBy,
      Pattern.spat("y", "C", "True"))
    val query = q(pat).copy(within = Some(2))
    // takes 1 step apart: inside the window
    assert(run(query, ev("A", 1), ev("C", 2)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(2L))))
    // run from A1 takes 2 steps apart (>= 2, window-pruned); the run
    // from A2 takes 1 step apart and survives
    assert(run(query, ev("A", 1), ev("A", 2), ev("C", 3)) ==
      Vector(Map("x" -> Vector(2L), "y" -> Vector(3L))))
    // negation still kills inside the window
    assert(run(query, ev("A", 1), ev("B", 2), ev("C", 3)) == Vector())
  }

  test("notNext composes with the event-time window") {
    val schemaTs: Vector[(String, Vector[String])] =
      Vector("A" -> Vector("id", "v", "ts"), "C" -> Vector("id", "v", "ts"))
    def evt(tpe: String, id: Long, ts: Long, v: Long = 0L): Event =
      Event(tpe, Vector("id" -> id, "v" -> v, "ts" -> ts))
    // x:A ⋅ !next(n:C[v < 0]) y:C, within 10 time units on ts
    val pat = Pattern.CombineNot(Contiguity.Strict,
      Pattern.spat("x", "A", "True"),
      Pattern.negSpec("n", "C", "v < 0"),
      Pattern.NegMode.NotNext,
      Pattern.spat("y", "C", "True"))
    val query = CepQuery(pat, schemaTs,
      withinTime = Some(WithinTime("ts", 10L)))
    // inside the time window: match
    assert(run(query, evt("A", 1, ts = 0), evt("C", 2, ts = 5)) ==
      Vector(Map("x" -> Vector(1L), "y" -> Vector(2L))))
    // outside the time window: pruned despite matching the pattern
    assert(run(query, evt("A", 1, ts = 0), evt("C", 2, ts = 20)) ==
      Vector())
    // negated event kills inside the window
    assert(run(query,
      evt("A", 1, ts = 0), evt("C", 2, ts = 5, v = -1)) == Vector())
  }
}
