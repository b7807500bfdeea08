package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import GoldenUtil._
import Pattern._

/** Alternation (`Pattern.Alt`, SQL `a | b`) — beyond-parity (SQL:2016
  * MATCH_RECOGNIZE; neither the reference nor FlinkCEP has it), so the
  * goldens here are hand-derived from the DOCUMENTED semantics
  * ([[Pattern.Alt]], `DstCompiler.compileAlt` /
  * `compileCombineAltRight`):
  *
  *  - a match binds only the branch it went through;
  *  - the LEFT branch is the priority branch (its matches precede the
  *    right branch's when one event completes both);
  *  - under NoSkip the match multiset obeys the UNION LAW: matches of a
  *    pattern with `(a | b)` in some position equal the union of the
  *    matches of the two branch rewrites — pinned here by goldens and
  *    by a seeded stream differential across contiguities and
  *    positions;
  *  - skip strategies act on the fused run set (cross-branch pruning is
  *    defined behavior, pinned by goldens).
  */
class AltSpec extends AnyFunSuite {

  private def alt(l: Pattern, r: Pattern): Pattern = Alt(l, r)

  // -------------------------------------------------------------- goldens

  test("alternation of two spats: each event matches its branch only") {
    val q = CepQuery(
      alt(spat("a", "e", "name == 1"), spat("b", "e", "name == 2")),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (2, 5), (1, 2), (3, 1)))
    assert(streamRepr(out) ==
      "[{'a': [e(1,1,0)]}, {'b': [e(2,2,5)]}, {'a': [e(3,1,2)]}]")
  }

  test("both branches match the same event: left branch emits first") {
    val q = CepQuery(
      alt(spat("a", "e", "price < 5"), spat("b", "e", "price < 9")),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0)))
    assert(streamRepr(out) == "[{'a': [e(1,1,0)]}, {'b': [e(1,1,0)]}]")
  }

  test("strict combine into alternation: next event picks the branch") {
    val q = CepQuery(
      Combine(Contiguity.Strict,
        spat("s", "e", "name == 3"),
        alt(spat("x", "e", "name == 1"), spat("y", "e", "name == 2"))),
      schemaINP)
    val out = runQuery(q,
      eventsOf((3, 0), (1, 1), (3, 2), (2, 3), (3, 4), (3, 5)))
    assert(streamRepr(out) ==
      "[{'s': [e(1,3,0)], 'x': [e(2,1,1)]}, " +
        "{'s': [e(3,3,2)], 'y': [e(4,2,3)]}]")
  }

  test("relaxed combine into alternation: per-branch waits (union law)") {
    // e2 starts branch y ONLY — branch x's wait must SURVIVE it (a
    // shared "starts no branch" ignore state would kill it) so the
    // x-match at e3 still emits, as the union of `s -> x` and `s -> y`
    // promises
    val q = CepQuery(
      Combine(Contiguity.Relaxed,
        spat("s", "e", "name == 3"),
        alt(spat("x", "e", "name == 1"), spat("y", "e", "name == 2"))),
      schemaINP)
    val out = runQuery(q, eventsOf((3, 0), (2, 0), (1, 0)))
    assert(streamRepr(out) ==
      "[{'s': [e(1,3,0)], 'y': [e(2,2,0)]}, " +
        "{'s': [e(1,3,0)], 'x': [e(3,1,0)]}]")
  }

  test("relaxed combine into alternation: ignored events match neither") {
    val q = CepQuery(
      Combine(Contiguity.Relaxed,
        spat("s", "e", "name == 3"),
        alt(spat("x", "e", "name == 1 and price < 5"),
          spat("y", "e", "name == 2"))),
      schemaINP)
    // e2 (name 1, price 9) starts NEITHER branch: both waits ignore it
    val out = runQuery(q, eventsOf((3, 0), (1, 9), (2, 1)))
    assert(streamRepr(out) == "[{'s': [e(1,3,0)], 'y': [e(3,2,1)]}]")
  }

  test("loop branch: the alternation arms can be loops") {
    val q = CepQuery(
      alt(lpat("a", "e", "name == 1", Contiguity.Strict, 2, 2),
        spat("b", "e", "name == 2")),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (1, 0), (2, 0), (1, 0)))
    assert(streamRepr(out) ==
      "[{'a': [e(1,1,0), e(2,1,0)]}, {'b': [e(3,2,0)]}]")
  }

  test("alternation under a group loop: branch choice per iteration") {
    // ((x | y)){2,2}: two consecutive events, each independently x or y
    val q = CepQuery(
      GpatTimes(
        alt(spat("x", "e", "name == 1"), spat("y", "e", "name == 2")),
        2, 2),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 0), (2, 0), (1, 0)))
    // e1e2 = x then y; e2e3 = y then x. The dict key order is the
    // output map's declaration order ([x, y]) regardless of which
    // branch bound first — only the bound events differ per match.
    assert(streamRepr(out) ==
      "[{'x': [e(1,1,0)], 'y': [e(2,2,0)]}, " +
        "{'x': [e(3,1,0)], 'y': [e(2,2,0)]}]")
  }

  test("registers stay per-branch (iterative condition in one arm)") {
    val q = CepQuery(
      alt(
        lpat("a", "e", "X + price <= 5", Contiguity.Strict, 2, 2,
          Vector(varDef("X", 0, "X + price"))),
        spat("b", "e", "price >= 9")),
      schemaINP)
    val out = runQuery(q, eventsOf((1, 2), (1, 3), (1, 9)))
    assert(streamRepr(out) ==
      "[{'a': [e(1,1,2), e(2,1,3)]}, {'b': [e(3,1,9)]}]")
  }

  // ------------------------------------------------- skip-strategy goldens

  test("SkipPastLastEvent prunes across branches") {
    val q = CepQuery(
      alt(spat("a", "e", "price < 5"), spat("b", "e", "price < 9")),
      schemaINP, AfterMatchStrategy.SkipPastLastEvent)
    val out = runQuery(q, eventsOf((1, 0)))
    // both branches accept on e1; the left match emits first and clears
    // the run set — the right branch's match is suppressed
    assert(streamRepr(out) == "[{'a': [e(1,1,0)]}]")
  }

  test("SkipToNext prunes the same-start right-branch match") {
    val q = CepQuery(
      alt(spat("a", "e", "price < 5"), spat("b", "e", "price < 9")),
      schemaINP, AfterMatchStrategy.SkipToNext)
    val out = runQuery(q, eventsOf((1, 0), (1, 7)))
    // e1: both branches accept; the left match kills all runs with the
    // same start index, including the right branch's. e2: only b's
    // condition holds.
    assert(streamRepr(out) == "[{'a': [e(1,1,0)]}, {'b': [e(2,1,7)]}]")
  }

  // ------------------------------------------------------------ rejections

  test("branches must bind disjoint pattern names") {
    val q = CepQuery(
      alt(spat("a", "e", "name == 1"), spat("a", "e", "name == 2")),
      schemaINP)
    val ex = intercept[IllegalArgumentException] {
      DstCompiler.compile(q)
    }
    assert(ex.getMessage.contains("disjoint pattern names"))
  }

  test("branches must declare disjoint LET registers") {
    val q = CepQuery(
      alt(
        lpat("a", "e", "X < 5", Contiguity.Strict, 1, 2,
          Vector(varDef("X", 0, "X + 1"))),
        lpat("b", "e", "X < 5", Contiguity.Strict, 1, 2,
          Vector(varDef("X", 0, "X + 2")))),
      schemaINP)
    val ex = intercept[IllegalArgumentException] {
      DstCompiler.compile(q)
    }
    assert(ex.getMessage.contains("disjoint LET registers"))
  }

  test("a negative pattern into an alternation is rejected") {
    val q = CepQuery(
      CombineNot(Contiguity.Relaxed,
        spat("s", "e", "name == 3"),
        negSpec("n", "e", "name == 9"),
        NegMode.NotFollowedBy,
        alt(spat("x", "e", "name == 1"), spat("y", "e", "name == 2"))),
      schemaINP)
    assertThrows[IllegalArgumentException] {
      DstCompiler.compile(q)
    }
  }

  // -------------------------------------------------- union-law differential

  /** Seeded event streams; multiset equality via sorted match reprs. */
  private def multiset(ms: Seq[Match]): Vector[String] =
    ms.map(dictRepr).toVector.sorted

  private def randomStreams(seed: Long, n: Int, len: Int): Vector[Vector[Event]] = {
    val rnd = new scala.util.Random(seed)
    Vector.fill(n) {
      Vector.tabulate(len) { i =>
        Event("e", Vector("id" -> (i + 1).toLong,
          "name" -> (rnd.nextInt(3) + 1).toLong,
          "price" -> rnd.nextInt(10).toLong))
      }
    }
  }

  test("union law: NoSkip matches of P[(a|b)] == P[a] ++ P[b] (multiset)") {
    val branchA: Pattern =
      lpat("a", "e", "name == 1", Contiguity.Strict, 1, 2)
    val branchB: Pattern = spat("b", "e", "name == 2")
    // alternation position: top level, and as the right of a combine
    // under each boundary contiguity (the per-branch wait machinery)
    val shapes: Vector[(String, Pattern => Pattern)] = Vector(
      "top" -> identity[Pattern] _,
      "strict-combine" -> ((p: Pattern) =>
        Combine(Contiguity.Strict, spat("s", "e", "name == 3"), p)),
      "relaxed-combine" -> ((p: Pattern) =>
        Combine(Contiguity.Relaxed, spat("s", "e", "name == 3"), p)),
      "nd-combine" -> ((p: Pattern) =>
        Combine(Contiguity.NdRelaxed, spat("s", "e", "name == 3"), p)),
      // Gpat-wrap only the alternation (the SQL surface's `s -> (x | y)`
      // shape) — a Gpat around a PLAIN right is rejected at a relaxed
      // boundary (pre-existing group restriction), so branch rewrites
      // stay bare
      "gpat-wrapped-relaxed" -> ((p: Pattern) => Combine(
        Contiguity.Relaxed, spat("s", "e", "name == 3"),
        p match { case _: Alt => Gpat(p); case _ => p })),
      "alt-then-combine" -> ((p: Pattern) =>
        Combine(Contiguity.Relaxed, p, spat("t", "e", "name == 3"))))
    for ((shapeName, wrap) <- shapes;
        (stream, si) <- randomStreams(0x513A17L + shapeName.hashCode,
          8, 24).zipWithIndex) {
      val fused = CepQuery(wrap(alt(branchA, branchB)), schemaINP)
      val viaA = CepQuery(wrap(branchA), schemaINP)
      val viaB = CepQuery(wrap(branchB), schemaINP)
      val got = multiset(CepOperator.run(fused, stream))
      val want = multiset(
        CepOperator.run(viaA, stream) ++ CepOperator.run(viaB, stream))
      assert(got == want,
        s"union law broken for shape=$shapeName stream#$si:\n" +
          s"  fused: $got\n  union: $want")
    }
  }

  test("union law: three branches (flattened spine)") {
    val a: Pattern = spat("a", "e", "name == 1")
    val b: Pattern = spat("b", "e", "name == 2 and price < 5")
    val c: Pattern = lpat("c", "e", "price >= 8", Contiguity.Strict, 1, 2)
    for (stream <- randomStreams(0xA17B3L, 6, 20)) {
      val fused = CepQuery(
        Combine(Contiguity.Relaxed, spat("s", "e", "name == 3"),
          alt(alt(a, b), c)),
        schemaINP)
      val parts = Vector(a, b, c).map(p => CepQuery(
        Combine(Contiguity.Relaxed, spat("s", "e", "name == 3"), p),
        schemaINP))
      val got = multiset(CepOperator.run(fused, stream))
      val want = multiset(parts.flatMap(CepOperator.run(_, stream)))
      assert(got == want)
    }
  }

  // ------------------------------------------------------------ SQL surface

  private val sqlSchema: Vector[(String, Vector[String])] = schemaINP

  test("SQL: top-level alternation parses and runs") {
    val q = CepSql.parse(
      """PATTERN (a | b)
        |DEFINE a AS e WHERE name == 1;
        |       b AS e WHERE name == 2""".stripMargin, sqlSchema)
    assert(q.patseq == Alt(
      Spat("a", "e", Expr.parse("name == 1")),
      Spat("b", "e", Expr.parse("name == 2"))))
    val out = runQuery(q, eventsOf((1, 0), (2, 5)))
    assert(streamRepr(out) == "[{'a': [e(1,1,0)]}, {'b': [e(2,2,5)]}]")
  }

  test("SQL: alternation binds looser than concatenation") {
    val q = CepSql.parse(
      """PATTERN (s a | b)
        |DEFINE s AS e WHERE name == 3;
        |       a AS e WHERE name == 1;
        |       b AS e WHERE name == 2""".stripMargin, sqlSchema)
    // `s a | b` = `(s a) | b`
    assert(q.patseq == Alt(
      Combine(Contiguity.Strict,
        Spat("s", "e", Expr.parse("name == 3")),
        Spat("a", "e", Expr.parse("name == 1"))),
      Spat("b", "e", Expr.parse("name == 2"))))
  }

  test("SQL: grouped alternation after a relaxed step") {
    val q = CepSql.parse(
      """PATTERN (s -> (x | y))
        |DEFINE s AS e WHERE name == 3;
        |       x AS e WHERE name == 1;
        |       y AS e WHERE name == 2""".stripMargin, sqlSchema)
    val out = runQuery(q, eventsOf((3, 0), (2, 0), (1, 0)))
    assert(streamRepr(out) ==
      "[{'s': [e(1,3,0)], 'y': [e(2,2,0)]}, " +
        "{'s': [e(1,3,0)], 'x': [e(3,1,0)]}]")
  }

  test("SQL: quantified alternation group ((x | y){2,2})") {
    val q = CepSql.parse(
      """PATTERN ((x | y){2,2})
        |DEFINE x AS e WHERE name == 1;
        |       y AS e WHERE name == 2""".stripMargin, sqlSchema)
    assert(q.patseq == GpatTimes(
      Alt(Spat("x", "e", Expr.parse("name == 1")),
        Spat("y", "e", Expr.parse("name == 2"))), 2, 2))
  }

  test("SQL: the same name in two branches needs the MEASURES scope " +
    "(the binding-frame surface rejects; CepAltReuseSpec covers the " +
    "supported desugar)") {
    val ex = intercept[IllegalArgumentException] {
      CepSql.parse(
        """PATTERN (a | a)
          |DEFINE a AS e WHERE name == 1""".stripMargin, sqlSchema)
    }
    assert(ex.getMessage.contains("add MEASURES"))
    // within ONE branch the generic at-most-once rule still fires
    val ex2 = intercept[IllegalArgumentException] {
      CepSql.parse(
        """PATTERN (a a | b)
          |DEFINE a AS e WHERE name == 1;
          |       b AS e WHERE name == 2""".stripMargin, sqlSchema)
    }
    assert(ex2.getMessage.contains("at most once"))
  }

  test("SQL: render round-trips alternation statements") {
    val texts = Vector(
      """PATTERN (a | b)
        |DEFINE a AS e WHERE name == 1;
        |       b AS e WHERE name == 2""".stripMargin,
      """PATTERN (s -> (x | y))
        |DEFINE s AS e WHERE name == 3;
        |       x AS e WHERE name == 1;
        |       y AS e WHERE name == 2
        |AFTER MATCH SKIP TO NEXT""".stripMargin,
      """PATTERN (s a{1,2} | b ~> t)
        |DEFINE s AS e WHERE name == 3;
        |       a AS e WHERE name == 1;
        |       b AS e WHERE name == 2;
        |       t AS e WHERE price < 5
        |WITHIN 9""".stripMargin,
      """PATTERN ((x | y){2,2})
        |DEFINE x AS e WHERE name == 1;
        |       y AS e WHERE name == 2""".stripMargin)
    for (t <- texts) {
      val st = CepSql.parseStatement(t, sqlSchema)
      val rendered = CepSql.render(st)
      val reparsed = CepSql.parseStatement(rendered, sqlSchema)
      assert(reparsed.query == st.query, s"round trip broke for:\n$t\n$rendered")
    }
  }

  test("SQL render: a bare alternation as a combine child is rejected") {
    val q = CepQuery(
      Combine(Contiguity.Strict, spat("s", "e", "name == 3"),
        alt(spat("x", "e", "name == 1"), spat("y", "e", "name == 2"))),
      sqlSchema)
    val ex = intercept[IllegalArgumentException] { CepSql.render(q) }
    assert(ex.getMessage.contains("Gpat group"))
    // the Gpat-wrapped form renders fine and round-trips
    val wrapped = CepQuery(
      Combine(Contiguity.Strict, spat("s", "e", "name == 3"),
        Gpat(alt(spat("x", "e", "name == 1"),
          spat("y", "e", "name == 2")))),
      sqlSchema)
    val reparsed = CepSql.parse(CepSql.render(wrapped), sqlSchema)
    assert(reparsed == wrapped)
  }

  test("SQL: SUBSET over the two branches measures the union binding") {
    val st = CepSql.parseStatement(
      """PATTERN (s (x | y))
        |MEASURES COUNT(u) AS n, FIRST(u) AS f
        |SUBSET u = (x, y)
        |DEFINE s AS e WHERE name == 3;
        |       x AS e WHERE name == 1;
        |       y AS e WHERE name == 2""".stripMargin, sqlSchema)
    assert(st.subsetMap == Map("u" -> Vector("x", "y")))
    assert(st.measures.map(_.alias) == Vector("n", "f"))
  }

  // -------------------------------------------------------- window interplay

  test("alternation respects the step window (within)") {
    val q = CepQuery(
      Combine(Contiguity.Relaxed,
        spat("s", "e", "name == 3"),
        alt(spat("x", "e", "name == 1"), spat("y", "e", "name == 2"))),
      schemaINP, within = Some(2))
    // s@1 then x@2 is inside the 2-step window; s@1 … y@4 is not
    val out = runQuery(q, eventsOf((3, 0), (1, 0), (9, 0), (2, 0)))
    assert(streamRepr(out) == "[{'s': [e(1,3,0)], 'x': [e(2,1,0)]}]")
  }
}
