package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import GoldenUtil._

/** SQL:2016 running aggregates as DEFINE conditions
  * (`CepSql.rewriteAggs`): `b AS click WHERE SUM(b.value) < 100`
  * desugars at parse time to the LET register machinery
  * (`cep_iter_budget`'s engine path) — a hidden `__agg<k>` register
  * folded on the target's takes, the atom replaced by register
  * arithmetic. Self-targeted atoms include the current event (the
  * standard's rule: the current row is tentatively classified as the
  * defining variable); cross-targeted SUM/COUNT read the register
  * as-is.
  */
class CepDefineAggSpec extends AnyFunSuite {

  private val schema: Vector[(String, Vector[String])] = Vector(
    "A" -> Vector("id", "v"), "B" -> Vector("id", "v"))

  /** (type, v) events with 1-based ids. */
  private def evs(pairs: (String, Int)*): Vector[Event] =
    pairs.zipWithIndex.map { case ((t, v), i) =>
      Event(t, Vector("id" -> (i + 1).toLong, "v" -> v.toLong))
    }.toVector

  private def ids(ms: Vector[Match]): Vector[Vector[(String, Vector[Long])]] =
    ms.map(_.map { case (n, es) => n -> es.map(_("id")) })

  test("self SUM == the hand-written LET register formulation " +
    "(seeded random streams)") {
    val sugared = CepSql.parse(
      "PATTERN (a{2,3}) DEFINE a AS A WHERE SUM(a.v) <= 100", schema)
    val manual = CepSql.parse(
      "PATTERN (a{2,3}) DEFINE a AS A WHERE X + v <= 100 " +
        "LET X = 0 THEN X + v", schema)
    val rnd = new scala.util.Random(20260819L)
    for (trial <- 0 until 40) {
      val in = evs((1 to (4 + rnd.nextInt(8))).map(_ =>
        (if (rnd.nextBoolean()) "A" else "B", rnd.nextInt(60))): _*)
      assert(ids(CepOperator.run(sugared, in)) ==
        ids(CepOperator.run(manual, in)), s"trial $trial")
    }
  }

  test("self COUNT includes the current candidate") {
    // at most 2 a's ever taken per run: the 3rd candidate sees COUNT=3
    val q = CepSql.parse(
      "PATTERN (a{1,3}) DEFINE a AS A WHERE COUNT(a) <= 2", schema)
    val out = CepOperator.run(q, evs(("A", 1), ("A", 1), ("A", 1)))
    // runs at e1: [1], [1,2] (3rd blocked); e2: [2], [2,3]; e3: [3]
    assert(ids(out) == Vector(
      Vector("a" -> Vector(1L)),
      Vector("a" -> Vector(1L, 2L)),
      Vector("a" -> Vector(2L)),
      Vector("a" -> Vector(2L, 3L)),
      Vector("a" -> Vector(3L))))
  }

  test("cross-target SUM: the register folds the OTHER name's takes " +
    "and excludes the current row") {
    // b accepted only once the a-run sums past 5; b's own value is not
    // part of the sum
    val q = CepSql.parse(
      "PATTERN (a{1,2} -> b) DEFINE a AS A; b AS B WHERE SUM(a.v) > 5",
      schema)
    // a=[e1(3)] sum 3: b rejected; a=[e1,e2] sum 7: b at e3 accepted
    val out = CepOperator.run(q, evs(("A", 3), ("A", 4), ("B", 100)))
    assert(ids(out) ==
      Vector(Vector("a" -> Vector(1L, 2L), "b" -> Vector(3L))))
  }

  test("self MIN / MAX / AVG desugar to exact integer folds") {
    val qMin = CepSql.parse(
      "PATTERN (a{2,3}) DEFINE a AS A WHERE MIN(a.v) >= 4", schema)
    // values 5,4,3: [5],[5,4] ok; [5,4,3] min 3 rejected; [4],[4,3] x
    val outMin = CepOperator.run(qMin, evs(("A", 5), ("A", 4), ("A", 3)))
    assert(ids(outMin) == Vector(Vector("a" -> Vector(1L, 2L))))
    val qMax = CepSql.parse(
      "PATTERN (a{2,3}) DEFINE a AS A WHERE MAX(a.v) <= 4", schema)
    val outMax = CepOperator.run(qMax, evs(("A", 3), ("A", 4), ("A", 5)))
    assert(ids(outMax) == Vector(Vector("a" -> Vector(1L, 2L))))
    // AVG is the floored quotient: avg(3,4)=3 — DuckDB `//`
    val qAvg = CepSql.parse(
      "PATTERN (a{2,2}) DEFINE a AS A WHERE AVG(a.v) <= 3", schema)
    val outAvg = CepOperator.run(qAvg, evs(("A", 3), ("A", 4)))
    assert(ids(outAvg) == Vector(Vector("a" -> Vector(1L, 2L))))
  }

  test("one register per distinct atom; repeated atoms share it") {
    val st = CepSql.parseStatement(
      "PATTERN (a{1,3}) DEFINE a AS A " +
        "WHERE SUM(a.v) >= 2 and SUM(a.v) <= 9", schema)
    val vars = st.query.patseq match {
      case l: Pattern.Lpat => l.vars
      case other => fail(s"unexpected $other")
    }
    assert(vars.map(_.name) == Vector("__agg0"))
  }

  test("render prints the desugared LET form and re-parses to the " +
    "same query (the sugar does not round-trip; documented)") {
    val st = CepSql.parseStatement(
      "PATTERN (a{2,3}) MEASURES COUNT(a) AS n " +
        "DEFINE a AS A WHERE SUM(a.v) <= 100", schema)
    val rendered = CepSql.render(st)
    assert(rendered.contains("LET __agg0 = 0 THEN __agg0 + v"),
      rendered)
    assert(CepSql.parseStatement(rendered, schema) == st)
  }

  test("SUBSET target: one shared register folds every member's takes; " +
    "current candidate included iff self is a member") {
    // u = (a, b): b's WHERE sees a's takes PLUS the current b candidate
    val st = CepSql.parseStatement(
      "PATTERN (a b) MEASURES FIRST(a) AS a_id, LAST(b) AS b_id " +
        "SUBSET u = (a, b) " +
        "DEFINE a AS A; b AS B WHERE SUM(u.v) <= 10", schema)
    val q = st.query
    // register attached to BOTH defs
    def varsOf(p: Pattern): Vector[String] = p match {
      case s: Pattern.Spat    => s.vars.map(_.name)
      case c: Pattern.Combine => varsOf(c.left) ++ varsOf(c.right)
      case other              => fail(s"unexpected $other")
    }
    assert(varsOf(q.patseq) == Vector("__agg0", "__agg0"))
    // a(4) b(6): 4+6 <= 10 matches; a(4) b(7): 11 > 10 no match
    assert(ids(CepOperator.run(q, evs(("A", 4), ("B", 6)))) ==
      Vector(Vector("a" -> Vector(1L), "b" -> Vector(2L))))
    assert(CepOperator.run(q, evs(("A", 4), ("B", 7))).isEmpty)
    // non-member self: condition in a THIRD name counts members only
    val st2 = CepSql.parseStatement(
      "PATTERN (a b c2) MEASURES FIRST(a) AS a_id " +
        "SUBSET u = (a, b) " +
        "DEFINE a AS A; b AS B; c2 AS A WHERE SUM(u.v) > 5", schema)
    // a(3) b(3) c2(0): u-sum 6 > 5 at c2's judge time (c2 not included)
    assert(CepOperator.run(st2.query,
      evs(("A", 3), ("B", 3), ("A", 0))).nonEmpty)
    assert(CepOperator.run(st2.query,
      evs(("A", 2), ("B", 3), ("A", 99))).isEmpty)
    // MIN/MAX/AVG over a SUBSET: rejected
    val e = intercept[IllegalArgumentException] {
      CepSql.parseStatement(
        "PATTERN (a b) MEASURES FIRST(a) AS i SUBSET u = (a, b) " +
          "DEFINE a AS A; b AS B WHERE MIN(u.v) > 1", schema)
    }
    assert(e.getMessage.contains("self-only"), e.getMessage)
  }

  test("aggregates coexist with a hand-written LET register in the " +
    "same DEFINE (user vars first, desugared registers appended)") {
    val st = CepSql.parseStatement(
      "PATTERN (a{1,3}) " +
        "DEFINE a AS A WHERE SUM(a.v) <= 20 and N <= 2 " +
        "LET N = 0 THEN N + 1", schema)
    val vars = st.query.patseq match {
      case l: Pattern.Lpat => l.vars.map(_.name)
      case other           => fail(s"unexpected $other")
    }
    assert(vars == Vector("N", "__agg0"))
    // v = 5, 7, 9, 3: budget 20 AND at most 2 prior takes (N counts
    // takes so far, condition sees N BEFORE the update — a third take
    // sees N=2 <= 2, a fourth would see 3)
    val got = ids(CepOperator.run(st.query,
      evs(("A", 5), ("A", 7), ("A", 9), ("A", 3))))
    // [1,2,3] sum 21 blocked by the budget; [2,3,4] (sum 19, third
    // take sees N=2) passes both gates. Emission order = completion
    // order: [3] completes at e3, before [2,3,4] completes at e4.
    assert(got == Vector(
      Vector("a" -> Vector(1L)), Vector("a" -> Vector(1L, 2L)),
      Vector("a" -> Vector(2L)), Vector("a" -> Vector(2L, 3L)),
      Vector("a" -> Vector(3L)),
      Vector("a" -> Vector(2L, 3L, 4L)),
      Vector("a" -> Vector(3L, 4L)),
      Vector("a" -> Vector(4L))))
  }

  test("rejections: non-running prefix, aggregates outside WHERE, bad " +
    "shapes, reserved registers") {
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        CepSql.parseStatement(sql, schema)
      }
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("PATTERN (a) DEFINE a AS A WHERE FINAL SUM(a.v) < 9",
      "RUNNING by definition")
    bad("PATTERN (a) DEFINE a AS A WHERE RUNNING SUM(a.v) < 9",
      "RUNNING by definition")
    bad("PATTERN (a{1,}) DEFINE a AS A UNTIL SUM(a.v) > 9",
      "UNTIL")
    bad("PATTERN (a) DEFINE a AS A WHERE X < 5 " +
      "LET X = 0 THEN SUM(a.v)", "LET")
    bad("PATTERN (a -> b) DEFINE a AS A; b AS B WHERE MIN(a.v) > 1",
      "self-only")
    bad("PATTERN (a) DEFINE a AS A WHERE COUNT(a.v) > 1",
      "COUNT takes no attribute")
    bad("PATTERN (a) DEFINE a AS A WHERE SUM(a) > 1",
      "needs an attribute")
    bad("PATTERN (a) DEFINE a AS A WHERE SUM(z.v) > 1",
      "no such DEFINE")
    bad("PATTERN (a) DEFINE a AS A WHERE SUM(a.v) > 1 " +
      "LET __agg9 = 0 THEN __agg9 + v", "reserved '__agg'")
  }

  test("LAST navigation: self == the plain attr (running rule); cross " +
    "reads the target's latest take (hand-written LET differential)") {
    val rnd = new scala.util.Random(20260822L)
    // self-LAST IS the current row
    val self = CepSql.parse(
      "PATTERN (a{2,2}) DEFINE a AS A WHERE LAST(a.v) >= 4", schema)
    val plain = CepSql.parse(
      "PATTERN (a{2,2}) DEFINE a AS A WHERE v >= 4", schema)
    // cross-LAST == a hand-written re-set register on the target
    val sugared = CepSql.parse(
      "PATTERN (a{1,2} -> b) DEFINE a AS A; b AS B WHERE v > LAST(a.v)",
      schema)
    val manual = CepSql.parse(
      "PATTERN (a{1,2} -> b) DEFINE a AS A LET L = 0 THEN v; " +
        "b AS B WHERE v > L", schema)
    for (trial <- 0 until 40) {
      val in = evs((1 to (4 + rnd.nextInt(8))).map(_ =>
        (if (rnd.nextBoolean()) "A" else "B", rnd.nextInt(10))): _*)
      assert(ids(CepOperator.run(self, in)) ==
        ids(CepOperator.run(plain, in)), s"self trial $trial")
      assert(ids(CepOperator.run(sugared, in)) ==
        ids(CepOperator.run(manual, in)), s"cross trial $trial")
    }
  }

  test("FIRST navigation: set-once register pair (atomic via pre-update " +
    "η); self falls back to the current row before the first take") {
    // ascending-from-first: every a must be >= the run's FIRST a
    val q = CepSql.parse(
      "PATTERN (a{2,3}) DEFINE a AS A WHERE v >= FIRST(a.v)", schema)
    // A(5) A(3) A(6): run@e1 dies at e2 (3 < 5, strict); run@e2 takes
    // e2,e3; run@e3 is a 1-prefix (below {2,3})
    val out = CepOperator.run(q, evs(("A", 5), ("A", 3), ("A", 6)))
    assert(ids(out) == Vector(Vector("a" -> Vector(2L, 3L))))
    // cross-FIRST == a hand-written set-once pair; FIRST ≠ LAST on a
    // loop target (the differential stream has both orders)
    val sugared = CepSql.parse(
      "PATTERN (a{2,2} -> b) DEFINE a AS A; b AS B WHERE v > FIRST(a.v)",
      schema)
    val manual = CepSql.parse(
      "PATTERN (a{2,2} -> b) DEFINE a AS A " +
        "LET F = 0 THEN F * (Fs >= 1) + v * (Fs < 1), Fs = 0 THEN 1; " +
        "b AS B WHERE v > F", schema)
    val rnd = new scala.util.Random(20260823L)
    for (trial <- 0 until 40) {
      val in = evs((1 to (4 + rnd.nextInt(8))).map(_ =>
        (if (rnd.nextBoolean()) "A" else "B", rnd.nextInt(10))): _*)
      assert(ids(CepOperator.run(sugared, in)) ==
        ids(CepOperator.run(manual, in)), s"trial $trial")
    }
  }

  test("navigation SUBSET target: the union's first/latest take; " +
    "current candidate included iff self is a member") {
    // u = (a, b): b judged against the union's FIRST — which is a's
    // take (a binds before b), so b sees a's value
    val q = CepSql.parse(
      "PATTERN (a -> b) SUBSET u = (a, b) " +
        "DEFINE a AS A; b AS B WHERE v >= FIRST(u.v)", schema)
    // A(4), B(3): 3 >= 4 fails; A(4), B(5): 5 >= 4 binds
    assert(ids(CepOperator.run(q, evs(("A", 4), ("B", 3)))) ==
      Vector())
    assert(ids(CepOperator.run(q, evs(("A", 4), ("B", 5)))) ==
      Vector(Vector("a" -> Vector(1L), "b" -> Vector(2L))))
    // LAST over the union in b's own WHERE: current row IS the union's
    // latest (self ∈ members) — always the plain attr
    val ql = CepSql.parse(
      "PATTERN (a -> b) SUBSET u = (a, b) " +
        "DEFINE a AS A; b AS B WHERE LAST(u.v) > 3", schema)
    assert(ids(CepOperator.run(ql, evs(("A", 9), ("B", 2)))) == Vector())
    assert(ids(CepOperator.run(ql, evs(("A", 1), ("B", 4)))) ==
      Vector(Vector("a" -> Vector(1L), "b" -> Vector(2L))))
  }

  test("navigation rejections: prefixes, outside WHERE, attribute-less, " +
    "offsets unsupported") {
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        CepSql.parseStatement(sql, schema)
      }
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("PATTERN (a) DEFINE a AS A WHERE RUNNING LAST(a.v) < 9",
      "RUNNING by definition")
    bad("PATTERN (a{1,}) DEFINE a AS A UNTIL LAST(a.v) > 9", "UNTIL")
    bad("PATTERN (a) DEFINE a AS A WHERE X < 5 " +
      "LET X = 0 THEN FIRST(a.v)", "LET")
    bad("PATTERN (a) DEFINE a AS A WHERE FIRST(a) > 1",
      "needs an attribute")
    // FIRST(x.attr, k) is a MEASURES form — the DEFINE rewrite never
    // matches it, so the offset comma reaches Expr.parse and fails there
    intercept[IllegalArgumentException] {
      CepSql.parseStatement(
        "PATTERN (a{2,2}) DEFINE a AS A WHERE FIRST(a.v, 1) > 1", schema)
    }
  }
}
