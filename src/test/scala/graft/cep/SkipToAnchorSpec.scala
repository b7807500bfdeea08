package graft.cep

import org.scalatest.funsuite.AnyFunSuite

/** `SkipToFirst(name)` / `SkipToLast(name)` — the two FlinkCEP after-match
  * strategies the reference omits (`executor.py:13-19` maps only
  * NoSkip/SkipToNext/SkipPastLastEvent).
  *
  * Documented semantics (on `AfterMatchStrategy`): when a match is
  * emitted, every partial run whose FIRST taken event precedes the
  * first (`SkipToFirst`) / last (`SkipToLast`) event the match bound to
  * `anchor` is pruned; within the same step, later S-order accepts from
  * pruned runs are suppressed; an anchor miss prunes nothing; untaken
  * runs always survive.
  *
  * Verification has two independent arms:
  *  - handcrafted traces pinning the exact output sequence;
  *  - a >1,000-case differential wave against the ONLINE-FILTER model:
  *    because NoSkip runs are mutually independent (their only
  *    interaction is the prune itself), the anchor-strategy output is
  *    exactly the NoSkip match sequence filtered by a monotone threshold
  *    — emit a NoSkip match iff its first-taken event id >= the largest
  *    anchor threshold of any previously emitted match. The NoSkip base
  *    is pinned separately by the 27k-case reference corpus, so the two
  *    arms agreeing verifies precisely the new prune logic.
  */
class SkipToAnchorSpec extends AnyFunSuite {

  private val schema: Vector[(String, Vector[String])] =
    Vector("A" -> Vector("id", "v"), "B" -> Vector("id", "v"),
      "C" -> Vector("id", "v"), "D" -> Vector("id", "v"))

  private def run(pat: Pattern, strat: AfterMatchStrategy,
      events: Vector[Event]): Vector[Match] =
    CepOperator.run(CepQuery(pat, schema, strat), events)

  private def ids(m: Match, name: String): Vector[Long] =
    m.toMap.getOrElse(name, Vector.empty).map(_("id"))

  /** Stream where attr id == 1-based position (== executor step). */
  private def stream(types: String*): Vector[Event] =
    types.toVector.zipWithIndex.map { case (t, k) =>
      Event(t, Vector("id" -> (k + 1).toLong, "v" -> 0L))
    }

  private val pairs = Pattern.lpat("a", "A", "True", Contiguity.NdRelaxed,
    2, 2)

  test("SkipToLast on nd-relaxed pairs keeps only consecutive pairs") {
    // NoSkip on A A A A (nd-relaxed {2,2}) = all 6 ordered pairs;
    // SkipToLast(a): each match's last event prunes every older taken
    // run, leaving exactly the consecutive pairs
    val evs = stream("A", "A", "D", "A", "A")
    val got = run(pairs, AfterMatchStrategy.SkipToLast("a"), evs)
      .map(ids(_, "a"))
    assert(got == Vector(Vector(1L, 2L), Vector(2L, 4L), Vector(4L, 5L)))
    // sanity: NoSkip emits all 6 pairs on the same stream
    assert(run(pairs, AfterMatchStrategy.NoSkip, evs).size == 6)
  }

  test("SkipToFirst on nd-relaxed pairs keeps pairs at rank distance <= 2") {
    // each step's LAST emitted match anchors at its first event c_{m-1},
    // pruning runs older than the previous A — live first-elements are
    // always the last two As seen, so (a_i, a_j) survives iff j - i <= 2
    // in A-rank
    val evs = stream("A", "A", "A", "A", "A")
    val got = run(pairs, AfterMatchStrategy.SkipToFirst("a"), evs)
      .map(ids(_, "a"))
    assert(got == Vector(
      Vector(1L, 2L),
      Vector(1L, 3L), Vector(2L, 3L),
      Vector(2L, 4L), Vector(3L, 4L),
      Vector(3L, 5L), Vector(4L, 5L)))
  }

  test("anchor miss (optional loop bound nothing) falls back to NoSkip") {
    // x:A then b:B{0,1}: matches that bound no B carry no anchor for
    // "b" — they must prune nothing
    val pat = Pattern.Combine(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"),
      Pattern.lpat("b", "B", "True", Contiguity.Relaxed, 0, 1))
    val evs = stream("A", "A", "D", "D")
    val noskip = run(pat, AfterMatchStrategy.NoSkip, evs)
    val got = run(pat, AfterMatchStrategy.SkipToLast("b"), evs)
    assert(got == noskip && noskip.nonEmpty)
  }

  test("SkipToFirst anchored at the head name prunes strictly older runs " +
    "but keeps the match's own cohort") {
    // x:A then y:C, relaxed: at the first C every pending A-run
    // completes; the first (oldest) match anchors at its own A — which
    // precedes the younger As — so younger cohort matches still emit,
    // then each emitted match raises the bar
    val pat = Pattern.Combine(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"), Pattern.spat("y", "C", "True"))
    val evs = stream("A", "A", "C", "A", "C")
    val got = run(pat, AfterMatchStrategy.SkipToFirst("x"), evs)
      .map(m => (ids(m, "x").head, ids(m, "y").head))
    // step 3: (1,3) emits th=1; (2,3) emits th=2 — the younger cohort
    // match survives the older one's anchor (unlike SkipToLast below).
    // Both runs are complete after taking the C (relaxed ignore edges
    // are ¬cndt-guarded, so the first C must take), so step 5 pairs
    // only the fresh x=4.
    assert(got == Vector((1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("SkipToLast anchored at the tail spat kills pending runs at each " +
    "match (alternation)") {
    val pat = Pattern.Combine(Contiguity.Relaxed,
      Pattern.spat("x", "A", "True"), Pattern.spat("y", "C", "True"))
    val evs = stream("A", "A", "C", "A", "C")
    val got = run(pat, AfterMatchStrategy.SkipToLast("y"), evs)
      .map(m => (ids(m, "x").head, ids(m, "y").head))
    // step 3: (1,3) emits, th=3 — suppresses (2,3) in-step and prunes
    // run a=2; step 5: only run a=4 lives
    assert(got == Vector((1L, 3L), (4L, 5L)))
  }

  /** The online-filter model (see class doc). */
  private def filterModel(noSkip: Vector[Match], anchor: String,
      useLast: Boolean): Vector[Match] = {
    var pruneBelow = 0L
    val out = Vector.newBuilder[Match]
    noSkip.foreach { m =>
      val allIds = m.flatMap(_._2).map(_("id"))
      val firstTake = allIds.min
      if (firstTake >= pruneBelow) {
        out += m
        val bound = m.toMap.getOrElse(anchor, Vector.empty)
        if (bound.nonEmpty) {
          val th = if (useLast) bound.last("id") else bound.head("id")
          if (th > pruneBelow) pruneBelow = th
        }
      }
    }
    out.result()
  }

  test("differential wave: executor == online-filter model over seeded " +
    "random streams (>1000 cases)") {
    val rnd = new scala.util.Random(20260814L)
    val types = Vector("A", "B", "C", "D")
    val conds = Vector("True", "v > 2", "v < 8")
    // pattern shapes x anchor names; every name is in the output map
    def shapes(rc: () => String): Vector[(Pattern, Vector[String])] = Vector(
      (Pattern.lpat("a", "A", rc(), Contiguity.NdRelaxed, 2, 2),
        Vector("a")),
      (Pattern.lpat("a", "A", rc(), Contiguity.Relaxed, 1, 3),
        Vector("a")),
      (Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "A", rc()),
        Pattern.lpat("b", "B", rc(), Contiguity.Relaxed, 1, 2)),
        Vector("x", "b")),
      (Pattern.Combine(Contiguity.NdRelaxed,
        Pattern.lpat("a", "A", rc(), Contiguity.Relaxed, 1, 2),
        Pattern.spat("y", "C", rc())),
        Vector("a", "y")),
      (Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "A", rc()),
        Pattern.lpat("b", "B", rc(), Contiguity.Relaxed, 0, 2)),
        Vector("x", "b")))
    var cases = 0
    for (trial <- 0 until 120) {
      val rc = () => conds(rnd.nextInt(conds.length))
      for {
        (pat, anchors) <- shapes(rc)
        anchor <- anchors
        useLast <- Seq(false, true)
      } {
        val n = 8 + rnd.nextInt(25)
        val evs = Vector.tabulate(n)(k =>
          Event(types(rnd.nextInt(types.length)),
            Vector("id" -> (k + 1).toLong,
              "v" -> rnd.nextInt(10).toLong)))
        val strat =
          if (useLast) AfterMatchStrategy.SkipToLast(anchor)
          else AfterMatchStrategy.SkipToFirst(anchor)
        val noSkip = run(pat, AfterMatchStrategy.NoSkip, evs)
        val expected = filterModel(noSkip, anchor, useLast)
        val got = run(pat, strat, evs)
        assert(got == expected,
          s"trial $trial ${strat.name} pat=${Pattern.repr(pat)} events=" +
            evs.map(e => s"${e.tpe}${e("id")}(v=${e("v")})").mkString(",") +
            s"\n  got=${got.map(_.toString)}" +
            s"\n  exp=${expected.map(_.toString)}")
        cases += 1
      }
    }
    info(s"$cases anchor-skip differential cases, all sequence-equal")
    // 5 shapes contribute 8 (pattern, anchor) combos x 2 strategies
    assert(cases == 120 * 8 * 2)
  }

  test("long-stream wave: 100-300-event mostly-noise streams") {
    val rnd = new scala.util.Random(20260815L)
    val types = Vector("A", "B", "C", "D")
    var cases = 0
    for {
      trial <- 0 until 40
      useLast <- Seq(false, true)
    } {
      val n = 100 + rnd.nextInt(201)
      val evs = Vector.tabulate(n) { k =>
        val t = if (rnd.nextInt(10) < 7) "D" else types(rnd.nextInt(3))
        Event(t, Vector("id" -> (k + 1).toLong,
          "v" -> rnd.nextInt(10).toLong))
      }
      val pat = Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "A", "True"),
        Pattern.lpat("b", "B", "v < 8", Contiguity.Relaxed, 1, 2))
      val anchor = if (rnd.nextBoolean()) "x" else "b"
      val strat =
        if (useLast) AfterMatchStrategy.SkipToLast(anchor)
        else AfterMatchStrategy.SkipToFirst(anchor)
      val noSkip = run(pat, AfterMatchStrategy.NoSkip, evs)
      val expected = filterModel(noSkip, anchor, useLast)
      val got = run(pat, strat, evs)
      assert(got == expected, s"long trial $trial ${strat.name} n=$n")
      cases += 1
    }
    info(s"$cases long-stream anchor-skip cases, all sequence-equal")
    assert(cases == 80)
  }

  test("interaction wave: anchor strategies x within window (filter " +
    "model over the WINDOWED NoSkip base)") {
    // the online-filter argument only needs run-independence of the
    // base, which holds for NoSkip-with-window too (window prunes are
    // per-run-local) — so anchor output under within must equal the
    // windowed NoSkip output filtered by the same monotone threshold
    val rnd = new scala.util.Random(20260818L)
    val types = Vector("A", "B", "C", "D")
    var cases = 0
    for {
      trial <- 0 until 80
      useLast <- Seq(false, true)
      w <- Seq(3, 5)
    } {
      val pat = Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "A", "True"),
        Pattern.lpat("b", "B", "v < 8", Contiguity.Relaxed, 1, 2))
      val anchor = if (rnd.nextBoolean()) "x" else "b"
      val n = 10 + rnd.nextInt(25)
      val evs = Vector.tabulate(n)(k =>
        Event(types(rnd.nextInt(types.length)),
          Vector("id" -> (k + 1).toLong, "v" -> rnd.nextInt(10).toLong)))
      val strat =
        if (useLast) AfterMatchStrategy.SkipToLast(anchor)
        else AfterMatchStrategy.SkipToFirst(anchor)
      val noSkip = CepOperator.run(
        CepQuery(pat, schema, within = Some(w)), evs)
      val expected = filterModel(noSkip, anchor, useLast)
      val got = CepOperator.run(
        CepQuery(pat, schema, strat, within = Some(w)), evs)
      assert(got == expected,
        s"trial $trial ${strat.name} w=$w n=$n\n got=$got\n exp=$expected")
      cases += 1
    }
    info(s"$cases anchor-x-within interaction cases")
    assert(cases == 320)
  }

  test("interaction wave: anchor strategies over GREEDY loops (both " +
    "prune mechanisms composed)") {
    // base = greedy NoSkip output (its own differential pins it); the
    // anchor filter composes on top because greedy only changes which
    // runs exist, not their independence
    val rnd = new scala.util.Random(20260819L)
    val types = Vector("A", "B", "C", "D")
    var cases = 0
    for {
      trial <- 0 until 80
      useLast <- Seq(false, true)
    } {
      val pat = Pattern.Combine(Contiguity.Relaxed,
        Pattern.lpat("a", "A", "v < 8", Contiguity.Strict, 1, 3,
          greedy = true),
        Pattern.spat("y", "C", "True"))
      val anchor = if (rnd.nextBoolean()) "a" else "y"
      val n = 10 + rnd.nextInt(25)
      val evs = Vector.tabulate(n)(k =>
        Event(types(rnd.nextInt(types.length)),
          Vector("id" -> (k + 1).toLong, "v" -> rnd.nextInt(10).toLong)))
      val strat =
        if (useLast) AfterMatchStrategy.SkipToLast(anchor)
        else AfterMatchStrategy.SkipToFirst(anchor)
      val greedyNoSkip = CepOperator.run(CepQuery(pat, schema), evs)
      val expected = filterModel(greedyNoSkip, anchor, useLast)
      val got = CepOperator.run(CepQuery(pat, schema, strat), evs)
      assert(got == expected,
        s"trial $trial ${strat.name} n=$n\n got=$got\n exp=$expected")
      cases += 1
    }
    info(s"$cases anchor-x-greedy interaction cases")
    assert(cases == 160)
  }

  test("SQL:2016 bare 'AFTER MATCH SKIP TO var' parses as SKIP TO " +
    "LAST var (implicit-LAST sugar; render prints the explicit form)") {
    val sch: Vector[(String, Vector[String])] =
      Vector("A" -> Vector("id"), "B" -> Vector("id"))
    val bare = CepSql.parse(
      "PATTERN (a{2,2}~~) DEFINE a AS A AFTER MATCH SKIP TO a", sch)
    assert(bare.strategy == AfterMatchStrategy.SkipToLast("a"))
    val explicit = CepSql.parse(
      "PATTERN (a{2,2}~~) DEFINE a AS A AFTER MATCH SKIP TO LAST a", sch)
    assert(bare == explicit)
    assert(CepSql.render(bare).contains("SKIP TO LAST a"))
    assert(CepSql.parse(CepSql.render(bare), sch) == bare)
    // the exact TO NEXT spellings stay themselves
    assert(CepSql.parse(
      "PATTERN (a{2,2}~~) DEFINE a AS A AFTER MATCH SKIP TO NEXT ROW",
      sch).strategy == AfterMatchStrategy.SkipToNext)
  }

  test("strategy name round-trips through fromName") {
    for (s <- Seq(AfterMatchStrategy.SkipToFirst("a"),
        AfterMatchStrategy.SkipToLast("b1"))) {
      assert(AfterMatchStrategy.fromName(s.name) == s)
    }
    assert(AfterMatchStrategy.fromName("SkipToFirst(x)") ==
      AfterMatchStrategy.SkipToFirst("x"))
    intercept[IllegalArgumentException] {
      AfterMatchStrategy.fromName("SkipToFirst[]")
    }
  }

  test("maxRuns = Int.MinValue is rejected at construction (negation " +
    "overflow would silently empty the run set)") {
    val q = CepQuery(pairs, schema)
    intercept[IllegalArgumentException] {
      new Executor(DstCompiler.compile(q), q.strategy, Some(Int.MinValue))
    }
  }
}
