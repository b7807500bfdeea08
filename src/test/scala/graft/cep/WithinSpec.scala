package graft.cep

import org.scalatest.funsuite.AnyFunSuite

/** The beyond-parity `within` window (FlinkCEP `.within` over stream
  * position): hand pins, a differential gate against the post-filter
  * reference semantics on real event data, and the state-bound property
  * that motivates the feature.
  */
class WithinSpec extends AnyFunSuite {

  private def ev(tpe: String, id: Long): Event =
    Event(tpe, Vector("event_id" -> id))

  private val schema: Vector[(String, Vector[String])] =
    Vector("a" -> Vector("event_id"), "b" -> Vector("event_id"),
      "c" -> Vector("event_id"))

  test("within gates the relaxed pair by step span") {
    // a at step1; b at steps 4 and 6 (relaxed combine takes the FIRST b)
    val q = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "a", "True"), Pattern.spat("y", "b", "True")),
      schema)
    val input = Vector(ev("a", 1), ev("c", 2), ev("c", 3), ev("b", 4),
      ev("c", 5), ev("b", 6))
    def ids(ms: Vector[Match]) =
      ms.map { m =>
        val byName = m.toMap
        byName("x").head("event_id") -> byName("y").head("event_id")
      }
    // span = 4 - 1 = 3 steps
    assert(ids(CepOperator.run(q, input)) == Vector(1L -> 4L))
    assert(ids(CepOperator.run(q.copy(within = Some(4)), input)) ==
      Vector(1L -> 4L))
    assert(ids(CepOperator.run(q.copy(within = Some(3)), input)) ==
      Vector.empty)
  }

  test("within=1 admits only single-event matches") {
    val q = CepQuery(Pattern.spat("x", "a", "True"), schema,
      within = Some(1))
    val input = Vector(ev("a", 1), ev("b", 2), ev("a", 3))
    assert(CepOperator.run(q, input).size == 2)
  }

  /** Events with an explicit event-time attribute (decoupled from step
    * position) for the `withinTime` pins.
    */
  private def tev(tpe: String, id: Long, ts: Long): Event =
    Event(tpe, Vector("event_id" -> id, "ts" -> ts))

  private val tschema: Vector[(String, Vector[String])] =
    Vector("a" -> Vector("event_id", "ts"), "b" -> Vector("event_id", "ts"),
      "c" -> Vector("event_id", "ts"))

  test("withinTime gates by event-time span, not position") {
    val q = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "a", "True"), Pattern.spat("y", "b", "True")),
      tschema)
    // a at ts 100; many steps later (but only 5 time units later) b; a
    // second b far away in time but adjacent in position
    val input = Vector(tev("a", 1, 100), tev("c", 2, 101), tev("c", 3, 102),
      tev("c", 4, 103), tev("b", 5, 105), tev("b", 6, 9999))
    def ids(ms: Vector[Match]) =
      ms.map { m =>
        val byName = m.toMap
        byName("x").head("event_id") -> byName("y").head("event_id")
      }
    // position span 5-1=4 huge in steps, tiny in time: time window admits
    assert(ids(CepOperator.run(
      q.copy(withinTime = Some(WithinTime("ts", 6))), input)) ==
      Vector(1L -> 5L))
    // exact boundary: span 5 is NOT < 5
    assert(ids(CepOperator.run(
      q.copy(withinTime = Some(WithinTime("ts", 5))), input)) ==
      Vector.empty)
    // composition: time window admits but position window rejects
    assert(ids(CepOperator.run(
      q.copy(withinTime = Some(WithinTime("ts", 6)), within = Some(3)),
      input)) == Vector.empty)
  }

  test("withinTime prunes time-expired runs (state bound) but keeps " +
    "same-timestamp emitters") {
    // match-starved: a's arrive, b never does — every a starts a run
    val q = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "a", "True"), Pattern.spat("y", "b", "True")),
      tschema, withinTime = Some(WithinTime("ts", 10)))
    val ex = new Executor(DstCompiler.compile(q), q.strategy,
      withinTime = q.withinTime)
    (1 to 200).foreach { i =>
      ex.feed(tev("a", i.toLong, i.toLong * 5)) // ts advances 5 per event
    }
    // only runs with ts - firstTakeTs < 10 survive: the last ~2 a's
    assert(ex.runCount <= 4,
      s"expired runs not pruned: ${ex.runCount} live runs")
    // ties: two a's at the same ts, b at that ts + span-1 emits for both
    val q2 = q.copy(withinTime = Some(WithinTime("ts", 5)))
    val out = CepOperator.run(q2, Vector(
      tev("a", 1, 50), tev("a", 2, 50), tev("b", 3, 54)))
    assert(out.size == 2, s"same-ts runs lost: ${out.size}")
  }

  /** VERDICT r4 #9, prove-REFUTED: untaken runs under `within` cannot be
    * pruned by start index. An untaken run's configuration equals the
    * freshly-spawned run's (same ε/ignore path from the same initial
    * registers), so the reference emits one match per live duplicate —
    * pruning would keep the match SET but change the MULTISET. This test
    * pins the multiplicity: with an optional prefix, k surviving
    * duplicate runs emit k copies of the same match, and `within` equals
    * the reference post-filter exactly (multiset compare).
    */
  test("optional-prefix: within preserves reference duplicate " +
    "multiplicity (start-index pruning refuted)") {
    val optPrefix = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.lpat("x", "a", "True", Contiguity.Relaxed, 0, 2),
        Pattern.spat("y", "b", "True")),
      schema)
    // c c b: two untaken runs (spawned at each c, ε-skipping the a-loop)
    // plus the fresh spawn at b — all three take b with empty x binding
    val input = Vector(ev("c", 1), ev("c", 2), ev("b", 3))
    def render(ms: Vector[Match]) = ms.map(_.toString).sorted
    val plain = render(CepOperator.run(optPrefix, input))
    assert(plain.count(_ == plain.head) == 3 ||
      plain.distinct.length < plain.length,
      s"expected duplicate empty-prefix matches, got $plain")
    // within(w): every one of those duplicates has span 0 (single take)
    // — the reference post-filter keeps them ALL, and so must the engine
    val windowed = render(
      CepOperator.run(optPrefix.copy(within = Some(1)), input))
    assert(windowed == plain,
      s"within changed duplicate multiplicity: $windowed vs $plain")
    // detection: this is exactly the shape the state-bound caveat names
    assert(DstCompiler.compile(optPrefix).hasUntakenIgnorePrefix)
    // ...and the plain relaxed pair is NOT (untaken runs die at spawn)
    val pair = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "a", "True"), Pattern.spat("y", "b", "True")),
      schema)
    assert(!DstCompiler.compile(pair).hasUntakenIgnorePrefix)
  }

  test("streaming requires maxRunsPerKey when the window cannot bound " +
    "state (enforced contract, ADVICE r4)") {
    val optPrefix = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.lpat("x", "a", "True", Contiguity.Relaxed, 0, 2),
        Pattern.spat("y", "b", "True")),
      schema, within = Some(5))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      val df = Seq((1L, 1L, "a", 0L)).toDF("k", "event_id", "t", "value")
      val spec = SparkCep.CepSpec(Some("k"), "event_id", "t", Seq("value"))
      val e = intercept[IllegalArgumentException] {
        StreamingCep.matchPattern(df, optPrefix, spec)
      }
      assert(e.getMessage.contains("maxRunsPerKey"))
      // with the valve set, construction proceeds past the check
      StreamingCep.matchPattern(df, optPrefix, spec,
        maxRunsPerKey = Some(1000))
      // a bounded pattern (no optional prefix) needs no valve
      StreamingCep.matchPattern(df, optPrefix.copy(patseq =
        Pattern.Combine(Contiguity.Relaxed,
          Pattern.spat("x", "a", "True"),
          Pattern.spat("y", "b", "True"))), spec)
    } finally spark.stop()
  }

  test("differential: within == reference post-filter on registry patterns") {
    // reference semantics: run WITHOUT within, then keep matches whose
    // bound events' step span < w (non-group patterns bind every take,
    // so output span == take span)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rows = spark.read
        .parquet("/root/testdata/sf0.001/events.parquet")
        .selectExpr("user_id", "event_id", "event_type",
          "cast(value as long) as value")
        .collect()
      val byKey = rows.groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.sortBy(_.getLong(1)).toVector.map(r =>
          Event(r.getString(2), Vector("event_id" -> r.getLong(1),
            "value" -> (if (r.isNullAt(3)) 0L else r.getLong(3)))))
      }
      // non-group (output = every take, so output span == take span) and
      // NoSkip only: under skip strategies the post-filter reference is
      // not equivalent — a live out-of-window accept does NOT trigger
      // the skip (pinned separately below), while the reference's
      // unwindowed run lets it prune sibling runs before the filter
      val patterns = graft.Queries.cepRegistryQueries
        .filter { case (name, q) =>
          !name.contains("gpat") && q.strategy == AfterMatchStrategy.NoSkip
        }
      for (w <- Seq(3, 8); (name, q) <- patterns) {
        byKey.foreach { case (k, events0) =>
          // navigation queries read PREV/NEXT attributes — augment the
          // raw events exactly as the engine's prepare step does
          val events = Nav.augmentEvents(events0, Nav.ofQuery(q))
          val stepOf = events.iterator.zipWithIndex
            .map { case (e, ix) => e("event_id") -> (ix + 1) }.toMap
          val got = CepOperator.run(q.copy(within = Some(w)), events)
          val expect = CepOperator.run(q.copy(within = None), events)
            .filter { m =>
            val steps = m.flatMap(_._2).map(e => stepOf(e("event_id")))
            steps.max - steps.min < w
          }
          assert(got == expect,
            s"$name within=$w key=$k: ${got.size} vs ${expect.size}")
        }
      }
    } finally spark.stop()
  }

  test("out-of-window accept neither emits nor triggers the skip strategy") {
    // a@1, a@4, b@5 with SkipPastLastEvent, w=3: run 1's would-be match
    // (a1,b5) spans 4 steps — expired, so it is pruned at step 3 and can
    // NOT clear the run set; run 2's (a4,b5) spans 1 and emits. (The
    // unwindowed run emits (a1,b5) first and skip-past kills run 2.)
    val q = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "a", "True"), Pattern.spat("y", "b", "True")),
      schema, AfterMatchStrategy.SkipPastLastEvent)
    val input = Vector(ev("a", 1), ev("c", 2), ev("c", 3), ev("a", 4),
      ev("b", 5))
    def ids(ms: Vector[Match]) = ms.map { m =>
      val byName = m.toMap
      byName("x").head("event_id") -> byName("y").head("event_id")
    }
    assert(ids(CepOperator.run(q, input)) == Vector(1L -> 5L))
    assert(ids(CepOperator.run(q.copy(within = Some(3)), input)) ==
      Vector(4L -> 5L))
  }

  test("out-of-TIME-window accept neither emits nor triggers the skip " +
    "strategy") {
    // same shape as the position pin, on the event-time clock: a@ts10,
    // a@ts100, b@ts101 with SkipPastLastEvent, span=5: run 1's would-be
    // match (a1,b) spans 91 time units — rejected, and it must NOT clear
    // the run set; run 2's (a2,b) spans 1 and emits.
    val q = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "a", "True"), Pattern.spat("y", "b", "True")),
      tschema, AfterMatchStrategy.SkipPastLastEvent)
    val input = Vector(tev("a", 1, 10), tev("c", 2, 50), tev("a", 3, 100),
      tev("b", 4, 101))
    def ids(ms: Vector[Match]) = ms.map { m =>
      val byName = m.toMap
      byName("x").head("event_id") -> byName("y").head("event_id")
    }
    assert(ids(CepOperator.run(q, input)) == Vector(1L -> 4L))
    assert(ids(CepOperator.run(
      q.copy(withinTime = Some(WithinTime("ts", 5))), input)) ==
      Vector(3L -> 4L))
    // SkipToNext: the expired run's accept must not lazy-delete its key
    val q2 = q.copy(strategy = AfterMatchStrategy.SkipToNext,
      withinTime = Some(WithinTime("ts", 5)))
    assert(ids(CepOperator.run(q2, input)) == Vector(3L -> 4L))
  }

  test("withinTime enforces the non-decreasing clock (review fix)") {
    val q = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "a", "True"), Pattern.spat("y", "b", "True")),
      tschema, withinTime = Some(WithinTime("ts", 100)))
    val e = intercept[IllegalStateException] {
      CepOperator.run(q, Vector(tev("a", 1, 50), tev("c", 2, 40)))
    }
    assert(e.getMessage.contains("non-decreasing"))
    // equal timestamps are fine (ties are not a rewind)
    assert(CepOperator.run(q,
      Vector(tev("a", 1, 50), tev("b", 2, 50))).size == 1)
    // the floor survives snapshot/restore via live runs' window stamps
    val ex = new Executor(DstCompiler.compile(q), q.strategy,
      withinTime = q.withinTime)
    ex.feed(tev("a", 1, 80))
    val (st, runs) = ex.snapshot
    val ex2 = new Executor(DstCompiler.compile(q), q.strategy,
      withinTime = q.withinTime)
    ex2.restore(st, runs)
    intercept[IllegalStateException] { ex2.feed(tev("b", 2, 70)) }
  }

  test("within disables the alphabet prefilter for multi-step patterns") {
    // dropping ignorable events shrinks step spans — the window is the
    // one observer that makes skipped events visible under relaxed
    // contiguity (caught live by the oracle: 1746 vs 1139 rows)
    val q = graft.Queries.cepWithinSignupPurchaseQuery
    assert(SparkCep.prefilter(q, graft.Queries.eventSpec).isEmpty)
    assert(SparkCep.prefilter(q.copy(within = None),
      graft.Queries.eventSpec).isDefined)
    // a lone spat keeps its pushdown: its span is always 0
    val spat = CepQuery(Pattern.spat("a", "purchase", "value < 40"),
      graft.Queries.cepWithinSignupPurchaseQuery.schema, within = Some(1))
    assert(SparkCep.prefilter(spat, graft.Queries.eventSpec).isDefined)
  }

  test("snapshot/restore mid-stream preserves window starts") {
    val q = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "a", "True"), Pattern.spat("y", "b", "True")),
      schema, within = Some(4))
    val input = Vector(ev("a", 1), ev("c", 2), ev("a", 3), ev("c", 4),
      ev("b", 5), ev("a", 6), ev("b", 7))
    val straight = CepOperator.run(q, input)
    // cut at every point; resume on a FRESH executor from the snapshot
    for (cut <- 1 until input.length) {
      val ex1 = new Executor(DstCompiler.compile(q), q.strategy,
        within = q.within)
      val out = Vector.newBuilder[Match]
      input.take(cut).foreach(e => out ++= ex1.feed(e))
      val (step, runs) = ex1.snapshot
      val ex2 = new Executor(DstCompiler.compile(q), q.strategy,
        within = q.within)
      ex2.restore(step, runs)
      input.drop(cut).foreach(e => out ++= ex2.feed(e))
      assert(out.result() == straight, s"cut at $cut diverged")
    }
  }

  test("yaml context carries the within window") {
    val yml =
      """patseq: {type: spat, name: a, event: e, cndt: {expr: "True"}}
        |context:
        |  schema: {e: [event_id]}
        |  within: 7
        |""".stripMargin
    assert(YamlQuery.fromYaml(yml).within == Some(7))
    val noW =
      """patseq: {type: spat, name: a, event: e, cndt: {expr: "True"}}
        |context:
        |  schema: {e: [event_id]}
        |""".stripMargin
    assert(YamlQuery.fromYaml(noW).within.isEmpty)
  }

  test("yaml context carries the event-time window (within_time)") {
    val yml =
      """patseq: {type: spat, name: a, event: e, cndt: {expr: "True"}}
        |context:
        |  schema: {e: [event_id, ts]}
        |  within_time: {attr: ts, span: 3600}
        |""".stripMargin
    val q = YamlQuery.fromYaml(yml)
    assert(q.withinTime == Some(WithinTime("ts", 3600L)))
    assert(q.within.isEmpty)
    // both windows together
    val both =
      """patseq: {type: spat, name: a, event: e, cndt: {expr: "True"}}
        |context:
        |  schema: {e: [event_id, ts]}
        |  within: 7
        |  within_time: {attr: ts, span: 60}
        |""".stripMargin
    val qb = YamlQuery.fromYaml(both)
    assert(qb.within == Some(7) && qb.withinTime == Some(WithinTime("ts", 60L)))
  }

  test("within bounds live runs on a match-starved stream") {
    // a-then-b relaxed where b never arrives: without a window every
    // taken run stays alive forever; with one, state is bounded
    val q = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("x", "a", "True"), Pattern.spat("y", "b", "True")),
      schema)
    val unbounded = new Executor(DstCompiler.compile(q), q.strategy)
    val windowed = new Executor(DstCompiler.compile(q), q.strategy,
      within = Some(10))
    (1L to 5000L).foreach { id =>
      val e = ev("a", id)
      unbounded.feed(e); windowed.feed(e)
    }
    assert(unbounded.runCount > 4000, s"got ${unbounded.runCount}")
    assert(windowed.runCount <= 10, s"got ${windowed.runCount}")
  }
}
