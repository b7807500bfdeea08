package graft.cep

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the streaming SHOW EMPTY site tracker
  * (`StreamingCep.EmptySiteTracker`) — the parts the batch==stream
  * gates cannot see directly:
  *
  *  - STATE BOUND (the 100 TB argument): under a positional window the
  *    pending set never exceeds w sites per key after a flush — a site
  *    either flushes once w more events fed or was removed by a match;
  *    under a time window it is bounded by the window's event capacity.
  *    Without this bound a hot key would accumulate one pending entry
  *    per event forever, which is exactly the state-growth failure
  *    `within` exists to prevent for the run set.
  *  - removal rules per strategy against a brute-force model;
  *  - the untracked-checkpoint refusal.
  */
class EmptySiteTrackerSpec extends AnyFunSuite {

  import StreamingCep.{CepStateEt, PendingSite}

  private def tracker(strategy: AfterMatchStrategy =
        AfterMatchStrategy.NoSkip,
      within: Option[Int] = Some(5),
      withinTime: Option[Long] = None,
      anchorStart: Boolean = false) =
    new StreamingCep.EmptySiteTracker(true, strategy, anchorStart,
      within, withinTime)

  test("positional window: pending never exceeds w after a flush, over " +
    "a long matchless feed (state bound)") {
    val w = 5
    val t = tracker(within = Some(w))
    for (step <- 1 to 5000) {
      t.onFeed(step.toLong, 0L, step)
      // flush as the operator does at the end of each (here: every)
      // batch; every flushed site is an emitted empty row
      t.flush(step, Long.MinValue)
      assert(t.pending.size <= w, s"step $step: ${t.pending.size}")
    }
    // everything eventually flushes: after w more steps the set drains
    t.flush(5000 + w, Long.MinValue)
    assert(t.pending.isEmpty)
  }

  test("time window: pending is bounded by the window's event capacity " +
    "on a steady clock") {
    val span = 100L
    val t = tracker(within = None, withinTime = Some(span))
    // one event per 10 ticks → at most span/10 + 1 live sites
    for (i <- 1 to 3000) {
      val ts = i * 10L
      t.onFeed(i.toLong, ts, i)
      t.flush(i, ts)
      assert(t.pending.size <= span / 10 + 1, s"i $i: ${t.pending.size}")
    }
  }

  test("flush timing is exactly the executor's accept-guard closure: a " +
    "site flushes at stepNow >= step + w, not earlier") {
    val t = tracker(within = Some(3))
    t.onFeed(10L, 0L, 1)
    assert(t.flush(3, Long.MinValue).isEmpty) // step 1+3=4 > 3
    val done = t.flush(4, Long.MinValue)
    assert(done.map(_.ord) == Vector(10L))
    assert(t.pending.isEmpty)
  }

  test("removal rules per strategy: NoSkip removes the start alone; " +
    "SKIP PAST the whole span; anchors the prune-adjusted span") {
    val ev = (ord: Long) => Event("c", Vector("id" -> ord))
    def byName(aOrds: Vector[Long], bOrds: Vector[Long]) =
      Map("a" -> aOrds.map(ev), "b" -> bOrds.map(ev))
    def seeded(strategy: AfterMatchStrategy) = {
      val t = tracker(strategy = strategy)
      (1 to 8).foreach(i => t.onFeed(i.toLong, 0L, i))
      t
    }
    // match binds a=[2,3], b=[6] (start 2, max 6; first(b)=6, last(a)=3)
    val m = byName(Vector(2L, 3L), Vector(6L))

    val ns = seeded(AfterMatchStrategy.NoSkip)
    ns.onMatch(m, "id")
    assert(ns.pending.map(_.ord) == Vector(1L, 3L, 4L, 5L, 6L, 7L, 8L))

    val sp = seeded(AfterMatchStrategy.SkipPastLastEvent)
    sp.onMatch(m, "id")
    assert(sp.pending.map(_.ord) == Vector(1L, 7L, 8L))

    // SKIP TO FIRST b: span end = max(start, first(b) - 1) = 5
    val sf = seeded(AfterMatchStrategy.SkipToFirst("b"))
    sf.onMatch(m, "id")
    assert(sf.pending.map(_.ord) == Vector(1L, 6L, 7L, 8L))

    // SKIP TO LAST a: span end = max(start, last(a) - 1) = 2
    val sl = seeded(AfterMatchStrategy.SkipToLast("a"))
    sl.onMatch(m, "id")
    assert(sl.pending.map(_.ord) == Vector(1L, 3L, 4L, 5L, 6L, 7L, 8L))

    // anchor never bound → NoSkip fallback (start alone)
    val nb = seeded(AfterMatchStrategy.SkipToFirst("z"))
    nb.onMatch(m, "id")
    assert(nb.pending.map(_.ord) == Vector(1L, 3L, 4L, 5L, 6L, 7L, 8L))
  }

  test("'^' anchor: only the first-ever event is a site; any match " +
    "clears it") {
    val t = tracker(anchorStart = true, within = Some(2))
    (1 to 5).foreach(i => t.onFeed(i.toLong, 0L, i))
    assert(t.pending.map(_.ord) == Vector(1L))
    t.onMatch(Map("a" -> Vector(Event("c", Vector("id" -> 9L)))), "id")
    assert(t.pending.isEmpty)
  }

  test("untracked mid-key checkpoint refuses under a SHOW EMPTY query; " +
    "fresh and tracked payloads restore") {
    val t = tracker()
    // fresh key (step 0): fine
    t.restore(CepStateEt(0, Nil, Nil))
    // tracked payload: pending comes back
    val t2 = tracker()
    t2.restore(CepStateEt(7, Nil, Nil, trackedEmpty = true,
      pending = Seq(PendingSite(3L, 0L, 2))))
    assert(t2.pending.map(_.ord) == Vector(3L))
    // untracked mid-key payload: loud refusal (sites would be lost)
    val t3 = tracker()
    val e = intercept[IllegalStateException] {
      t3.restore(CepStateEt(7, Nil, Nil))
    }
    assert(e.getMessage.contains("SHOW EMPTY"))
  }
}
