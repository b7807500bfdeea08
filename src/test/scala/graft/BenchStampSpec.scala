package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contamination stamp (VERDICT r9 #3): the bar is a constant
  * <= 2 — in particular the round-9 driver's loadavg-6.36 start, which
  * the old ncpu/4 bar waved through while four rows inflated 4-17x,
  * must stamp contaminated — and the env override parses or falls back.
  */
class BenchStampSpec extends AnyFunSuite {

  test("default bar is a constant <= 2; loadavg 6.36 stamps contaminated") {
    assert(Bench.DefaultLoadThreshold <= 2.0)
    assert(Bench.resolveLoadThreshold(Map.empty)
      == Bench.DefaultLoadThreshold)
    assert(Bench.stampContaminated(6.36, 6.1, Bench.DefaultLoadThreshold))
    assert(Bench.stampContaminated(2.01, 1.0, Bench.DefaultLoadThreshold))
    assert(!Bench.stampContaminated(0.47, 0.8, Bench.DefaultLoadThreshold))
  }

  test("stamp gates on load5 too: a recently-busy box is contaminated " +
      "even when load1 has already decayed (round-16 driver artifact: " +
      "load1 1.65 / load5 3.63 shipped a smeared run stamped clean)") {
    assert(Bench.stampContaminated(1.65, 3.63, Bench.DefaultLoadThreshold))
    assert(!Bench.stampContaminated(1.65, 1.9, Bench.DefaultLoadThreshold))
  }

  test("env override parses; malformed values fall back to the default") {
    assert(Bench.resolveLoadThreshold(
      Map("SPARK_GRAFT_LOAD_THRESHOLD" -> "5.5")) == 5.5)
    assert(Bench.resolveLoadThreshold(
      Map("SPARK_GRAFT_LOAD_THRESHOLD" -> "nope"))
      == Bench.DefaultLoadThreshold)
  }

  test("waitForIdle polls until the load drops below the bar") {
    val samples = Iterator(6.4, 3.1, 1.2, 0.5)
    var polls = 0
    Bench.waitForIdle(2.0, boundSec = 60,
      load1 = () => { polls += 1; samples.next() },
      sleepMs = 1L, log = _ => ())
    assert(polls == 3) // stops at the first sample below the bar
  }

  test("waitForIdle is bounded: a busy box proceeds after the bound") {
    var polls = 0
    val waited = Bench.waitForIdle(2.0, boundSec = 0,
      load1 = () => { polls += 1; 9.9 }, sleepMs = 1L, log = _ => ())
    assert(polls == 1 && waited == 0.0) // bound 0 = no waiting at all
    val waited2 = Bench.waitForIdle(2.0, boundSec = 1,
      load1 = () => 9.9, sleepMs = 200L, log = _ => ())
    assert(waited2 >= 1.0 && waited2 < 30.0)
  }
}
