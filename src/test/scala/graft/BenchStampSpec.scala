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
    assert(Bench.stampContaminated(6.36, Bench.DefaultLoadThreshold))
    assert(Bench.stampContaminated(2.01, Bench.DefaultLoadThreshold))
    assert(!Bench.stampContaminated(0.47, Bench.DefaultLoadThreshold))
  }

  test("env override parses; malformed values fall back to the default") {
    assert(Bench.resolveLoadThreshold(
      Map("SPARK_GRAFT_LOAD_THRESHOLD" -> "5.5")) == 5.5)
    assert(Bench.resolveLoadThreshold(
      Map("SPARK_GRAFT_LOAD_THRESHOLD" -> "nope"))
      == Bench.DefaultLoadThreshold)
  }
}
