package graft.cep

import org.scalatest.funsuite.AnyFunSuite

/** Differential test: 27,783 generated cases (pattern-shape × contiguity ×
  * loop bounds × until × skip-strategy × 2 inputs — the same cross-product
  * families the reference validates against real FlinkCEP) with expected
  * outputs produced by the reference engine itself
  * (`tools/gen_differential.py`). Every case must match exactly, including
  * match order. See `LongStreamDifferentialSpec` for the 100-1,000-event
  * extension of the same families.
  */
class DifferentialSpec extends AnyFunSuite {

  test("all differential cases match the reference engine output exactly") {
    val (n, failures) =
      DifferentialCorpus.runAll("/differential/cases.jsonl.gz")
    assert(failures.isEmpty,
      s"${failures.length}+ of $n cases diverged:\n${failures.mkString("\n")}")
    info(s"$n cases matched")
  }
}
