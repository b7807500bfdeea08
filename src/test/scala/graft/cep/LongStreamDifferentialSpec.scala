package graft.cep

import org.scalatest.funsuite.AnyFunSuite

/** Long-stream differential test: 1,000 pattern shapes sampled from the
  * same cross-product families as `DifferentialSpec`, driven by
  * 100-1,000-event seeded streams (sparse and burst-clustered relevant
  * events in noise) with expected outputs produced by the reference
  * engine itself (`tools/gen_differential_long.py`). The 9-event corpus
  * pins transition semantics; this one pins what only shows up at
  * length — relaxed/nd-relaxed ignore-edge traversal across hundreds of
  * noise events, until-scan over long windows, skip-strategy pruning of
  * large live-run sets, and epsilon-once boundaries crossed repeatedly
  * by the same run. Every case must match exactly, including match
  * order.
  */
class LongStreamDifferentialSpec extends AnyFunSuite {

  test("long-stream differential cases match the reference engine exactly") {
    val (n, failures) =
      DifferentialCorpus.runAll("/differential/cases_long.jsonl.gz")
    assert(failures.isEmpty,
      s"${failures.length}+ of $n cases diverged:\n${failures.mkString("\n")}")
    assert(n >= 800, s"long corpus unexpectedly small: $n cases")
    info(s"$n long-stream cases matched")
  }
}
