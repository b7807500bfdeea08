package graft.cep

/** Loud-warning channel for CEP runtime hazards.
  *
  * The unkeyed CEP path is *semantically* single-partition — the
  * reference applies a query to ONE event stream
  * (`/root/reference/reflinkcep/operator.py:15-20`), so `AllTuples` is
  * required, not a defect. But nothing used to stop a caller from feeding
  * a table-scale input through it: every row funnels into one task and
  * the job "works" at test scale, then dies (or crawls on one core of a
  * 1000-executor cluster) at 100 TB. This channel makes that hazard loud
  * at RUNTIME: the unkeyed exec counts rows per task and, the moment the
  * count crosses `spark.graft.cep.unkeyedWarnRows` (default 10M), emits
  * one warning naming the fix — key the spec (`CepSpec(keyCol = ...)`)
  * so the match distributes.
  *
  * `onUnkeyedThreshold` is a test seam: local-mode tasks run in the
  * driver JVM, so `UnkeyedCepGuardSpec` swaps it to observe the firing.
  * On a real cluster only the default (task-side log4j warning) runs.
  */
object CepRuntimeWarnings {
  val UnkeyedWarnRowsKey = "spark.graft.cep.unkeyedWarnRows"
  val UnkeyedWarnRowsDefault = 10000000L

  def unkeyedMessage(rows: Long, threshold: Long): String =
    s"CEP UNKEYED SCALE WARNING: an unkeyed pattern match has consumed " +
      s"$rows rows in a single task (threshold $threshold, set by " +
      s"$UnkeyedWarnRowsKey). Unkeyed matching is the reference's " +
      "single-sequence semantics and CANNOT distribute — every row " +
      "funnels into one partition. If the stream is logically per-entity, " +
      "use the keyed form (CepSpec(keyCol = Some(...))) so the match " +
      "shuffles once and runs key-parallel."

  @volatile private[graft] var onUnkeyedThreshold: (Long, Long) => Unit =
    (rows, threshold) =>
      org.slf4j.LoggerFactory.getLogger("graft.cep")
        .warn(unkeyedMessage(rows, threshold))

  /** One counter per unkeyed task; fires the hook exactly once, at the
    * first row at-or-past the threshold.
    */
  final class UnkeyedCounter(threshold: Long) {
    private var rows = 0L
    private var fired = false
    def tick(): Unit = {
      rows += 1L
      if (!fired && rows >= threshold) {
        fired = true
        onUnkeyedThreshold(rows, threshold)
      }
    }
  }
}
