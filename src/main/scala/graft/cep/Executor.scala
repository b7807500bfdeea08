package graft.cep

import scala.collection.mutable.ArrayBuffer

/** Event-at-a-time NFA simulation + after-match skip strategies.
  *
  * Faithful re-expression of `/root/reference/reflinkcep/executor.py:22-94`.
  * The loop structure is ported literally because it pins match *output
  * order*: ε-successors are inserted at the current scan position
  * (`executor.py:58-61`), a new run starts at every event
  * (`executor.py:39-41`), and matches are emitted in `S`-order
  * (`executor.py:70-91`).
  *
  * The executor's entire mutable state is `(i, S)` — a step counter and the
  * list of live (startIndex, configuration) runs — so it snapshots/restores
  * cheaply for use inside Spark stateful operators.
  */
final class Executor(val dst: Dst, val strategy: AfterMatchStrategy,
    val maxRuns: Option[Int] = None)
    extends Serializable {

  private var S: ArrayBuffer[(Int, Configuration)] = ArrayBuffer.empty
  private var i: Int = 0

  def reset(): Unit = { S = ArrayBuffer.empty; i = 0 }

  /** Live-run count (for state-size accounting in streaming). */
  def runCount: Int = S.size

  /** Snapshot the executor's entire mutable state — `(step counter, live
    * runs)` — for externalization into a streaming state store. States are
    * referenced by name; `restore` resolves them against this executor's
    * (deterministically compiled) DST.
    */
  def snapshot: (Int, Vector[(Int, Configuration)]) = (i, S.toVector)

  def restore(step: Int, runs: Vector[(Int, Configuration)]): Unit = {
    i = step
    S = ArrayBuffer.from(runs)
  }

  /** Resolve a state name to the DST's state object (for state-store
    * rehydration).
    */
  def stateByName(name: String): State =
    dst.stateByName.getOrElse(name,
      throw new IllegalStateException(s"unknown state $name"))

  /** Feed one event; return the matches completed by it, in order. */
  def feed(event: Event): Vector[Match] = {
    i += 1
    val ev = Some(event)

    val t = ArrayBuffer.from(S)
    S = ArrayBuffer.empty
    t += ((i, dst.initialConfiguration))

    var idx = 0
    while (idx < t.length) {
      val (k, conf) = t(idx)
      idx += 1
      val edges = dst.startFrom(conf.q)
      var e = 0
      while (e < edges.length) {
        val edge = edges(e)
        if (edge.predict(conf, ev)) {
          val nc = edge.advance(conf, ev)
          if (edge.isEpsilon) {
            // process ε-successors before the remaining queue entries
            t.insert(idx, (k, nc))
          } else {
            S += ((k, nc))
            dst.findAccepted(nc) match {
              case Some(dug) => S += ((k, dug))
              case None      => ()
            }
          }
        }
        e += 1
      }
    }

    // emit phase
    val out = Vector.newBuilder[Match]
    val lazyDelete = scala.collection.mutable.HashSet.empty[Int]
    var j = 0
    var done = false
    while (j < S.length && !done) {
      val (k, conf) = S(j)
      j += 1
      if (!lazyDelete.contains(k) && dst.accept(conf)) {
        out += dst.output(conf)
        strategy match {
          case AfterMatchStrategy.NoSkip => ()
          case AfterMatchStrategy.SkipToNext =>
            lazyDelete += k
          case AfterMatchStrategy.SkipPastLastEvent =>
            S.clear(); done = true
        }
      }
    }
    if (lazyDelete.nonEmpty)
      S = S.filterNot { case (k, _) => lazyDelete.contains(k) }

    // state-explosion safety valve: nd-relaxed + NoSkip can grow the run
    // set combinatorially (inherent to the semantics, SURVEY.md §4); at
    // corpus scale an unbounded key would OOM an executor. Failing loudly
    // beats silently wrong results — callers opt in via maxRuns.
    maxRuns.foreach { cap =>
      if (S.length > cap)
        throw new IllegalStateException(
          s"CEP run-set exceeded maxRuns=$cap at step $i (pattern keeps " +
            "too many partial matches alive; consider a stricter " +
            "contiguity, an until condition, or a skip strategy)")
    }

    out.result()
  }
}

/** The stream-application operator: reset, feed events in order, concatenate
  * emitted matches (`/root/reference/reflinkcep/operator.py:15-20`).
  */
final class CepOperator(val executor: Executor) {
  def apply(input: IterableOnce[Event]): Vector[Match] = {
    executor.reset()
    val out = Vector.newBuilder[Match]
    input.iterator.foreach(ev => out ++= executor.feed(ev))
    out.result()
  }
}

object CepOperator {
  def fromQuery(query: CepQuery): CepOperator =
    new CepOperator(new Executor(DstCompiler.compile(query), query.strategy))

  /** One-shot convenience: run `query` over an ordered event sequence. */
  def run(query: CepQuery, input: IterableOnce[Event]): Vector[Match] =
    fromQuery(query).apply(input)
}
