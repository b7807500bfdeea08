package graft.tools

import graft.cep._

/** Pure-JVM probe: PERMUTE cost vs member count k (no Spark), on a
  * 2M-event stream for k = 2..5 (the constructor's cap) against a plain
  * 2-unit strict sequence as the k-free baseline, in a mostly-ignored
  * sparse stream and a unit-dense worst case. Under NoSkip every event
  * opens a fresh initial configuration that sweeps the start state's
  * heads — the k!-branch union compilation paid k! predicate tests per
  * event (rate fell 4.4M → 93K ev/s from k=2 to k=5 sparse); the
  * subset-lattice compilation (`DstCompiler.compilePermuteLattice`)
  * pays k, measured ~flat-in-k sparse (1.9M ev/s at k=5, 20×) and
  * bounded by genuine run fan-out dense. Numbers in SCALE.md §CEP.
  */
object DrivePermuteScale {
  def main(args: Array[String]): Unit = {
    val n = 2000000
    val types = Array("t0", "t1", "t2", "t3", "t4", "view")
    // mostly-view stream: unit heads are rare (~3% each) — the common
    // telemetry shape; head-sweep cost dominates over run extension
    val sparse = Array.tabulate(n) { i =>
      val r = (i * 2654435761L % 32).toInt.abs
      Event(if (r < 5) types(r) else "view",
        Vector("event_id" -> i.toLong, "value" -> (i * 40503L % 500)))
    }
    // unit-dense stream: every event is some unit's type — worst case
    // for surviving-run fan-out
    val dense = Array.tabulate(n) { i =>
      Event(types((i * 2654435761L % 5).toInt.abs),
        Vector("event_id" -> i.toLong, "value" -> (i * 40503L % 500)))
    }
    val schema = types.toVector.map(t => t -> Vector("event_id", "value"))

    def permuteQuery(k: Int): CepQuery = CepQuery(
      Pattern.Permute(Vector.tabulate(k)(j =>
        Pattern.spat(s"u$j", s"t$j", "True"))),
      schema)
    val baseline = CepQuery(
      Pattern.Combine(Contiguity.Strict,
        Pattern.spat("u0", "t0", "True"),
        Pattern.spat("u1", "t1", "True")),
      schema)

    def bench(name: String, q: CepQuery, events: Array[Event]): Unit = {
      var best = Double.MaxValue
      var matches = 0L
      for (_ <- 1 to 4) {
        val ex = new Executor(DstCompiler.compile(q), q.strategy)
        ex.reset()
        val t0 = System.nanoTime()
        var m = 0L
        var i = 0
        while (i < n) { m += ex.feed(events(i)).length; i += 1 }
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) { best = sec; matches = m }
      }
      println(f"PERMUTE $name: matches=$matches best=${best}%.2fs " +
        f"rate=${(n / best).toLong}/s")
    }

    for ((sname, ev) <- Seq("sparse" -> sparse, "dense" -> dense)) {
      bench(s"$sname baseline(seq2)", baseline, ev)
      for (k <- 2 to 5) bench(s"$sname k=$k (${(1 to k).product} br)",
        permuteQuery(k), ev)
    }
  }
}
