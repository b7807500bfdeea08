package graft.tools

import graft.cep._

/** Pure-JVM NFA microbenchmark (no Spark): feed synthetic events through
  * the executor single-threaded, best-of-N wall clock.
  */
object DriveNfaBench {
  def main(args: Array[String]): Unit = {
    val n = 2000000
    val types = Array("click", "view", "purchase", "signup")
    val events = Array.tabulate(n) { i =>
      Event(types((i * 2654435761L % 4).toInt.abs),
        Vector("event_id" -> i.toLong, "value" -> (i * 40503L % 500)))
    }
    val schema = Vector(
      "click" -> Vector("event_id", "value"),
      "view" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"),
      "signup" -> Vector("event_id", "value"))
    val queries = Seq(
      "strict_seq" -> CepQuery(
        Pattern.Combine(Contiguity.Strict,
          Pattern.spat("a", "signup", "True"),
          Pattern.lpat("b", "purchase", "value < 250", Contiguity.Strict,
            1, 2)), schema),
      "iter_budget" -> CepQuery(
        Pattern.lpat("a", "purchase", "X + value <= 100", Contiguity.Strict,
          2, 3, Vector(Pattern.varDef("X", 0, "X + value"))), schema),
      "relaxed_pair" -> CepQuery(
        Pattern.lpat("a", "purchase", "value < 40", Contiguity.Relaxed,
          2, 2), schema, AfterMatchStrategy.SkipToNext))
    for ((name, q) <- queries) {
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
      println(f"NFA $name: matches=$matches best=${best}%.2fs " +
        f"rate=${(n / best).toLong}/s")
    }

    // run-set-heavy case: nd-relaxed pairs keep every started run alive,
    // so live runs grow linearly and the work quadratically — the shape
    // that stresses per-(run, event) predicate evaluation
    val ndQ = CepQuery(
      Pattern.lpat("a", "purchase", "value < 250", Contiguity.NdRelaxed,
        2, 2), schema)
    val ndN = 20000
    var best = Double.MaxValue
    var matches = 0L
    for (_ <- 1 to 4) {
      val ex = new Executor(DstCompiler.compile(ndQ), ndQ.strategy)
      ex.reset()
      val t0 = System.nanoTime()
      var m = 0L
      var i = 0
      while (i < ndN) { m += ex.feed(events(i)).length; i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best) { best = sec; matches = m }
    }
    println(f"NFA nd_pairs: matches=$matches best=${best}%.2fs " +
      f"rate=${(ndN / best).toLong}/s")
  }
}
