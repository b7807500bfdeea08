package graft.cep

/** CLI entry point mirroring the reference's testcase runner
  * (`/root/reference/exp/run.py` lifecycle: load `{query, input}` YAML,
  * compile, feed, print matches one per line in the fancy format).
  *
  * Usage: `sbt "runMain graft.cep.RunTestcase <testcase.yml> [more...]"`
  */
object RunTestcase {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunTestcase <testcase.yml> [more...]")
    for (path <- args) {
      val (query, events) = YamlQuery.testcaseFromFile(path)
      val t0 = System.nanoTime()
      val matches = CepOperator.run(query, events)
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      if (args.length > 1) println(s"== $path ==")
      matches.foreach { m =>
        println(m.map { case (name, evs) =>
          s"$name: ${evs.mkString(", ")}"
        }.mkString("; "))
      }
      System.err.println(
        f"$path: ${matches.length} matches in $elapsedMs%.2f ms")
    }
  }
}
