package graft.cep

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, Path}
import java.util.{Map => JMap}

/** CLI entry point mirroring the reference's testcase runner
  * (`/root/reference/exp/run.py` lifecycle: load `{query, input}` YAML,
  * compile, feed, print matches one per line in the fancy format).
  *
  * Usage:
  * `sbt "runMain graft.cep.RunTestcase [--out <dir>] [--csv <file>] <tc.yml>...`
  *
  * With `--out`, writes per testcase the reference's result artifacts
  * (`exp/run.py:70-80`): `<name>.yml` — the testcase document with a
  * `results.reflinkcep: {output, elapsed_ms}` section added — and
  * `<name>.txt` with the fancy match lines. With `--csv`, appends the
  * recorder rows (`tests/utils.py:36-68` column layout) to one CSV file.
  */
object RunTestcase {
  def main(args: Array[String]): Unit = {
    val usage =
      "usage: RunTestcase [--out <dir>] [--csv <file>] <testcase.yml> [more...]"
    var outDir: Option[Path] = None
    var csvFile: Option[Path] = None
    val paths = Vector.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--out" | "--csv" =>
          require(i + 1 < args.length, s"${args(i)} needs an operand — $usage")
          if (args(i) == "--out") outDir = Some(Paths.get(args(i + 1)))
          else csvFile = Some(Paths.get(args(i + 1)))
          i += 2
        case p => paths += p; i += 1
      }
    }
    val files = paths.result()
    require(files.nonEmpty, usage)
    outDir.foreach(Files.createDirectories(_))
    val csvRows = Vector.newBuilder[String]
    val usedStems = scala.collection.mutable.HashSet.empty[String]
    // when appending to an existing results file, continue its row
    // numbering (the reference recorder numbers rows continuously across
    // invocations): offset by the data rows already present (minus header)
    val idxOffset = csvFile
      .filter(Files.exists(_))
      .map(f => math.max(0, Files.readAllLines(f).size - 1))
      .getOrElse(0)

    for ((path, idx) <- files.zipWithIndex) {
      val text = new String(Files.readAllBytes(Paths.get(path)),
        StandardCharsets.UTF_8)
      val (query, events) = YamlQuery.testcaseFromYaml(text)
      val t0 = System.nanoTime()
      val matches = CepOperator.run(query, events)
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      if (files.length > 1) println(s"== $path ==")
      val fancy = MatchSink.fancyRepr(matches)
      if (fancy.nonEmpty) println(fancy)
      System.err.println(
        f"$path: ${matches.length} matches in $elapsedMs%.2f ms")

      outDir.foreach { dir =>
        val base = Paths.get(path).getFileName.toString
        val stem0 = base.stripSuffix(".yml").stripSuffix(".yaml")
        // same-named testcases from different directories must not
        // overwrite each other's artifacts
        val stem =
          if (usedStems.add(stem0)) stem0
          else {
            var n = 1
            while (!usedStems.add(s"$stem0-$n")) n += 1
            s"$stem0-$n"
          }
        Files.write(dir.resolve(s"$stem.txt"),
          (fancy + "\n").getBytes(StandardCharsets.UTF_8))
        // reload the raw document and add the results section, as the
        // reference writes results.reflinkcep back into the testcase
        val yaml = new org.yaml.snakeyaml.Yaml()
        val root = yaml.load[JMap[String, Object]](text)
        val results = Option(root.get("results"))
          .map(_.asInstanceOf[JMap[String, Object]])
          .getOrElse {
            val m = new java.util.LinkedHashMap[String, Object]()
            root.put("results", m)
            m
          }
        val ours = new java.util.LinkedHashMap[String, Object]()
        ours.put("output", fancy)
        ours.put("elapsed_ms", java.lang.Double.valueOf(elapsedMs))
        results.put("reflinkcep", ours)
        Files.write(dir.resolve(s"$stem.yml"),
          yaml.dump(root).getBytes(StandardCharsets.UTF_8))
      }
      if (csvFile.isDefined)
        csvRows += MatchSink.csvRow(idxOffset + idx, path,
          Pattern.repr(query.patseq), events, matches, elapsedMs)
    }

    // append (like the reference recorder accumulating one results file);
    // the header is written only when creating the file
    csvFile.foreach { f =>
      val fresh = !Files.exists(f)
      val rows = csvRows.result()
      val lines =
        (if (fresh) MatchSink.csvHead +: rows else rows).mkString("\n") + "\n"
      Files.write(f, lines.getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }
}
