package graft

import java.nio.file.{FileSystems, Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Every `read_parquet('<glob>')` literal baked into an oracle SQL must be
  * an ABSOLUTE path that matches at least one file on disk. The driver's
  * DuckDB gate runs from a cwd that is not the repo root, so a relative
  * artifact path fails there even when the Spark half and a repo-rooted
  * replay are green (the round-9 `text_langid_model` red: its corpus glob
  * was the repo's one relative artifact path).
  */
class OraclePathSpec extends AnyFunSuite {

  private val globRe = "read_parquet\\('([^']+)'".r

  private def globMatchesSomething(glob: String): Boolean = {
    val firstStar = glob.indexOf('*')
    if (firstStar < 0) Files.exists(Paths.get(glob))
    else {
      val root = Paths.get(glob.substring(0, glob.lastIndexOf('/', firstStar)))
      if (!Files.exists(root)) false
      else {
        val matcher = FileSystems.getDefault.getPathMatcher("glob:" + glob)
        val walk = Files.walk(root)
        try walk.iterator().asScala.exists(matcher.matches)
        finally walk.close()
      }
    }
  }

  test("every oracle read_parquet glob is absolute and matches >= 1 file") {
    val globs = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      globRe.findAllMatchIn(sql).map(m => name -> m.group(1))
    }
    assert(globs.nonEmpty, "expected at least one artifact-backed oracle")
    val bad = globs.flatMap { case (name, glob) =>
      if (!glob.startsWith("/")) Some(s"$name: RELATIVE glob '$glob'")
      else if (!globMatchesSomething(glob)) Some(s"$name: no files match '$glob'")
      else None
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
