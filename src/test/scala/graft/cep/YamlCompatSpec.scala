package graft.cep

import org.scalatest.funsuite.AnyFunSuite

/** API-compat check: every example query file shipped with the reference
  * must load through `YamlQuery` and compile+run without error (skipped
  * when the reference checkout isn't present).
  */
class YamlCompatSpec extends AnyFunSuite {

  private val dir = new java.io.File("/root/reference/example-patseq-asts")

  test("all reference example query files load, compile and run") {
    assume(dir.isDirectory, "reference examples not available")
    val files = dir.listFiles().filter(_.getName.endsWith(".yml")).sorted
    assert(files.nonEmpty)
    val input = GoldenUtil.eventsOf((1, 0), (2, 5), (1, 0), (2, 2), (1, 0),
      (3, 2), (1, 0), (2, 5), (1, 8))
    for (f <- files) {
      val q = YamlQuery.fromFile(f.getPath)
      // compile + execute must not throw; match count is query-dependent
      val out = CepOperator.run(q, input)
      assert(out != null, f.getName)
    }
    info(s"${files.length} example files loaded and ran")
  }
}
