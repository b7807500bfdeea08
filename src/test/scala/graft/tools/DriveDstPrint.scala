package graft.tools
import graft.cep._
object DriveDstPrint {
  def main(args: Array[String]): Unit = {
    val q = YamlQuery.fromSample("00-hello", "/root/reference/example-patseq-asts")
    val dst = DstCompiler.compile(q)
    println("TRANS_MAP:")
    println(dst.transMapString)
    val matches = CepOperator.run(q, Vector(
      Event("e", "id" -> 1L, "name" -> 1L, "price" -> 2L),
      Event("e", "id" -> 2L, "name" -> 2L, "price" -> 2L)))
    println(s"MATCHES=${MatchSink.streamRepr(matches)}")
  }
}
