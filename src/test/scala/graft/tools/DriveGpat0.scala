package graft.tools
import graft.cep._
object DriveGpat0 {
  def main(args: Array[String]): Unit = {
    // gpat-times with from=0 — the shape that crashed before the fix
    val q = YamlQuery.fromYaml("""
type: "Query"
patseq:
  type: "gpat-times"
  child:
    type: "combine"
    contiguity: "strict"
    left:  { type: "spat", name: "a", event: "e", cndt: { expr: "name == 1" } }
    right: { type: "spat", name: "b", event: "e", cndt: { expr: "name == 2" } }
  loop: { from: 0, to: 2 }
context:
  schema: { e: ["id", "name", "price"] }
""")
    val evs = Vector((1,0),(2,5),(1,0),(2,2),(3,9)).zipWithIndex.map {
      case ((n,p), i) => Event("e", "id" -> (i+1).toLong, "name" -> n.toLong, "price" -> p.toLong) }
    println("GPAT0_MATCHES=" + CepOperator.run(q, evs).map(m =>
      m.map { case (k, es) => s"$k:${es.map(_("id")).mkString("+")}" }.mkString(",")).mkString(" | "))
  }
}
