package graft.cep

import java.util.{List => JList, Map => JMap}
import scala.jdk.CollectionConverters._

/** Loader for the reference's YAML query format (the example-patseq-asts
  * files in `/root/reference/`, shapes documented in FIXTURES.md §2):
  *
  * {{{
  * type: query
  * patseq: { type: spat|lpat|lpat-inf|combine|gpat|gpat-times|gpat-inf, ... }
  * context: { schema: {evType: [attrs...]}, [strategy: NoSkip|...],
  * [within: w], [within_time: {attr: ts, span: n}] }
  * }}}
  *
  * snakeyaml preserves mapping insertion order (LinkedHashMap), which we rely
  * on for the schema's event-type order (it pins ignore-edge generation
  * order — see `CepQuery.schema`).
  */
object YamlQuery {

  def fromYaml(text: String): CepQuery = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[JMap[String, Object]](text)
    fromJava(root)
  }

  def fromFile(path: String): CepQuery =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  /** Load `<dir>/<name>.yml` — the reference's `Query.from_sample`
    * convenience (`ast.py:68-74`) with an explicit sample directory.
    */
  def fromSample(name: String, dir: String): CepQuery =
    fromFile(s"$dir/$name.yml")

  /** Load a *testcase* document — `{query: <query-doc>, input: [{type,
    * attrs: {...}}, ...]}` (the differential-harness format, FIXTURES.md
    * §2) — returning the query plus the event stream.
    */
  def testcaseFromYaml(text: String): (CepQuery, Vector[Event]) = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[JMap[String, Object]](text)
    val query = fromJava(root.get("query").asInstanceOf[JMap[String, Object]])
    val events = root.get("input").asInstanceOf[JList[Object]].asScala
      .toVector.map { o =>
        val m = o.asInstanceOf[JMap[String, Object]]
        val attrs = m.get("attrs").asInstanceOf[JMap[String, Object]]
          .entrySet().asScala.toVector
          .map(e => e.getKey -> e.getValue.toString.toLong)
        Event(m.get("type").toString, attrs)
      }
    (query, events)
  }

  def testcaseFromFile(path: String): (CepQuery, Vector[Event]) =
    testcaseFromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  private def fromJava(root: JMap[String, Object]): CepQuery = {
    val patseq = parsePattern(root.get("patseq").asInstanceOf[JMap[String, Object]])
    val context = root.get("context").asInstanceOf[JMap[String, Object]]
    val schemaJ = context.get("schema").asInstanceOf[JMap[String, Object]]
    val schema = schemaJ.entrySet().asScala.toVector.map { e =>
      e.getKey -> e.getValue.asInstanceOf[JList[Object]].asScala.toVector
        .map(_.toString)
    }
    val strategy = Option(context.get("strategy"))
      .map(s => AfterMatchStrategy.fromName(s.toString))
      .getOrElse(AfterMatchStrategy.NoSkip)
    // beyond-parity: an optional `within: <w>` context key exposes the
    // step-window extension, and `within_time: {attr: <name>, span: <n>}`
    // the event-time window, through the YAML surface (absent in every
    // reference query — reference files parse exactly as before)
    val within = Option(context.get("within")).map(_.toString.toInt)
    val withinTime = Option(context.get("within_time")).map { o =>
      val m = o match {
        case jm: JMap[_, _] => jm.asInstanceOf[JMap[String, Object]]
        case other => throw new IllegalArgumentException(
          s"within_time must be a mapping {attr: <name>, span: <n>}, " +
            s"got scalar '$other'")
      }
      def req(k: String): String = m.get(k) match {
        case null => throw new IllegalArgumentException(
          s"within_time is missing required key '$k' " +
            "(expected {attr: <name>, span: <n>})")
        case v => v.toString
      }
      val span =
        try req("span").toLong
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"within_time span must be an integer, got '${req("span")}'")
        }
      WithinTime(req("attr"), span)
    }
    CepQuery(patseq, schema, strategy, within, withinTime)
  }

  private def str(m: JMap[String, Object], k: String): String =
    m.get(k).toString

  private def int(m: JMap[String, Object], k: String): Int =
    m.get(k).toString.toInt

  private def expr(m: JMap[String, Object], k: String): Expr =
    Expr.parse(str(m.get(k).asInstanceOf[JMap[String, Object]], "expr"))

  private def vars(m: JMap[String, Object]): Vector[VarDef] =
    Option(m.get("variables")) match {
      case None => Vector.empty
      case Some(v) =>
        v.asInstanceOf[JMap[String, Object]].entrySet().asScala.toVector.map {
          e =>
            val d = e.getValue.asInstanceOf[JMap[String, Object]]
            VarDef(e.getKey, d.get("initial").toString.toLong,
              Expr.parse(str(d, "update")))
        }
    }

  private def loop(m: JMap[String, Object]): JMap[String, Object] =
    m.get("loop").asInstanceOf[JMap[String, Object]]

  private def greedy(l: JMap[String, Object]): Boolean =
    Option(l.get("greedy")).exists(_.toString.toBoolean)

  private def untilOpt(m: JMap[String, Object]): Option[Expr] =
    Option(m.get("until")).map(u =>
      Expr.parse(str(u.asInstanceOf[JMap[String, Object]], "expr")))

  private def parsePattern(m: JMap[String, Object]): Pattern =
    str(m, "type") match {
      case "spat" =>
        Pattern.Spat(str(m, "name"), str(m, "event"), expr(m, "cndt"), vars(m))
      // beyond-parity loop flag `greedy: true` (FlinkCEP `.greedy()`):
      // absent from every reference query file, defaults false
      case "lpat" =>
        val l = loop(m)
        Pattern.Lpat(str(m, "name"), str(m, "event"), expr(m, "cndt"),
          Contiguity.fromName(str(l, "contiguity")), int(l, "from"),
          int(l, "to"), vars(m), greedy(l))
      case "lpat-inf" =>
        val l = loop(m)
        Pattern.LpatInf(str(m, "name"), str(m, "event"), expr(m, "cndt"),
          Contiguity.fromName(str(l, "contiguity")), int(l, "from"),
          untilOpt(m), vars(m), greedy(l))
      case "combine" =>
        Pattern.Combine(
          Contiguity.fromName(str(m, "contiguity")),
          parsePattern(m.get("left").asInstanceOf[JMap[String, Object]]),
          parsePattern(m.get("right").asInstanceOf[JMap[String, Object]]))
      // beyond-parity: negative pattern at a combine boundary (FlinkCEP
      // notNext/notFollowedBy). `mode: not_next | not_followed_by`,
      // `neg: {name, event, cndt: {expr}}`, plus combine's contiguity/
      // left/right. Absent from every reference query file.
      case "npat" =>
        def req(k: String): Object = m.get(k) match {
          case null => throw new IllegalArgumentException(
            s"npat is missing required key '$k' (expected mode, " +
              "contiguity, neg: {name, event, cndt}, left, right)")
          case v => v
        }
        val negM = req("neg") match {
          case jm: JMap[_, _] => jm.asInstanceOf[JMap[String, Object]]
          case other => throw new IllegalArgumentException(
            s"npat neg must be a mapping {name, event, cndt}, got '$other'")
        }
        def negStr(k: String): String = negM.get(k) match {
          case null => throw new IllegalArgumentException(
            s"npat neg is missing required key '$k' " +
              "(expected {name, event, cndt})")
          case v => v.toString
        }
        Pattern.CombineNot(
          Contiguity.fromName(req("contiguity").toString),
          parsePattern(req("left").asInstanceOf[JMap[String, Object]]),
          Pattern.NegSpec(negStr("name"), negStr("event"),
            expr(negM, "cndt")),
          Pattern.NegMode.fromName(req("mode").toString),
          parsePattern(req("right").asInstanceOf[JMap[String, Object]]))
      // beyond-parity: SQL:2016 PERMUTE — `units: [<pattern>, …]`.
      // Absent from every reference query file.
      case "permute" =>
        m.get("units") match {
          case l: java.util.List[_] =>
            Pattern.Permute(l.asScala.toVector.map(u =>
              parsePattern(u.asInstanceOf[JMap[String, Object]])))
          case other => throw new IllegalArgumentException(
            s"permute needs a 'units' list of patterns, got '$other'")
        }
      case "gpat" =>
        Pattern.Gpat(
          parsePattern(m.get("child").asInstanceOf[JMap[String, Object]]))
      case "gpat-times" =>
        val l = loop(m)
        Pattern.GpatTimes(
          parsePattern(m.get("child").asInstanceOf[JMap[String, Object]]),
          int(l, "from"), int(l, "to"), greedy(l))
      case "gpat-inf" =>
        val l = loop(m)
        Pattern.GpatInf(
          parsePattern(m.get("child").asInstanceOf[JMap[String, Object]]),
          int(l, "from"), untilOpt(m), greedy(l))
      case other =>
        throw new IllegalArgumentException(s"unsupported AST node: $other")
    }
}
