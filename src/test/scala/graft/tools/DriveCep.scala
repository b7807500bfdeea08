package graft.tools

import graft.cep._

/** Manual end-to-end drive of the public CEP API (YAML in, matches out).
  * Run: sbt "Test/runMain graft.tools.DriveCep"
  */
object DriveCep {
  def main(args: Array[String]): Unit = {
    val q = YamlQuery.fromYaml("""
type: "query"
patseq:
  type: "combine"
  contiguity: "relaxed"
  left:
    type: "spat"
    name: "signup"
    event: "signup"
    cndt: { expr: "True" }
  right:
    type: "lpat-inf"
    name: "purchases"
    event: "purchase"
    cndt: { expr: "value < 40" }
    loop: { contiguity: relaxed, from: 1 }
    until: { expr: "value >= 90" }
context:
  schema:
    signup: ["id", "value"]
    purchase: ["id", "value"]
    error: ["id", "value"]
""")
    val evs = Vector(
      Event("signup", "id" -> 1L, "value" -> 0L),
      Event("purchase", "id" -> 2L, "value" -> 10L),
      Event("error", "id" -> 3L, "value" -> 0L),
      Event("purchase", "id" -> 4L, "value" -> 95L),
      Event("purchase", "id" -> 5L, "value" -> 20L))
    println("MATCHES=" + CepOperator.run(q, evs))
    // round-18 surface: LIKE ... ESCAPE in a string condition (the
    // escaped `_` is a literal underscore, not a wildcard)
    val likeQ = CepSql.parse(
      "PATTERN (c) DEFINE c AS page " +
        "WHERE path like 'a!_%' escape '!'",
      Vector("page" -> Vector("id")))
    val likeEvs = Vector(
      Event("page", Vector("id" -> 1L), Vector("path" -> "a_home")),
      Event("page", Vector("id" -> 2L), Vector("path" -> "aXhome")))
    println("LIKE_ESCAPE_MATCHES=" + CepOperator.run(likeQ, likeEvs))
    println("LIKE_ESCAPE_ERR=" + scala.util.Try(CepSql.parse(
      "PATTERN (c) DEFINE c AS page WHERE path like 'a!b' escape '!'",
      Vector("page" -> Vector("id")))).failed.map(_.getMessage))
    println("PARSE_ERR=" + scala.util.Try(Expr.parse("name === 1")).failed.map(_.getMessage))
    println("EVAL_ERR=" + scala.util.Try(CepOperator.run(CepQuery(Pattern.spat("a", "e", "nosuchattr == 1"), Vector("e" -> Vector("id"))), Vector(Event("e", "id" -> 1L)))).failed.map(_.getMessage))
    println("EMPTY=" + CepOperator.run(q, Vector.empty))
    println("BAD_YAML=" + scala.util.Try(YamlQuery.fromYaml("{type: query, patseq: {type: lpat, name: a, event: e, cndt: {expr: 'True'}, loop: {contiguity: sorta, from: 1, to: 2}}, context: {schema: {e: []}}}")).failed.map(_.getMessage))
    val op = CepOperator.fromQuery(q)
    val r1 = op(evs); val r2 = op(evs)
    println("RESET_OK=" + (r1 == r2))

    // alternation: SQL `|` in, per-branch bindings out; the rejection
    // path for same-name branches must be loud
    val altQ = CepSql.parse(
      "PATTERN (s (p | x)) DEFINE s AS signup; " +
        "p AS purchase WHERE value < 40; x AS error",
      Vector("signup" -> Vector("id", "value"),
        "purchase" -> Vector("id", "value"),
        "error" -> Vector("id", "value")))
    println("ALT_MATCHES=" + CepOperator.run(altQ, evs))
    println("ALT_RENDER_RT=" + (CepSql.parse(CepSql.render(altQ),
      altQ.schema) == altQ))
    println("ALT_DUP_ERR=" + scala.util.Try(DstCompiler.compile(CepQuery(
      Pattern.Alt(Pattern.spat("a", "e", "True"),
        Pattern.spat("a", "e", "True")),
      Vector("e" -> Vector("id"))))).failed.map(_.getMessage))

    // round-15 surface: partition anchors, DEFINE aggregates (plain +
    // SUBSET target), and the loud anchor/aggregate rejection paths
    val sch = Vector("signup" -> Vector("id", "value"),
      "purchase" -> Vector("id", "value"),
      "error" -> Vector("id", "value"))
    val anchQ = CepSql.parse(
      "PATTERN (^ s -> p $) DEFINE s AS signup; p AS purchase", sch)
    // positive: starts at the signup AND the first purchase is the
    // last event; negative: evs's first purchase is mid-stream, and a
    // foreign first event kills the ^-run
    println("ANCHOR_MATCHES=" + CepOperator.run(anchQ, Vector(
      Event("signup", "id" -> 1L, "value" -> 0L),
      Event("error", "id" -> 2L, "value" -> 0L),
      Event("purchase", "id" -> 3L, "value" -> 5L))))
    println("ANCHOR_MID_EMPTY=" + CepOperator.run(anchQ, evs))
    println("ANCHOR_HEAD_EMPTY=" + CepOperator.run(anchQ,
      Vector(Event("error", "id" -> 1L, "value" -> 0L)) ++ evs))
    println("ANCHOR_RENDER_RT=" + (CepSql.parse(CepSql.render(anchQ),
      anchQ.schema) == anchQ))
    println("ANCHOR_INTERIOR_ERR=" + scala.util.Try(CepSql.parse(
      "PATTERN (s ^ p) DEFINE s AS signup; p AS purchase", sch))
      .failed.map(_.getMessage))
    val aggQ = CepSql.parse(
      "PATTERN (p{1,3}) DEFINE p AS purchase WHERE SUM(p.value) <= 30",
      sch)
    println("AGG_MATCHES=" + CepOperator.run(aggQ, evs))
    val subAggQ = CepSql.parse(
      "PATTERN (s p) SUBSET u = (s, p) " +
        "DEFINE s AS signup; p AS purchase WHERE SUM(u.value) <= 10",
      sch)
    println("SUBSET_AGG_MATCHES=" + CepOperator.run(subAggQ, evs))
    println("AGG_FINAL_ERR=" + scala.util.Try(CepSql.parse(
      "PATTERN (p) DEFINE p AS purchase WHERE FINAL SUM(p.value) < 9",
      sch)).failed.map(_.getMessage))

    // round-15 continuation: DEFINE logical navigation (FIRST set-once /
    // LAST re-set registers) and aggregate-ARGUMENT measure expressions
    val navQ = CepSql.parse(
      "PATTERN (p{2,2}) DEFINE p AS purchase WHERE value >= FIRST(p.value)",
      sch)
    // purchases 10 then 20: ascending-from-first binds both; 20 then 10
    // kills the run at the second candidate
    println("NAV_FIRST_MATCHES=" + CepOperator.run(navQ, Vector(
      Event("purchase", "id" -> 1L, "value" -> 10L),
      Event("purchase", "id" -> 2L, "value" -> 20L))))
    println("NAV_FIRST_EMPTY=" + CepOperator.run(navQ, Vector(
      Event("purchase", "id" -> 1L, "value" -> 20L),
      Event("purchase", "id" -> 2L, "value" -> 10L))))
    println("NAV_UNTIL_ERR=" + scala.util.Try(CepSql.parse(
      "PATTERN (p{1,}) DEFINE p AS purchase UNTIL LAST(p.value) > 9",
      sch)).failed.map(_.getMessage))
    val argSt = CepSql.parseStatement(
      "PATTERN (s -> p) MEASURES SUM(p.value * p.value) AS energy, " +
        "LAST(p.value / 3) AS third " +
        "DEFINE s AS signup; p AS purchase", sch)
    println("AGG_ARG_FOLD=" + argSt.measures.map(m =>
      CepMeasures.evalItem(m, Map(
        "s" -> Vector(Event("signup", "id" -> 1L, "value" -> 0L)),
        "p" -> Vector(Event("purchase", "id" -> 2L, "value" -> 10L))),
        "id")))
    println("AGG_ARG_RENDER_RT=" + (CepSql.parseStatement(
      CepSql.render(argSt), sch) == argSt))
    println("AGG_ARG_MIXED_ERR=" + scala.util.Try(CepSql.parseStatement(
      "PATTERN (s -> p) MEASURES SUM(s.value * p.value) AS x " +
        "DEFINE s AS signup; p AS purchase", sch))
      .failed.map(_.getMessage))

    // SQL:2016 sugar: '{,m}' open lower bound and WITHIN INTERVAL
    println("OPEN_LOWER_EQ=" + (CepSql.parse(
      "PATTERN (p{,2} -> s) DEFINE p AS purchase; s AS signup", sch) ==
      CepSql.parse(
        "PATTERN (p{0,2} -> s) DEFINE p AS purchase; s AS signup", sch)))
    println("INTERVAL_WITHIN=" + CepSql.parse(
      "PATTERN (s -> p) DEFINE s AS signup; p AS purchase " +
        "WITHIN INTERVAL '2' MINUTES ON value", sch).withinTime)
    println("INTERVAL_STEP_ERR=" + scala.util.Try(CepSql.parse(
      "PATTERN (s -> p) DEFINE s AS signup; p AS purchase " +
        "WITHIN INTERVAL '2' MINUTES", sch)).failed.map(_.getMessage))

    // SQL:2016 same-variable alternation: rename + auto-SUBSET desugar
    val altReuse = CepSql.parseStatement(
      "PATTERN (s -> p | s -> x) " +
        "MEASURES FIRST(s.value) AS s_v, COUNT(p) AS n_p, COUNT(x) AS n_x " +
        "DEFINE s AS signup; p AS purchase; x AS error", sch)
    println("ALT_REUSE_SUBSET=" + altReuse.subsetMap)
    println("ALT_REUSE_RT=" + (CepSql.parseStatement(
      CepSql.render(altReuse), sch) == altReuse))
    println("ALT_REUSE_NOMEAS_ERR=" + scala.util.Try(CepSql.parse(
      "PATTERN (s -> p | s -> x) " +
        "DEFINE s AS signup; p AS purchase; x AS error", sch))
      .failed.map(_.getMessage))
  }
}
