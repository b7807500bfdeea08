package graft.cep

import org.scalatest.funsuite.AnyFunSuite

/** The MATCH_RECOGNIZE-shaped SQL surface (`CepSql.parse`) must lower to
  * EXACTLY the Pattern AST the Scala/YAML surfaces build — pinned by
  * round-tripping every registry CepQuery through its SQL form and
  * comparing whole `CepQuery` values (pattern tree, strategy, windows).
  */
class CepSqlSpec extends AnyFunSuite {

  /** SQL form of every `Queries.cepRegistryQueries` entry. */
  private val sqlForms: Map[String, String] = Map(
    "cep_spat_purchase" ->
      "PATTERN (a) DEFINE a AS purchase WHERE value < 40",
    "cep_next_signup_purchase" ->
      "PATTERN (a b) DEFINE a AS signup; b AS purchase",
    "cep_not_followed_by_purchase" ->
      "PATTERN (a ->!fby(n) b) DEFINE a AS signup; n AS error; b AS purchase",
    "cep_not_next_purchase" ->
      ("PATTERN (a !next(n) b) DEFINE a AS signup; " +
        "n AS purchase WHERE value < 50; b AS purchase"),
    "cep_within_signup_purchase" ->
      "PATTERN (a -> b) DEFINE a AS signup; b AS purchase WITHIN 5",
    "cep_lpat_strict_clicks" ->
      "PATTERN (a{3,3}) DEFINE a AS click",
    "cep_lpat_relaxed_purchase_pairs" ->
      "PATTERN (a{2,2}~) DEFINE a AS purchase WHERE value < 40",
    "cep_ndrelaxed_click_pairs" ->
      "PATTERN (a{2,2}~~) DEFINE a AS click",
    "cep_gpat_plain_error_click" ->
      "PATTERN ((a b)) DEFINE a AS error; b AS click WHERE value < 50",
    "cep_gpat_times_sp2" ->
      "PATTERN ((a b){2,2}) DEFINE a AS signup; b AS purchase",
    "cep_gpat_inf_sp" ->
      "PATTERN ((a b)+) DEFINE a AS signup; b AS purchase",
    "cep_skip_past_click_pairs" ->
      "PATTERN (a{2,2}) DEFINE a AS click AFTER MATCH SKIP PAST LAST EVENT",
    "cep_skip_to_first_click_pairs" ->
      "PATTERN (a{2,2}~~) DEFINE a AS click AFTER MATCH SKIP TO FIRST a",
    "cep_skip_to_last_click_pairs" ->
      "PATTERN (a{2,2}~~) DEFINE a AS click AFTER MATCH SKIP TO LAST a",
    "cep_greedy_click_runs" ->
      "PATTERN (a{1,3}! -> b) DEFINE a AS click; b AS purchase",
    "cep_iter_budget" ->
      ("PATTERN (a{2,3}) DEFINE a AS purchase WHERE X + value <= 100 " +
        "LET X = 0 THEN X + value"),
    "cep_sql_funnel" ->
      ("PATTERN (s -> c{1,2} -> p) DEFINE s AS signup; c AS click; " +
        "p AS purchase WITHIN 8"),
    "cep_until_error_runs" ->
      ("PATTERN (s -> p{2,}~) DEFINE s AS signup; " +
        "p AS purchase WHERE value < 40 UNTIL value >= 400 " +
        "AFTER MATCH SKIP TO NEXT"),
    "cep_sql_prev_ascending" ->
      ("PATTERN (x y) DEFINE x AS click; y AS click " +
        "WHERE value > PREV(value)"),
    "cep_sql_alt_outcome" ->
      ("PATTERN (s (p | x)) DEFINE s AS signup; " +
        "p AS purchase WHERE value < 50; x AS error"),
    "cep_sql_permute" ->
      ("PATTERN (s -> PERMUTE(c, p)) DEFINE s AS signup; c AS click; " +
        "p AS purchase WITHIN 8"),
    "cep_sql_anchor_first" ->
      "PATTERN (^ s -> c) DEFINE s AS signup; c AS click",
    "cep_sql_define_agg" ->
      "PATTERN (a{2,3}) DEFINE a AS purchase WHERE SUM(a.value) <= 100",
    "cep_sql_nav_first" ->
      ("PATTERN (a{2,3}) DEFINE a AS purchase " +
        "WHERE value >= FIRST(a.value)"),
    "cep_sql_nav_last" ->
      ("PATTERN (c{2,2}~ -> p) DEFINE c AS click; " +
        "p AS purchase WHERE value > LAST(c.value)"),
    "cep_sql_permute_group" ->
      ("PATTERN (PERMUTE(s, (c p))) DEFINE s AS signup; c AS click; " +
        "p AS purchase"),
    // SUBSET-target DEFINE aggregate: SUBSET without MEASURES is a
    // valid measure-free statement, so parse() lowers it directly (the
    // desugared register lives on both member defs)
    "cep_sql_subset_agg" ->
      ("PATTERN (s p) SUBSET u = (s, p) " +
        "DEFINE s AS signup; p AS purchase WHERE SUM(u.value) <= 120"),
    "cep_sql_show_empty" ->
      "PATTERN (c{0,3}) DEFINE c AS click AFTER MATCH SKIP PAST LAST ROW"
  )

  test("every registry CepQuery round-trips through its SQL form") {
    val registry = graft.Queries.cepRegistryQueries
    val missing = registry.keySet -- sqlForms.keySet
    assert(missing.isEmpty,
      s"registry rows without a SQL form: $missing — extend sqlForms")
    registry.foreach { case (name, q) =>
      val got = CepSql.parse(sqlForms(name), q.schema)
      assert(got == q, s"$name: SQL form lowered to\n  $got\nexpected\n  $q")
    }
    info(s"${registry.size} registry patterns round-tripped")
  }

  private val schema: Vector[(String, Vector[String])] =
    Vector("A" -> Vector("id", "v"), "B" -> Vector("id", "v"),
      "C" -> Vector("id", "v"))

  test("event-time window: WITHIN n ON attr") {
    val q = CepSql.parse(
      "PATTERN (a -> b) DEFINE a AS A; b AS B WITHIN 86400 ON ts", schema)
    assert(q.withinTime.contains(WithinTime("ts", 86400L)))
    assert(q.within.isEmpty)
  }

  test("star and open bounds lower to unbounded loops") {
    val q = CepSql.parse(
      "PATTERN (a* -> b) DEFINE a AS A; b AS B", schema)
    assert(q.patseq == Pattern.Combine(Contiguity.Relaxed,
      Pattern.LpatInf("a", "A", Expr.True, Contiguity.Strict, 0),
      Pattern.Spat("b", "B", Expr.True)))
    val q2 = CepSql.parse(
      "PATTERN (a{3,}~~ -> b) DEFINE a AS A; b AS B", schema)
    assert(q2.patseq == Pattern.Combine(Contiguity.Relaxed,
      Pattern.LpatInf("a", "A", Expr.True, Contiguity.NdRelaxed, 3),
      Pattern.Spat("b", "B", Expr.True)))
  }

  test("left fold for 3+ units; nd-relaxed separator") {
    val q = CepSql.parse(
      "PATTERN (a ~> b c) DEFINE a AS A; b AS B; c AS C", schema)
    assert(q.patseq == Pattern.Combine(Contiguity.Strict,
      Pattern.Combine(Contiguity.NdRelaxed,
        Pattern.Spat("a", "A", Expr.True),
        Pattern.Spat("b", "B", Expr.True)),
      Pattern.Spat("c", "C", Expr.True)))
  }

  test("SQL:2016 reluctant spellings parse as the (reluctant) default; " +
    "reluctant + greedy is rejected") {
    def same(sugared: String, plain: String): Unit =
      assert(CepSql.parse(sugared, schema) == CepSql.parse(plain, schema),
        sugared)
    same("PATTERN (a*? -> b) DEFINE a AS A; b AS B",
      "PATTERN (a* -> b) DEFINE a AS A; b AS B")
    same("PATTERN (a+? -> b) DEFINE a AS A; b AS B",
      "PATTERN (a+ -> b) DEFINE a AS A; b AS B")
    same("PATTERN (a?? b) DEFINE a AS A; b AS B",
      "PATTERN (a? b) DEFINE a AS A; b AS B")
    same("PATTERN (a{1,3}?~ -> b) DEFINE a AS A; b AS B",
      "PATTERN (a{1,3}~ -> b) DEFINE a AS A; b AS B")
    same("PATTERN ((a b){1,2}?) DEFINE a AS A; b AS B",
      "PATTERN ((a b){1,2}) DEFINE a AS A; b AS B")
    val e = intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN (a*?! -> b) DEFINE a AS A; b AS B", schema)
    }
    assert(e.getMessage.contains("both reluctant"))
    val eg = intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN ((a b)*?!) DEFINE a AS A; b AS B", schema)
    }
    assert(eg.getMessage.contains("both"))
  }

  test("SQL:2016 '{,m}' open lower bound = {0,m}; INTERVAL sugar for " +
    "the event-time window") {
    assert(CepSql.parse("PATTERN (a{,3} -> b) DEFINE a AS A; b AS B",
      schema) ==
      CepSql.parse("PATTERN (a{0,3} -> b) DEFINE a AS A; b AS B", schema))
    assert(CepSql.parse("PATTERN ((a b){,2}) DEFINE a AS A; b AS B",
      schema) ==
      CepSql.parse("PATTERN ((a b){0,2}) DEFINE a AS A; b AS B", schema))
    val q = CepSql.parse(
      "PATTERN (a -> b) DEFINE a AS A; b AS B " +
        "WITHIN INTERVAL '5' MINUTE ON ts", schema)
    assert(q.withinTime.contains(WithinTime("ts", 300L)))
    assert(CepSql.parse(
      "PATTERN (a -> b) DEFINE a AS A; b AS B " +
        "WITHIN INTERVAL '2' HOURS ON ts", schema)
      .withinTime.contains(WithinTime("ts", 7200L)))
    // render canonicalizes to the plain integer form and round-trips
    assert(CepSql.parse(CepSql.render(q), q.schema) == q)
    val e = intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN (a -> b) DEFINE a AS A; b AS B " +
        "WITHIN INTERVAL '5' FORTNIGHT ON ts", schema)
    }
    assert(e.getMessage.contains("unit"))
    // INTERVAL has no step-window reading
    intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN (a -> b) DEFINE a AS A; b AS B " +
        "WITHIN INTERVAL '5' MINUTE", schema)
    }
  }

  test("'?' is the optional quantifier: {0,1}") {
    val q = CepSql.parse("PATTERN (a b? c) DEFINE a AS A; b AS B; c AS C",
      schema)
    assert(q.patseq == Pattern.Combine(Contiguity.Strict,
      Pattern.Combine(Contiguity.Strict,
        Pattern.Spat("a", "A", Expr.True),
        Pattern.Lpat("b", "B", Expr.True, Contiguity.Strict, 0, 1)),
      Pattern.Spat("c", "C", Expr.True)))
  }

  test("parse errors are actionable") {
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        CepSql.parse(sql, schema)
      }
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !~ '$frag'")
    }
    bad("DEFINE a AS A", "missing PATTERN")
    bad("PATTERN (a)", "missing DEFINE")
    bad("PATTERN (a b) DEFINE a AS A", "no DEFINE")
    bad("PATTERN (a) DEFINE a AS A; a AS B", "duplicate DEFINE")
    bad("PATTERN (a) DEFINE a AS A UNTIL v > 3", "unbounded loop")
    bad("PATTERN (a{2,3}) DEFINE a AS A UNTIL v > 3", "unbounded loop")
    bad("PATTERN (a) DEFINE a AS A WITHIN nope", "WITHIN")
    // a name may bind once: sinks bind by name, so 'a -> a' would
    // silently merge both positions into one stream register
    bad("PATTERN (a -> a) DEFINE a AS A", "appears 2 times")
    bad("PATTERN (a (a)+) DEFINE a AS A", "appears 2 times")
    // step window is Int downstream; out-of-range values in EITHER
    // direction must fail, not truncate/wrap (-4294967291 wraps to +5
    // through .toInt and would pass the Executor's within >= 1 check)
    bad("PATTERN (a) DEFINE a AS A WITHIN 4294967301", "step window")
    bad("PATTERN (a) DEFINE a AS A WITHIN 0", "step window")
    bad("PATTERN (a b) DEFINE a AS A; b AS B WITHIN -4294967291",
      "step window")
    bad("PATTERN (a) DEFINE a AS A AFTER MATCH SKIP SIDEWAYS", "AFTER MATCH")
    bad("PATTERN (a}", "unbalanced")
    bad("PATTERN (a %) DEFINE a AS A", "unexpected")
  }

  test("negation guards are exempt from the at-most-once rule") {
    // one DEFINE guarding two boundaries: well-defined (negations bind
    // nothing), previously rejected by the r12 uniqueness check
    val q = CepSql.parse(
      "PATTERN (a ->!fby(x) b ->!fby(x) c) " +
        "DEFINE a AS A; x AS B WHERE v > 3; b AS C; c AS D", schema)
    assert(q.patseq == Pattern.CombineNot(Contiguity.Relaxed,
      Pattern.CombineNot(Contiguity.Relaxed,
        Pattern.Spat("a", "A", Expr.True),
        Pattern.NegSpec("x", "B", Expr.parse("v > 3")),
        Pattern.NegMode.NotFollowedBy,
        Pattern.Spat("b", "C", Expr.True)),
      Pattern.NegSpec("x", "B", Expr.parse("v > 3")),
      Pattern.NegMode.NotFollowedBy,
      Pattern.Spat("c", "D", Expr.True)))
    // and it renders back to ONE DEFINE for the shared guard
    assert(CepSql.parse(CepSql.render(q), schema) == q)
    // a name may guard a boundary AND bind a unit
    val q2 = CepSql.parse(
      "PATTERN (a !next(b) c -> b) DEFINE a AS A; b AS B; c AS C", schema)
    assert(CepSql.parse(CepSql.render(q2), schema) == q2)
    // binding twice is still rejected
    intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN (a -> a) DEFINE a AS A", schema)
    }
  }

  test("in-statement PARTITION BY / ORDER BY / TYPE derive a full spec") {
    val st = CepSql.parseStatement(
      "PATTERN (s -> c{1,2} -> p) " +
        "MEASURES SUM(c.v) AS c_sum, AVG(p.v) AS p_avg " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE s AS A WHERE v > 1; c AS B; p AS C WITHIN 8", schema)
    assert(st.partitionBy.contains("k"))
    assert(st.orderBy.contains("id"))
    assert(st.typeCol.contains("t"))
    val spec = st.spec
    assert(spec == SparkCep.CepSpec(Some("k"), "id", "t", Vector("v")))
    // render round-trips the sections
    assert(CepSql.parseStatement(CepSql.render(st), schema) == st)
    // unkeyed: PARTITION BY absent
    val st2 = CepSql.parseStatement(
      "PATTERN (a) ORDER BY id TYPE t DEFINE a AS A", schema)
    assert(st2.spec == SparkCep.CepSpec(None, "id", "t", Vector.empty))
    assert(CepSql.parseStatement(CepSql.render(st2), schema) == st2)
    // spec without ORDER BY / TYPE fails loudly
    val noOrd = CepSql.parseStatement(
      "PATTERN (a) TYPE t DEFINE a AS A", schema)
    assert(intercept[IllegalArgumentException](noOrd.spec)
      .getMessage.contains("ORDER BY"))
    val noType = CepSql.parseStatement(
      "PATTERN (a) ORDER BY id DEFINE a AS A", schema)
    assert(intercept[IllegalArgumentException](noType.spec)
      .getMessage.contains("TYPE"))
    // attrCols collects condition + LET + UNTIL + measure + within-time
    // attrs, minus registers and the order column
    val st3 = CepSql.parseStatement(
      "PATTERN (a{1,}~ -> b) MEASURES MAX(b.w) AS mw " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE a AS A WHERE v > 1 LET R = 0 THEN R + u UNTIL z > 5; " +
        "b AS B WITHIN 100 ON ts",
      Vector("A" -> Vector("id", "v", "u", "z", "w", "ts"),
        "B" -> Vector("id", "v", "u", "z", "w", "ts")))
    assert(st3.spec.attrCols == Vector("ts", "u", "v", "w", "z"))
    // duplicate / malformed sections fail loudly
    intercept[IllegalArgumentException] {
      CepSql.parseStatement(
        "PATTERN (a) ORDER BY id ORDER BY id2 DEFINE a AS A", schema)
    }
    intercept[IllegalArgumentException] {
      CepSql.parseStatement("PATTERN (a) PARTITION k DEFINE a AS A", schema)
    }
  }

  test("group label attaches an UNTIL to an unbounded group") {
    val q = CepSql.parse(
      "PATTERN ((a b){1,}:g) DEFINE a AS A; b AS B; " +
        "g AS GROUP UNTIL v > 5", schema)
    assert(q.patseq == Pattern.GpatInf(
      Pattern.Combine(Contiguity.Strict,
        Pattern.Spat("a", "A", Expr.True),
        Pattern.Spat("b", "B", Expr.True)),
      1, Some(Expr.parse("v > 5"))))
    val e = intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN ((a b){1,2}:g) DEFINE a AS A; b AS B; " +
        "g AS GROUP UNTIL v > 5", schema)
    }
    assert(e.getMessage.contains("UNBOUNDED group"))
  }

  test("property: parse(render(q)) == q over random ASTs (300 trials)") {
    val rnd = new scala.util.Random(20260820L)
    val types = Vector("A", "B", "C", "D")
    val conds = Vector("True", "v > 2", "v < 8", "v == 3 or v > 6",
      "not (v < 2)")
    var nameN = 0
    def freshName(): String = { nameN += 1; s"p$nameN" }
    def rndCond(): Expr = Expr.parse(conds(rnd.nextInt(conds.length)))
    def rndVars(): Vector[VarDef] =
      if (rnd.nextInt(3) == 0)
        Vector(VarDef(freshName().toUpperCase, rnd.nextInt(5).toLong,
          Expr.parse("v + 1")))
      else Vector.empty
    def leaf(): Pattern = rnd.nextInt(3) match {
      case 0 => Pattern.Spat(freshName(), types(rnd.nextInt(4)),
        rndCond(), rndVars())
      case 1 =>
        val from = rnd.nextInt(3)
        Pattern.Lpat(freshName(), types(rnd.nextInt(4)), rndCond(),
          Contiguity.fromName(Vector("strict", "relaxed",
            "nd-relaxed")(rnd.nextInt(3))),
          from, from + 1 + rnd.nextInt(3), rndVars(),
          greedy = rnd.nextInt(4) == 0)
      case _ =>
        Pattern.LpatInf(freshName(), types(rnd.nextInt(4)), rndCond(),
          Contiguity.fromName(Vector("strict", "relaxed",
            "nd-relaxed")(rnd.nextInt(3))),
          rnd.nextInt(3),
          if (rnd.nextBoolean()) Some(rndCond()) else None,
          rndVars(), greedy = rnd.nextInt(4) == 0)
    }
    def contig(): Contiguity = Contiguity.fromName(
      Vector("strict", "relaxed", "nd-relaxed")(rnd.nextInt(3)))
    // a unit = anything the parser accepts in unit position
    // (leaf/group/permute)
    def unit(depth: Int): Pattern =
      if (depth <= 0 || rnd.nextInt(3) > 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => Pattern.Gpat(gen(depth - 1))
        case 1 =>
          val f = rnd.nextInt(3)
          Pattern.GpatTimes(gen(depth - 1), f, f + 1 + rnd.nextInt(2),
            greedy = rnd.nextInt(4) == 0)
        case 2 =>
          Pattern.GpatInf(gen(depth - 1), rnd.nextInt(3),
            if (rnd.nextBoolean()) Some(rndCond()) else None,
            greedy = rnd.nextInt(4) == 0)
        // PERMUTE members are name units (leaves) with fresh names
        case _ =>
          Pattern.Permute(Vector.fill(2 + rnd.nextInt(2))(leaf()))
      }
    // a seq = left-nested combine spine (the render normal form)
    def gen(depth: Int): Pattern = {
      var acc = unit(depth)
      val n = rnd.nextInt(3)
      for (_ <- 0 until n) {
        if (rnd.nextInt(4) == 0)
          acc = Pattern.CombineNot(contig(), acc,
            Pattern.NegSpec(freshName(), types(rnd.nextInt(4)),
              rndCond()),
            if (rnd.nextBoolean()) Pattern.NegMode.NotNext
            else Pattern.NegMode.NotFollowedBy,
            unit(depth))
        else acc = Pattern.Combine(contig(), acc, unit(depth))
      }
      acc
    }
    var trials = 0
    for (t <- 0 until 300) {
      nameN = 0
      val pat = gen(2)
      val names = SparkCep.patternNames(pat)
      val strategy = rnd.nextInt(5) match {
        case 0 => AfterMatchStrategy.NoSkip
        case 1 => AfterMatchStrategy.SkipToNext
        case 2 => AfterMatchStrategy.SkipPastLastEvent
        case 3 => AfterMatchStrategy.SkipToFirst(
          names(rnd.nextInt(names.length)))
        case _ => AfterMatchStrategy.SkipToLast(
          names(rnd.nextInt(names.length)))
      }
      val q = CepQuery(pat, schema, strategy,
        within = if (rnd.nextInt(3) == 0) Some(2 + rnd.nextInt(9))
          else None,
        withinTime = if (rnd.nextInt(4) == 0)
          Some(WithinTime("ts", 1L + rnd.nextInt(100))) else None)
      val sql = CepSql.render(q)
      val back = CepSql.parse(sql, schema)
      assert(back == q, s"trial $t\nSQL:\n$sql\n got=$back\n exp=$q")
      trials += 1
    }
    info(s"$trials random ASTs render->parse round-tripped")
  }

  test("parsed queries execute identically to their Scala-built twins") {
    // not just AST equality — run both through the engine on a stream
    val q = CepSql.parse(
      "PATTERN (a{1,2}! -> y) DEFINE a AS A WHERE v < 5; y AS C", schema)
    val twin = CepQuery(Pattern.Combine(Contiguity.Relaxed,
      Pattern.lpat("a", "A", "v < 5", Contiguity.Strict, 1, 2,
        greedy = true),
      Pattern.spat("y", "C", "True")), schema)
    assert(q == twin)
    val evs = Vector("A", "A", "B", "C").zipWithIndex.map { case (t, k) =>
      Event(t, Vector("id" -> (k + 1).toLong, "v" -> 1L))
    }
    assert(CepOperator.run(q, evs) == CepOperator.run(twin, evs))
    assert(CepOperator.run(q, evs).nonEmpty)
  }

  test("SKIP TO anchors are validated at parse time: single identifier, " +
    "must be a DEFINEd pattern variable (typos cannot silently become " +
    "the NoSkip fallback)") {
    // forgotten variable: 'SKIP TO FIRST' would previously parse as
    // bare-TO sugar with anchor "FIRST"
    val e1 = intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN (a{2,2}~~) DEFINE a AS A " +
        "AFTER MATCH SKIP TO FIRST", schema)
    }
    assert(e1.getMessage.contains("AFTER MATCH SKIP TO"))
    // trailing junk: 'TO NEXT ROWS' is not 'TO NEXT ROW' and must not
    // become SkipToLast("NEXT ROWS")
    val e2 = intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN (a{2,2}~~) DEFINE a AS A " +
        "AFTER MATCH SKIP TO NEXT ROWS", schema)
    }
    assert(e2.getMessage.contains("single column name") ||
      e2.getMessage.contains("AFTER MATCH SKIP"))
    // well-formed identifier that is not a DEFINEd variable
    val e3 = intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN (a{2,2}~~) DEFINE a AS A " +
        "AFTER MATCH SKIP TO LAST z", schema)
    }
    assert(e3.getMessage.contains("not a pattern variable"))
    val e4 = intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN (a{2,2}~~) DEFINE a AS A " +
        "AFTER MATCH SKIP TO z", schema)
    }
    assert(e4.getMessage.contains("not a pattern variable"))
    // a negation guard never binds -- not a valid anchor either
    val e5 = intercept[IllegalArgumentException] {
      CepSql.parse("PATTERN (a ->!fby(n) b) DEFINE a AS A; b AS B; " +
        "n AS C AFTER MATCH SKIP TO FIRST n", schema)
    }
    assert(e5.getMessage.contains("not a pattern variable"))
    // the happy paths keep parsing (bare TO = implicit LAST)
    assert(CepSql.parse("PATTERN (a{2,2}~~) DEFINE a AS A " +
      "AFTER MATCH SKIP TO a", schema).strategy ==
      AfterMatchStrategy.SkipToLast("a"))
  }
}
