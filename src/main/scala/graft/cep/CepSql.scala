package graft.cep

/** SQL-native CEP entry point — a MATCH_RECOGNIZE-shaped text form that
  * lowers to the existing [[Pattern]] AST (parser-only: execution is the
  * same compiled DST every other surface uses). Relational users reach
  * CEP without leaving SQL-ish text:
  *
  * {{{
  * CepSql.parse("""
  *   PATTERN (a -> b{1,3}~!)
  *   DEFINE a AS signup;
  *          b AS click WHERE value < 50 LET X = 0 THEN X + value
  *   WITHIN 5
  *   AFTER MATCH SKIP TO NEXT
  * """, schema)
  * }}}
  *
  * Grammar (keywords UPPERCASE; `n`/`m` integers; `expr` the engine's
  * condition language, handed verbatim to `Expr.parse`):
  *
  * {{{
  * query  := PATTERN '(' seq ')' [MEASURES meas (',' meas)*]
  *           DEFINE def (';' def)*
  *           [WITHIN n [ON attr]] [AFTER MATCH SKIP skip]
  * meas   := FN '(' name ['.' attr] ')' AS alias
  *           (FN := COUNT|FIRST|LAST|SUM|MIN|MAX — one flat row per
  *            match; see [[CepMeasures]]. `parse` rejects MEASURES —
  *            use `parseStatement`, whose result carries them)
  * seq    := unit (sep [neg] unit)*
  * sep    :=            (juxtaposition = strict contiguity)
  *         | '->'       (relaxed)
  *         | '~>'       (nd-relaxed)
  * neg    := '!next(' name ')' | '!fby(' name ')'      (negative pattern
  *           at the boundary; the name's DEFINE gives its type/condition)
  * unit   := name [quant] | '(' seq ')' [gquant] [':' name]
  * quant  := ('+' | '*' | '?' | '{' n ',' [m] '}') ['~' | '~~'] ['!']
  *           ('+' = {1,}, '*' = {0,}, '?' = {0,1} (optional);
  *            open upper bound = unbounded loop;
  *            '~' relaxed / '~~' nd-relaxed ITERATION contiguity, strict
  *            by default; trailing '!' = greedy)
  * gquant := ('+' | '*' | '{' n ',' [m] '}') ['!']    (group repeat;
  *           trailing '!' = greedy iterations, as on name quantifiers)
  *           (':' name labels an unbounded group so a DEFINE of the
  *            form `name AS GROUP UNTIL expr` can attach its stop
  *            condition — groups bind no events of their own)
  * def    := name AS event [WHERE expr]
  *           [LET x '=' init THEN update (',' x '=' init THEN update)*]
  *           [UNTIL expr]                              (unbounded loops)
  *         | name AS GROUP [UNTIL expr]                (group labels)
  * skip   := TO NEXT | PAST LAST EVENT | TO FIRST name | TO LAST name
  * }}}
  *
  * `WITHIN n` is the step window; `WITHIN n ON attr` the event-time
  * window over integer attribute `attr`. Sequences of 3+ units fold
  * LEFT: `a b c` = `Combine(Combine(a, b), c)`. A name used in the
  * pattern must have exactly one DEFINE; a defined name may appear once
  * (the DST binds sinks by name). Conditions/updates must not contain
  * the UPPERCASE section keywords — use lowercase attribute names (the
  * engine's attribute convention throughout).
  */
object CepSql {

  // ---------------------------------------------------------------- lexer
  private sealed trait Tok
  private case class TName(s: String) extends Tok
  private case class TNum(n: Int) extends Tok
  private case object TLPar extends Tok
  private case object TRPar extends Tok
  private case object TArrow extends Tok     // ->
  private case object TNdArrow extends Tok   // ~>
  private case object TPlus extends Tok
  private case object TStar extends Tok
  private case object TQmark extends Tok    // ? = {0,1}
  private case object TLBrace extends Tok
  private case object TRBrace extends Tok
  private case object TComma extends Tok
  private case object TColon extends Tok
  private case object TTilde extends Tok     // ~
  private case object TTilde2 extends Tok    // ~~
  private case object TBang extends Tok      // !
  private case class TNeg(mode: Pattern.NegMode) extends Tok // !next( / !fby(

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def err(msg: String) = throw new IllegalArgumentException(
      s"CEP SQL pattern: $msg at '${s.drop(i).take(20)}'")
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += TLPar; i += 1 }
      else if (c == ')') { out += TRPar; i += 1 }
      else if (c == '{') { out += TLBrace; i += 1 }
      else if (c == '}') { out += TRBrace; i += 1 }
      else if (c == ',') { out += TComma; i += 1 }
      else if (c == ':') { out += TColon; i += 1 }
      else if (c == '+') { out += TPlus; i += 1 }
      else if (c == '*') { out += TStar; i += 1 }
      else if (c == '?') { out += TQmark; i += 1 }
      else if (c == '-') {
        if (i + 1 < s.length && s(i + 1) == '>') { out += TArrow; i += 2 }
        else err("expected '->'")
      } else if (c == '~') {
        if (i + 1 < s.length && s(i + 1) == '>') { out += TNdArrow; i += 2 }
        else if (i + 1 < s.length && s(i + 1) == '~') { out += TTilde2; i += 2 }
        else { out += TTilde; i += 1 }
      } else if (c == '!') {
        if (s.startsWith("!next(", i)) {
          out += TNeg(Pattern.NegMode.NotNext); out += TLPar; i += 6
        } else if (s.startsWith("!fby(", i)) {
          out += TNeg(Pattern.NegMode.NotFollowedBy); out += TLPar; i += 5
        } else { out += TBang; i += 1 }
      } else if (c.isDigit) {
        val j = s.indexWhere(!_.isDigit, i)
        val end = if (j < 0) s.length else j
        out += TNum(s.substring(i, end).toInt); i = end
      } else if (c.isLetter || c == '_') {
        val j = s.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_'), i)
        val end = if (j < 0) s.length else j
        out += TName(s.substring(i, end)); i = end
      } else err(s"unexpected character '$c'")
    }
    out.result()
  }

  // ------------------------------------------------- pattern-section parse
  /** Quantifier: (from, to — None = unbounded), iteration contiguity,
    * greedy.
    */
  private case class Quant(from: Int, to: Option[Int],
      contig: Contiguity, greedy: Boolean)

  private sealed trait PU
  private case class PName(name: String, quant: Option[Quant]) extends PU
  private case class PGroup(seq: PSeq,
      gquant: Option[(Int, Option[Int], Boolean)],
      label: Option[String]) extends PU
  /** head unit + (separator contiguity, optional neg name+mode, unit)* */
  private case class PSeq(head: PU,
      tail: Vector[(Contiguity, Option[(Pattern.NegMode, String)], PU)])

  private final class PParser(toks: Vector[Tok]) {
    private var i = 0
    private def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    private def next(): Tok = { val t = toks(i); i += 1; t }
    private def expect(t: Tok, what: String): Unit =
      if (peek.contains(t)) { i += 1 }
      else throw new IllegalArgumentException(
        s"CEP SQL pattern: expected $what, got ${peek.getOrElse("end")}")

    def parseSeq(): PSeq = {
      val head = parseUnit()
      val tail = Vector.newBuilder[
        (Contiguity, Option[(Pattern.NegMode, String)], PU)]
      var done = false
      while (!done) {
        val contig = peek match {
          case Some(TArrow)   => next(); Contiguity.Relaxed
          case Some(TNdArrow) => next(); Contiguity.NdRelaxed
          case Some(TName(_)) | Some(TLPar) | Some(TNeg(_)) =>
            Contiguity.Strict
          case _ => done = true; Contiguity.Strict
        }
        if (!done) {
          val neg = peek match {
            case Some(TNeg(mode)) =>
              next(); expect(TLPar, "'('")
              val n = next() match {
                case TName(s) => s
                case other => throw new IllegalArgumentException(
                  s"CEP SQL pattern: expected negation name, got $other")
              }
              expect(TRPar, "')'")
              Some((mode, n))
            case _ => None
          }
          tail += ((contig, neg, parseUnit()))
        }
      }
      PSeq(head, tail.result())
    }

    private def parseUnit(): PU = next() match {
      case TName(n) => PName(n, parseQuant())
      case TLPar =>
        val s = parseSeq()
        expect(TRPar, "')'")
        val gq = parseGQuant()
        val label = peek match {
          case Some(TColon) =>
            next()
            next() match {
              case TName(l) => Some(l)
              case other => throw new IllegalArgumentException(
                s"CEP SQL pattern: expected a group label after ':', " +
                  s"got $other")
            }
          case _ => None
        }
        PGroup(s, gq, label)
      case other => throw new IllegalArgumentException(
        s"CEP SQL pattern: expected a name or '(', got $other")
    }

    private def parseBounds(): Option[(Int, Option[Int])] = peek match {
      case Some(TPlus)  => next(); Some((1, None))
      case Some(TStar)  => next(); Some((0, None))
      case Some(TQmark) => next(); Some((0, Some(1)))
      case Some(TLBrace) =>
        next()
        val from = next() match {
          case TNum(n) => n
          case other => throw new IllegalArgumentException(
            s"CEP SQL pattern: expected loop lower bound, got $other")
        }
        expect(TComma, "','")
        val to = peek match {
          case Some(TNum(m)) => next(); Some(m)
          case _             => None
        }
        expect(TRBrace, "'}'")
        Some((from, to))
      case _ => None
    }

    private def parseQuant(): Option[Quant] = parseBounds().map {
      case (from, to) =>
        val contig = peek match {
          case Some(TTilde)  => next(); Contiguity.Relaxed
          case Some(TTilde2) => next(); Contiguity.NdRelaxed
          case _             => Contiguity.Strict
        }
        val greedy = peek match {
          case Some(TBang) => next(); true
          case _           => false
        }
        Quant(from, to, contig, greedy)
    }

    private def parseGQuant(): Option[(Int, Option[Int], Boolean)] =
      parseBounds().map { case (f, t) =>
        val g = peek match {
          case Some(TBang) => next(); true
          case _           => false
        }
        (f, t, g)
      }

    def assertDone(): Unit =
      if (i < toks.length) throw new IllegalArgumentException(
        s"CEP SQL pattern: trailing tokens from ${toks(i)}")
  }

  // -------------------------------------------------- DEFINE-section parse
  /** Reserved `AS`-word marking a group-label DEFINE (carries only an
    * UNTIL; groups bind no events).
    */
  private val GroupEvent = "GROUP"

  private case class Def(event: String, cndt: Expr,
      vars: Vector[VarDef], until: Option[Expr])

  /** Scan `text` for the first top-level occurrence of any keyword in
    * `kws` (word-bounded, outside parentheses); return (before, kw,
    * after) or None.
    */
  private def splitAtKeyword(text: String,
      kws: Seq[String]): Option[(String, String, String)] = {
    var depth = 0
    var i = 0
    while (i < text.length) {
      val c = text(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && c.isUpper) {
        for (kw <- kws) {
          val ok = text.startsWith(kw, i) &&
            (i == 0 || !text(i - 1).isLetterOrDigit) &&
            (i + kw.length >= text.length ||
              !text(i + kw.length).isLetterOrDigit)
          if (ok)
            return Some((text.substring(0, i), kw,
              text.substring(i + kw.length)))
        }
      }
      i += 1
    }
    None
  }

  private def parseDef(text: String): (String, Def) = {
    val t = text.trim
    val (name, rest0) = splitAtKeyword(t, Seq("AS")) match {
      case Some((n, _, r)) => (n.trim, r.trim)
      case None => throw new IllegalArgumentException(
        s"CEP SQL DEFINE: missing AS in '$t'")
    }
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"CEP SQL DEFINE: bad name '$name'")
    // event word, then optional WHERE / LET / UNTIL in order
    val (event, rest1) = splitAtKeyword(rest0, Seq("WHERE", "LET", "UNTIL"))
      .map { case (e, kw, r) => (e.trim, Some((kw, r))) }
      .getOrElse((rest0.trim, None))
    require(event.nonEmpty && !event.contains(' '),
      s"CEP SQL DEFINE: bad event type '$event' for '$name'")
    var cndt: Expr = Expr.True
    var vars = Vector.empty[VarDef]
    var until: Option[Expr] = None
    var cursor: Option[(String, String)] = rest1
    while (cursor.isDefined) {
      val (kw, body) = cursor.get
      val (section, nextCur) =
        splitAtKeyword(body, Seq("WHERE", "LET", "UNTIL")) match {
          case Some((b, k2, r2)) => (b.trim, Some((k2, r2)))
          case None              => (body.trim, None)
        }
      kw match {
        case "WHERE" => cndt = Expr.parse(section)
        case "UNTIL" => until = Some(Expr.parse(section))
        case "LET" =>
          vars = section.split(',').toVector.map { item =>
            val eq = item.indexOf('=')
            require(eq > 0, s"CEP SQL LET: expected 'x = init THEN " +
              s"update', got '$item'")
            val vname = item.substring(0, eq).trim
            splitAtKeyword(item.substring(eq + 1), Seq("THEN")) match {
              case Some((init, _, upd)) =>
                VarDef(vname, init.trim.toLong, Expr.parse(upd.trim))
              case None => throw new IllegalArgumentException(
                s"CEP SQL LET: missing THEN in '$item'")
            }
          }
      }
      cursor = nextCur
    }
    name -> Def(event, cndt, vars, until)
  }

  // ------------------------------------------------------------- lowering
  private def lower(seq: PSeq, defs: Map[String, Def]): Pattern = {
    def defOf(n: String): Def = defs.getOrElse(n,
      throw new IllegalArgumentException(
        s"CEP SQL: pattern name '$n' has no DEFINE"))
    def lowerUnit(u: PU): Pattern = u match {
      case PName(n, None) =>
        val d = defOf(n)
        require(d.event != GroupEvent,
          s"CEP SQL: '$n' is DEFINEd AS GROUP — group labels attach to " +
            "'(...)' units, not names")
        require(d.until.isEmpty,
          s"CEP SQL: UNTIL on '$n' needs an unbounded loop quantifier")
        Pattern.Spat(n, d.event, d.cndt, d.vars)
      case PName(n, Some(q)) =>
        val d = defOf(n)
        require(d.event != GroupEvent,
          s"CEP SQL: '$n' is DEFINEd AS GROUP — group labels attach to " +
            "'(...)' units, not names")
        q.to match {
          case Some(m) =>
            require(d.until.isEmpty,
              s"CEP SQL: UNTIL on '$n' needs an unbounded loop " +
                "quantifier ('+', '*' or '{n,}')")
            Pattern.Lpat(n, d.event, d.cndt, q.contig, q.from, m, d.vars,
              q.greedy)
          case None =>
            Pattern.LpatInf(n, d.event, d.cndt, q.contig, q.from, d.until,
              d.vars, q.greedy)
        }
      case PGroup(s, gq, label) =>
        val child = lower(s, defs)
        val until = label.map { l =>
          val d = defOf(l)
          require(d.event == GroupEvent && d.vars.isEmpty &&
            d.cndt == Expr.True,
            s"CEP SQL: group label '$l' needs 'DEFINE $l AS GROUP " +
              "[UNTIL expr]'")
          require(gq.exists(_._2.isEmpty),
            s"CEP SQL: group label '$l' is only meaningful on an " +
              "UNBOUNDED group ('(...)+' / '(...)*' / '(...){n,}')")
          d.until
        }
        gq match {
          case None => Pattern.Gpat(child)
          case Some((f, Some(m), g)) => Pattern.GpatTimes(child, f, m, g)
          case Some((f, None, g)) =>
            Pattern.GpatInf(child, f, until.flatten, g)
        }
    }
    seq.tail.foldLeft(lowerUnit(seq.head)) {
      case (acc, (contig, None, u)) =>
        Pattern.Combine(contig, acc, lowerUnit(u))
      case (acc, (contig, Some((mode, negName)), u)) =>
        val d = defOf(negName)
        require(d.vars.isEmpty && d.until.isEmpty,
          s"CEP SQL: negation '$negName' takes only AS/WHERE")
        Pattern.CombineNot(contig, acc,
          Pattern.NegSpec(negName, d.event, d.cndt), mode, lowerUnit(u))
    }
  }

  // ------------------------------------------------------------ top level
  /** Parse the MATCH_RECOGNIZE-shaped text into a [[CepQuery]] over
    * `schema` (the event-type universe, insertion-ordered — the same
    * schema every other query surface takes; it describes the data, not
    * the pattern).
    */
  /** A parsed CEP SQL statement: the lowered query plus any MEASURES
    * (empty when the statement has no MEASURES clause). Execute with
    * [[CepMeasures.run]], or match `query` yourself and project via
    * [[CepMeasures.project]].
    */
  final case class CepSqlStatement(query: CepQuery,
      measures: Vector[CepMeasures.Measure])

  /** As [[parseStatement]], for statements without MEASURES (rejects a
    * MEASURES clause loudly — a `CepQuery` cannot carry it).
    */
  def parse(sql: String,
      schema: Vector[(String, Vector[String])]): CepQuery = {
    val st = parseStatement(sql, schema)
    require(st.measures.isEmpty,
      "CEP SQL: statement has a MEASURES clause — use parseStatement " +
        "(and CepMeasures.run) instead of parse")
    st.query
  }

  private val MeasureRe =
    """^([A-Z]+)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:\.\s*([A-Za-z_][A-Za-z0-9_]*))?\s*\)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$""".r

  private def parseMeasure(text: String): CepMeasures.Measure =
    text.trim match {
      case MeasureRe(fn, name, attr, alias) =>
        CepMeasures.Measure(CepMeasures.Fn.fromName(fn), name,
          Option(attr), alias)
      case t => throw new IllegalArgumentException(
        s"CEP SQL MEASURES: expected 'FN(name[.attr]) AS alias', got '$t'")
    }

  def parseStatement(sql: String,
      schema: Vector[(String, Vector[String])]): CepSqlStatement = {
    val text = sql.trim
    val (_, _, afterPattern) = splitAtKeyword(text, Seq("PATTERN"))
      .getOrElse(throw new IllegalArgumentException(
        "CEP SQL: missing PATTERN section"))
    // the pattern body is the first balanced (...) group
    val open = afterPattern.indexOf('(')
    require(open >= 0, "CEP SQL: PATTERN needs a parenthesised body")
    var depth = 0
    var close = -1
    var i = open
    while (i < afterPattern.length && close < 0) {
      val c = afterPattern(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) close = i }
      i += 1
    }
    require(close > open, "CEP SQL: unbalanced PATTERN parentheses")
    val patBody = afterPattern.substring(open + 1, close)
    val afterPat = afterPattern.substring(close + 1)

    val (preDefine, _, afterDefineKw) = splitAtKeyword(afterPat,
      Seq("DEFINE"))
      .getOrElse(throw new IllegalArgumentException(
        "CEP SQL: missing DEFINE section"))
    val measures: Vector[CepMeasures.Measure] =
      splitAtKeyword(preDefine, Seq("MEASURES")) match {
        case Some((before, _, mtext)) =>
          require(before.trim.isEmpty,
            s"CEP SQL: unexpected text before MEASURES: '${before.trim}'")
          // measure items carry no nested commas (FN(name[.attr]))
          mtext.split(',').toVector.map(parseMeasure)
        case None => Vector.empty
      }
    val (defsText, tailOpt) =
      splitAtKeyword(afterDefineKw, Seq("WITHIN", "AFTER")) match {
        case Some((d, kw, r)) => (d, Some((kw, r)))
        case None             => (afterDefineKw, None)
      }
    val defs = defsText.split(';').filter(_.trim.nonEmpty)
      .map(parseDef).toVector
    defs.groupBy(_._1).foreach { case (n, ds) =>
      require(ds.length == 1, s"CEP SQL: duplicate DEFINE for '$n'") }
    val defMap = defs.toMap

    var within: Option[Int] = None
    var withinTime: Option[WithinTime] = None
    var strategy: AfterMatchStrategy = AfterMatchStrategy.NoSkip
    var cursor = tailOpt
    while (cursor.isDefined) {
      val (kw, body) = cursor.get
      val (section, nextCur) =
        splitAtKeyword(body, Seq("WITHIN", "AFTER")) match {
          case Some((b, k2, r2)) => (b.trim, Some((k2, r2)))
          case None              => (body.trim, None)
        }
      kw match {
        case "WITHIN" =>
          def num(s: String): Long =
            try s.toLong
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"CEP SQL: WITHIN expects an integer, got '$s'") }
          // the step window is an Int downstream — reject overflow here
          // rather than let `.toInt` truncate (WITHIN 4294967301 must
          // not silently become within=5)
          def stepWindow(n: String): Int = {
            val v = num(n)
            if (v > Int.MaxValue) throw new IllegalArgumentException(
              s"CEP SQL: WITHIN step window $v exceeds ${Int.MaxValue}")
            v.toInt
          }
          section.split("\\s+").toVector match {
            case Vector(n) => within = Some(stepWindow(n))
            case Vector(n, "ON", attr) =>
              withinTime = Some(WithinTime(attr, num(n)))
            case _ => throw new IllegalArgumentException(
              s"CEP SQL: WITHIN expects 'n' or 'n ON attr', got '$section'")
          }
        case "AFTER" =>
          val norm = section.replaceAll("\\s+", " ").trim
          strategy = norm match {
            case "MATCH SKIP TO NEXT"        => AfterMatchStrategy.SkipToNext
            case "MATCH SKIP PAST LAST EVENT" =>
              AfterMatchStrategy.SkipPastLastEvent
            case s if s.startsWith("MATCH SKIP TO FIRST ") =>
              AfterMatchStrategy.SkipToFirst(
                s.stripPrefix("MATCH SKIP TO FIRST ").trim)
            case s if s.startsWith("MATCH SKIP TO LAST ") =>
              AfterMatchStrategy.SkipToLast(
                s.stripPrefix("MATCH SKIP TO LAST ").trim)
            case other => throw new IllegalArgumentException(
              "CEP SQL: AFTER MATCH SKIP expects TO NEXT | PAST LAST " +
                s"EVENT | TO FIRST <name> | TO LAST <name>, got '$other'")
          }
      }
      cursor = nextCur
    }

    val parser = new PParser(lex(patBody))
    val seq = parser.parseSeq()
    parser.assertDone()
    // a DEFINEd name may appear at most once in the pattern: sinks bind
    // by name, so PATTERN (a -> a) would silently merge both positions'
    // bindings into one stream register instead of failing
    def namesOf(s: PSeq): Vector[String] = {
      def unit(u: PU): Vector[String] = u match {
        case PName(n, _)         => Vector(n)
        case PGroup(g, _, label) => namesOf(g) ++ label.toVector
      }
      unit(s.head) ++ s.tail.flatMap { case (_, neg, u) =>
        neg.map(_._2).toVector ++ unit(u) }
    }
    namesOf(seq).groupBy(identity).foreach { case (n, uses) =>
      require(uses.length == 1,
        s"CEP SQL: pattern name '$n' appears ${uses.length} times — " +
          "each DEFINEd name may appear at most once in PATTERN")
    }
    // measure targets must be event-binding DEFINEs with known attrs
    measures.foreach { m =>
      val d = defMap.getOrElse(m.name, throw new IllegalArgumentException(
        s"CEP SQL MEASURES: '${m.name}' has no DEFINE"))
      require(d.event != GroupEvent,
        s"CEP SQL MEASURES: '${m.name}' is a GROUP label — groups bind " +
          "no events to measure")
      m.attr.foreach { a =>
        val attrs = schema.collectFirst { case (e, as) if e == d.event => as }
          .getOrElse(Vector.empty)
        require(attrs.contains(a),
          s"CEP SQL MEASURES: '${m.name}.$a' — event '${d.event}' has " +
            s"no attribute '$a' in the schema")
      }
    }
    measures.groupBy(_.alias).foreach { case (a, ms) =>
      require(ms.length == 1,
        s"CEP SQL MEASURES: duplicate alias '$a'") }
    CepSqlStatement(
      CepQuery(lower(seq, defMap), schema, strategy, within, withinTime),
      measures)
  }

  // --------------------------------------------------------------- render
  /** Render a [[CepQuery]] back to its SQL form —
    * `parse(render(q), q.schema) == q` for every query the grammar can
    * express (property-pinned in `CepSqlSpec` over random ASTs).
    * Combines must be LEFT-nested, the parser's fold normal form: a
    * `Combine`/`CombineNot` as the RIGHT child of a combine has no
    * textual form (parenthesising it would introduce a `Gpat`) and is
    * rejected loudly. A group-nested `gpat-inf` `until` renders through
    * a synthesized group label (`:__g<k>` + `__g<k> AS GROUP UNTIL`).
    * Conditions render via the engine's precedence-parenthesised
    * expression printer, which re-parses to the same AST.
    */
  def render(st: CepSqlStatement): String =
    render(st.query, st.measures)

  def render(q: CepQuery,
      measures: Vector[CepMeasures.Measure] = Vector.empty): String = {
    val defs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var groupN = 0
    def exprS(e: Expr): String = Pattern.ExprRepr(e)
    def addDef(name: String, event: String, cndt: Expr,
        vars: Vector[VarDef], until: Option[Expr]): Unit = {
      require(!defs.contains(name),
        s"CEP SQL render: pattern name '$name' is used twice")
      val sb = new StringBuilder(s"$name AS $event")
      if (cndt != Expr.True) sb ++= s" WHERE ${exprS(cndt)}"
      if (vars.nonEmpty)
        sb ++= " LET " + vars.map(v =>
          s"${v.name} = ${v.initial} THEN ${exprS(v.update)}")
          .mkString(", ")
      until.foreach(u => sb ++= s" UNTIL ${exprS(u)}")
      defs(name) = sb.toString
    }
    def mark(c: Contiguity): String = c match {
      case Contiguity.Strict    => ""
      case Contiguity.Relaxed   => "~"
      case Contiguity.NdRelaxed => "~~"
    }
    def sep(c: Contiguity): String = c match {
      case Contiguity.Strict    => " "
      case Contiguity.Relaxed   => " -> "
      case Contiguity.NdRelaxed => " ~> "
    }
    def unit(p: Pattern): String = p match {
      case s: Pattern.Spat =>
        addDef(s.name, s.event, s.cndt, s.vars, None)
        s.name
      case l: Pattern.Lpat =>
        addDef(l.name, l.event, l.cndt, l.vars, None)
        s"${l.name}{${l.from},${l.to}}${mark(l.contiguity)}" +
          (if (l.greedy) "!" else "")
      case l: Pattern.LpatInf =>
        addDef(l.name, l.event, l.cndt, l.vars, l.until)
        s"${l.name}{${l.from},}${mark(l.contiguity)}" +
          (if (l.greedy) "!" else "")
      case g: Pattern.Gpat      => s"(${seqS(g.child)})"
      case g: Pattern.GpatTimes =>
        val gr = if (g.greedy) "!" else ""
        s"(${seqS(g.child)}){${g.from},${g.to}}$gr"
      case g: Pattern.GpatInf =>
        val gr = if (g.greedy) "!" else ""
        val label = g.until.map { u =>
          groupN += 1
          val n = s"__g$groupN"
          addDef(n, GroupEvent, Expr.True, Vector.empty, Some(u))
          s":$n"
        }.getOrElse("")
        s"(${seqS(g.child)}){${g.from},}$gr$label"
      // combines never reach `unit` (seqS flattens the left spine and
      // rightUnit rejects them); parenthesising one here would silently
      // introduce a Gpat on re-parse, so fail instead
      case _: Pattern.Combine | _: Pattern.CombineNot =>
        throw new IllegalStateException(
          "CEP SQL render: combine reached unit position")
    }
    def rightUnit(p: Pattern): String = p match {
      case _: Pattern.Combine | _: Pattern.CombineNot =>
        throw new IllegalArgumentException(
          "CEP SQL render: combines must be LEFT-nested (the parser's " +
            "fold normal form) — a combine as the right child of a " +
            "combine has no textual form; restructure the pattern or " +
            "wrap the right side in an explicit Gpat group")
      case other => unit(other)
    }
    def seqS(p: Pattern): String = p match {
      case c: Pattern.Combine =>
        s"${seqS(c.left)}${sep(c.contiguity)}${rightUnit(c.right)}"
      case c: Pattern.CombineNot =>
        addDef(c.neg.name, c.neg.event, c.neg.cndt, Vector.empty, None)
        val tok = c.mode match {
          case Pattern.NegMode.NotNext       => "!next"
          case Pattern.NegMode.NotFollowedBy => "!fby"
        }
        val s = sep(c.contiguity)
        // the strict separator is juxtaposition; keep one space before
        // the negation marker
        val sepTok = if (s == " ") " " else s
        s"${seqS(c.left)}$sepTok$tok(${c.neg.name}) ${rightUnit(c.right)}"
      case other => unit(other)
    }
    val body = seqS(q.patseq)
    val measS =
      if (measures.isEmpty) ""
      else "\nMEASURES " + measures.map(m =>
        s"${m.fn.sqlName}(${m.name}${m.attr.fold("")("." + _)}) " +
          s"AS ${m.alias}").mkString(", ") + "\n"
    val sb = new StringBuilder(s"PATTERN ($body)$measS DEFINE ")
    sb ++= defs.values.mkString(";\n       ")
    q.within.foreach(w => sb ++= s"\nWITHIN $w")
    q.withinTime.foreach(wt => sb ++= s"\nWITHIN ${wt.span} ON ${wt.tsAttr}")
    q.strategy match {
      case AfterMatchStrategy.NoSkip => ()
      case AfterMatchStrategy.SkipToNext =>
        sb ++= "\nAFTER MATCH SKIP TO NEXT"
      case AfterMatchStrategy.SkipPastLastEvent =>
        sb ++= "\nAFTER MATCH SKIP PAST LAST EVENT"
      case AfterMatchStrategy.SkipToFirst(a) =>
        sb ++= s"\nAFTER MATCH SKIP TO FIRST $a"
      case AfterMatchStrategy.SkipToLast(a) =>
        sb ++= s"\nAFTER MATCH SKIP TO LAST $a"
    }
    sb.toString
  }
}
