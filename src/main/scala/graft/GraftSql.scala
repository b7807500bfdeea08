package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.graftbridge.GraftColumnBridge

import graft.cep.{CepMeasures, CepSql}

/** `MATCH_RECOGNIZE` as a true FROM-clause table operator:
  *
  * {{{
  * SELECT user_id, s_id FROM events MATCH_RECOGNIZE (
  *   PATTERN (s -> c) MEASURES FIRST(s) AS s_id, LAST(c) AS c_id
  *   PARTITION BY user_id ORDER BY event_id
  *   TYPE event_type IN (click, purchase, error, signup, view)
  *   DEFINE s AS signup; c AS click
  * ) ORDER BY user_id
  * }}}
  *
  * The parenthesised body is the graft CEP statement dialect
  * ([[graft.cep.CepSql]]) — a DOCUMENTED DEVIATION from SQL:2016's
  * MATCH_RECOGNIZE sub-clauses (whose DEFINE is an arbitrary boolean
  * over classified rows; this engine's model is typed events, so DEFINE
  * names an event type). The body must be SELF-CONTAINED: it carries
  * its own PARTITION BY / ORDER BY, and `TYPE col IN (t1, ..., tn)`
  * declares the event-type universe inline (no caller schema exists at
  * the SQL surface; the universe drives relaxed-contiguity ignore
  * edges, so it must list every type the stream carries).
  *
  * Two entry points, one code path:
  *  - `spark.sql(...)` via the injected parser
  *    (`GraftExtensions.injectParser` → [[GraftSqlParser]]) — install
  *    with `spark.sql.extensions=graft.GraftExtensions`;
  *  - [[sql]] for sessions built without the extension (the Verify
  *    harness session): identical rewrite + lowering, delegating the
  *    surrounding statement to the session's own parser.
  *
  * Lowering (round 16 — COMPOSABLE): each `<source> MATCH_RECOGNIZE
  * (<body>)` fragment is replaced by a distinct placeholder relation,
  * LEFT TO RIGHT, repeating until no fragment remains; each body parses
  * through `CepSql.parseStatement` (empty caller schema — the inline
  * universe) and runs through the standard Catalyst-planned operator +
  * MEASURES projection (`CepMeasures.run`); the placeholders are then
  * substituted back into the delegate-parsed outer plan, so arbitrary
  * outer SQL (projections, filters, joins, set ops, ORDER BY) composes
  * over any number of match frames in one statement. `<source>` may be:
  *
  *  - a NAMED table or view (optionally multipart, `db.events`; each
  *    part may be backtick-quoted — round 17);
  *  - a PARENTHESISED SUBQUERY — `(SELECT …) MATCH_RECOGNIZE (…)`:
  *    the subquery parses through the session's own parser and becomes
  *    the match input (give derived rows a unique ORDER BY column —
  *    the operator's uniqueness contract applies to what it is fed);
  *  - a PRECEDING MATCH_RECOGNIZE fragment — left-to-right rewriting
  *    makes chained `t MATCH_RECOGNIZE (…) MATCH_RECOGNIZE (…)` and
  *    MR-inside-subquery nesting compose naturally (the inner fragment
  *    lowers first; its placeholder resolves inside the outer source).
  *
  * Errors carry the statement position of the offending
  * MATCH_RECOGNIZE body IN THE ORIGINAL STATEMENT (positions are
  * translated back through the placeholder rewrites — round 17). The
  * keyword scan and the balanced-paren scans are quote-aware (a `'…'`
  * string literal — in a body or in the OUTER statement — may contain
  * parentheses or the MATCH_RECOGNIZE keyword itself; a literal-only
  * mention delegates to the session's parser untouched).
  *
  * Round 18: the same postfix `<source> KW ( body )` machinery also
  * rewrites the CURATION table operators — DEDUP_EXACT /
  * DEDUP_MINHASH / SAMPLE_STRATIFIED / CHUNK_TOKENS ([[CurationSql]])
  * — so the highest-traffic pipeline ops are `spark.sql`-invocable and
  * compose with MATCH_RECOGNIZE, joins, and each other in one
  * statement (fragments of all keywords lower leftmost-first through
  * one placeholder pass).
  */
object GraftSql {

  private val Kw = "MATCH_RECOGNIZE"

  /** Every postfix table-operator keyword the rewriter scans for:
    * MATCH_RECOGNIZE plus the curation ladder ([[CurationSql]],
    * round 18) — all share the `<source> KW ( body )` shape and the
    * placeholder machinery.
    */
  private[graft] val AllKws: Vector[String] =
    (Kw +: CurationSql.operators.keys.toVector).sorted

  /** Fast pre-check so the injected parser costs one scan per keyword
    * per statement (case-insensitive contains, no upper-cased copy).
    */
  private[graft] def mentionsMr(sqlText: String): Boolean =
    AllKws.exists(kw => kwIndex(sqlText, 0, kw) >= 0)

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** Index of the next word-boundary MATCH_RECOGNIZE at or after
    * `from`, or -1. QUOTE-AWARE (round 17): the scan tracks
    * single-quote string, double-quote string (Spark SQL accepts both
    * by default — round-18 advisor note) and backtick identifier state
    * from the start of the statement, so `WHERE note = 'foo
    * MATCH_RECOGNIZE (x)'` (or a column named
    * `` `MATCH_RECOGNIZE` ``) is NOT treated as a fragment — such
    * statements delegate to the session's parser untouched, as the
    * paren scans already did for literal parens.
    */
  private def kwIndex(sqlText: String, from: Int, kw: String): Int = {
    var i = 0
    var inStr = false
    var inDq = false
    var inTick = false
    var inLine = false // -- line comment (round 18: a keyword in a
    var blk = 0        // comment is a mention, not a fragment; Spark's
                       // bracketed comments nest, so blk is a depth)
    while (i < sqlText.length) {
      val c = sqlText(i)
      if (inLine) { if (c == '\n') inLine = false; i += 1 }
      else if (blk > 0) {
        if (c == '*' && i + 1 < sqlText.length && sqlText(i + 1) == '/') {
          blk -= 1; i += 2
        } else if (c == '/' && i + 1 < sqlText.length &&
            sqlText(i + 1) == '*') { blk += 1; i += 2 }
        else i += 1
      }
      else if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (inDq) { if (c == '"') inDq = false; i += 1 }
      else if (inTick) { if (c == '`') inTick = false; i += 1 }
      else if (c == '-' && i + 1 < sqlText.length &&
          sqlText(i + 1) == '-') { inLine = true; i += 2 }
      else if (c == '/' && i + 1 < sqlText.length &&
          sqlText(i + 1) == '*') { blk = 1; i += 2 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (c == '"') { inDq = true; i += 1 }
      else if (c == '`') { inTick = true; i += 1 }
      else {
        if (i >= from && i + kw.length <= sqlText.length &&
            sqlText.regionMatches(true, i, kw, 0, kw.length) &&
            (i == 0 || !isIdentChar(sqlText(i - 1))) &&
            (i + kw.length == sqlText.length ||
              !isIdentChar(sqlText(i + kw.length))))
          return i
        i += 1
      }
    }
    -1
  }

  /** Words that cannot BE the source of a postfix table operator. An
    * occurrence whose backward source scan would land on one of these
    * (e.g. `SELECT chunk_tokens(text) FROM docs` — a same-named scalar
    * function; `FROM chunk_tokens(10)` — a table-valued function) is
    * NOT a fragment: it is skipped and the statement delegates to the
    * session parser untouched, so registering the curation operator
    * names costs existing statements nothing (round 18).
    */
  private val NonSourceWords: Set[String] = Set(
    "select", "from", "where", "join", "on", "and", "or", "not", "by",
    "group", "order", "having", "limit", "union", "intersect", "except",
    "distinct", "all", "as", "case", "when", "then", "else", "end",
    "in", "is", "like", "between", "exists", "values", "set", "insert",
    "update", "delete", "with", "over", "partition", "cross", "inner",
    "left", "right", "full", "outer", "semi", "anti", "lateral", "using")

  /** Is there a PLAUSIBLE operator source directly before position
    * `at`? Plausible = a `)` (subquery), a backtick (quoted part), or
    * an identifier whose word is not a reserved clause keyword.
    */
  private def plausibleSourceBefore(sqlText: String, at: Int): Boolean = {
    var k = at - 1
    while (k >= 0 && sqlText(k).isWhitespace) k -= 1
    if (k < 0) false
    else if (sqlText(k) == ')' || sqlText(k) == '`') true
    else if (isIdentChar(sqlText(k))) {
      val end = k
      while (k >= 0 && isIdentChar(sqlText(k))) k -= 1
      !NonSourceWords.contains(
        sqlText.substring(k + 1, end + 1).toLowerCase)
    } else false
  }

  /** Extracted fragment: `source` is a table name (`isSubquery` false)
    * or the inner text of a parenthesised subquery (true); `kw` is the
    * operator keyword the fragment was extracted for (MATCH_RECOGNIZE
    * or a [[CurationSql]] operator).
    */
  private[graft] final case class MrFragment(prefix: String,
      source: String, isSubquery: Boolean, body: String, suffix: String,
      bodyOffset: Int, kw: String = "MATCH_RECOGNIZE")

  /** `orig`/`toOrig` (round 17): after a fragment is rewritten to a
    * placeholder, positions in the working text drift from the user's
    * statement; callers pass the ORIGINAL text plus a translator so
    * errors for second and later fragments still report the position
    * in what the user wrote.
    */
  private[graft] def extract(sqlText: String, orig: String = null,
      toOrig: Int => Int = identity): Option[MrFragment] = {
    def errAt(offset: Int, msg: String): IllegalArgumentException =
      err(if (orig == null) sqlText else orig, toOrig(offset), msg)
    // the LEFTMOST fragment of ANY registered operator keyword wins —
    // nested/chained fragments then lower inside-out across keywords,
    // exactly as chained MATCH_RECOGNIZE always has. Keyword
    // occurrences not followed by '(' are skipped (e.g. a mention in
    // some outer clause — let the delegate parser judge those).
    val hit: Option[(Int, Int, String)] = AllKws.flatMap { kw =>
      var at = kwIndex(sqlText, 0, kw)
      var open0 = -1
      while (at >= 0 && open0 < 0) {
        var j = at + kw.length
        while (j < sqlText.length && sqlText(j).isWhitespace) j += 1
        // a fragment needs BOTH a parenthesised body and a plausible
        // source — `SELECT chunk_tokens(x)` (same-named function) or
        // `FROM chunk_tokens(10)` (TVF) skip here and delegate
        if (j < sqlText.length && sqlText(j) == '(' &&
            plausibleSourceBefore(sqlText, at)) open0 = j
        else at = kwIndex(sqlText, at + 1, kw)
      }
      if (at >= 0) Some((at, open0, kw)) else None
    }.minByOption(_._1)
    if (hit.isEmpty) return None
    val (at, open, fragKw) = hit.get
    // balanced, quote-aware forward scan for the body (both string
    // quote styles, mirroring kwIndex — a double-quoted literal with a
    // lone paren must not unbalance the scan)
    var depth = 0
    var inStr = false
    var inDq = false
    var i = open
    var close = -1
    while (i < sqlText.length && close < 0) {
      val c = sqlText(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inDq) { if (c == '"') inDq = false }
      else if (c == '\'') inStr = true
      else if (c == '"') inDq = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) close = i }
      i += 1
    }
    if (close < 0)
      throw errAt(open,
        s"$fragKw: unbalanced parentheses in the body")
    val body = sqlText.substring(open + 1, close)
    val suffix = sqlText.substring(close + 1)
    // backward source scan: a parenthesised subquery or a named table
    var k = at - 1
    while (k >= 0 && sqlText(k).isWhitespace) k -= 1
    if (k < 0)
      throw errAt(at,
        s"$fragKw has no source — write " +
          s"'<table|(subquery)> $fragKw (…)'")
    if (sqlText(k) == ')') {
      var depth2 = 0
      var inStr2 = false
      var inDq2 = false
      var p = k
      var openSrc = -1
      // quote-aware backward scan (both quote styles): a quote toggles
      // string state; this is exact when literals contain no escaped
      // quotes (the dialect has none)
      while (p >= 0 && openSrc < 0) {
        val c = sqlText(p)
        if (inStr2) { if (c == '\'') inStr2 = false }
        else if (inDq2) { if (c == '"') inDq2 = false }
        else if (c == '\'') inStr2 = true
        else if (c == '"') inDq2 = true
        else if (c == ')') depth2 += 1
        else if (c == '(') { depth2 -= 1; if (depth2 == 0) openSrc = p }
        p -= 1
      }
      if (openSrc < 0)
        throw errAt(k,
          s"$fragKw: unbalanced parentheses in the subquery " +
            "source")
      Some(MrFragment(sqlText.substring(0, openSrc),
        sqlText.substring(openSrc + 1, k), isSubquery = true, body,
        suffix, open + 1, fragKw))
    } else {
      // named (optionally multipart) table, each part bare or
      // backtick-quoted (round 17): scan segments right-to-left —
      // a `...` segment may contain any character except a backtick
      var p = k
      var done = false
      while (!done && p >= 0) {
        if (sqlText(p) == '`') {
          val q = sqlText.lastIndexOf('`', p - 1)
          if (q < 0)
            throw errAt(p,
              s"$fragKw: unbalanced backtick in the source " +
                "identifier")
          p = q - 1
        } else {
          val st = p
          while (p >= 0 && isIdentChar(sqlText(p))) p -= 1
          if (p == st) done = true // nothing consumed: name ends here
        }
        if (!done) {
          if (p >= 0 && sqlText(p) == '.') p -= 1 else done = true
        }
      }
      val table = sqlText.substring(p + 1, k + 1)
      if (table.isEmpty)
        throw errAt(at,
          s"$fragKw source must be a named table/view or a " +
            "parenthesised subquery")
      Some(MrFragment(sqlText.substring(0, p + 1), table,
        isSubquery = false, body, suffix, open + 1, fragKw))
    }
  }

  /** The alias a named source resolves under: the last name part,
    * unquoted (`db.events` and `` db.`events` `` both alias `events`).
    */
  private[graft] def lastNamePart(source: String): String =
    if (source.endsWith("`")) {
      val q = source.lastIndexOf('`', source.length - 2)
      source.substring(q + 1, source.length - 1)
    } else source.substring(source.lastIndexOf('.') + 1)

  private def err(sqlText: String, offset: Int, msg: String)
      : IllegalArgumentException = {
    val upTo = sqlText.substring(0, math.min(offset, sqlText.length))
    val line = upTo.count(_ == '\n') + 1
    val col = offset - math.max(0, upTo.lastIndexOf('\n'))
    new IllegalArgumentException(s"$msg (line $line, pos $col)")
  }

  private val Placeholder = "__graft_match_recognize"

  /** Substitute lowered placeholder relations into `plan` (each under
    * its alias — the source table's last name part, or `mr` for
    * subquery sources, so outer qualification keeps working).
    */
  private def substitute(plan: LogicalPlan,
      lowered: collection.Map[String, (String, DataFrame)]): LogicalPlan =
    plan.transformUp {
      case u: UnresolvedRelation
          if u.multipartIdentifier.length == 1 &&
            lowered.contains(u.multipartIdentifier.head) =>
        val (alias, df) = lowered(u.multipartIdentifier.head)
        SubqueryAlias(alias, df.queryExecution.logical)
    }

  /** Rewrite + lower + substitute, delegating the surrounding statement
    * to `delegate`. Returns None when the text has no MATCH_RECOGNIZE
    * fragment.
    */
  private[graft] def rewritePlan(session: SparkSession,
      delegate: String => LogicalPlan, sqlText: String)
      : Option[LogicalPlan] = {
    if (!mentionsMr(sqlText)) return None
    val lowered =
      scala.collection.mutable.LinkedHashMap.empty[String, (String, DataFrame)]
    var text = sqlText
    var idx = 0
    var go = true
    // placeholder rewrites applied so far, newest first, each
    // `(regionStart, nameLen, regionLen)` in the text it was applied
    // to — inverted newest-first, they translate a position in the
    // working text back to the user's original statement, so error
    // line/pos reporting never drifts after the first fragment
    var edits: List[(Int, Int, Int)] = Nil
    def toOrig(off: Int): Int =
      edits.foldLeft(off) { case (o, (start, nameLen, regionLen)) =>
        if (o < start) o
        else if (o >= start + nameLen) o + (regionLen - nameLen)
        else start
      }
    while (go) {
      extract(text, sqlText, toOrig) match {
        case None => go = false
        case Some(frag) =>
          val name = s"${Placeholder}_$idx"
          idx += 1
          val input: DataFrame =
            if (frag.isSubquery)
              GraftColumnBridge.ofRows(session,
                substitute(delegate(frag.source), lowered))
            else lowered.get(frag.source) match {
              // chained MR: the source is a fragment lowered earlier
              case Some((_, df)) => df
              case None          => session.table(frag.source)
            }
          val df: DataFrame =
            try {
              if (frag.kw == Kw) {
                val st = CepSql.parseStatement(frag.body, Vector.empty)
                // an empty universe is silently degenerate
                // (relaxed-contiguity ignore edges enumerate the declared
                // types — zero types means zero declared-type ignores), so
                // the FROM-clause form REQUIRES the inline IN-list
                require(st.query.schema.nonEmpty,
                  "the FROM-clause form needs 'TYPE <col> IN (t1, ..., " +
                    "tn)' — the inline event-type universe drives " +
                    "relaxed-contiguity ignore edges and must list every " +
                    "type the stream carries")
                CepMeasures.run(input, st)
              } else CurationSql.operators(frag.kw)(input, frag.body)
            } catch {
              case e: IllegalArgumentException =>
                throw err(sqlText, toOrig(frag.bodyOffset),
                  s"${frag.kw} body: ${e.getMessage}")
            }
          val alias =
            if (!frag.isSubquery) lastNamePart(frag.source)
            else if (frag.kw == Kw) "mr"
            else frag.kw.toLowerCase
          lowered(name) = (alias, df)
          val regionLen =
            text.length - frag.prefix.length - frag.suffix.length
          edits = (frag.prefix.length, name.length, regionLen) :: edits
          text = frag.prefix + name + frag.suffix
      }
    }
    if (lowered.isEmpty) return None
    Some(substitute(delegate(text), lowered))
  }

  /** The extension-less entry point: same lowering as the injected
    * parser, delegating the outer statement to the session's parser.
    */
  def sql(session: SparkSession, sqlText: String): DataFrame = {
    val parser = session.sessionState.sqlParser
    rewritePlan(session, parser.parsePlan, sqlText) match {
      case Some(plan) => GraftColumnBridge.ofRows(session, plan)
      case None       => session.sql(sqlText)
    }
  }
}

/** The injected parser ([[GraftExtensions]]): intercepts statements
  * containing MATCH_RECOGNIZE, delegates everything else verbatim.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.rewritePlan(session, delegate.parsePlan, sqlText)
      .getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    GraftSql.rewritePlan(session, delegate.parseQuery, sqlText)
      .getOrElse(delegate.parseQuery(sqlText))
  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}
