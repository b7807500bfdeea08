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
  * Lowering: the `<table> MATCH_RECOGNIZE (<body>)` fragment is
  * replaced by a placeholder relation in the statement text; the body
  * parses through `CepSql.parseStatement` (empty caller schema — the
  * inline universe) and runs through the standard Catalyst-planned
  * operator + MEASURES projection (`CepMeasures.run`); the placeholder
  * is then substituted with the lowered plan, so arbitrary outer SQL
  * (projections, filters, joins, ORDER BY) composes over the match
  * frame. One MATCH_RECOGNIZE per statement. Errors carry the
  * statement position of the MATCH_RECOGNIZE body.
  *
  * Source restriction: the input must be a NAMED table or view
  * (optionally multipart, `db.events`) — not a parenthesised subquery
  * and not a backtick-quoted identifier. A subquery source falls
  * through to Spark's own parser, which rejects the trailing
  * MATCH_RECOGNIZE parenthesis loudly; name the subquery as a temp
  * view first (which also gives the match a stable input for the
  * ORDER BY column's uniqueness contract).
  */
object GraftSql {

  private val MrHead =
    """(?i)([A-Za-z_][A-Za-z0-9_\.]*)\s+MATCH_RECOGNIZE\s*\(""".r

  /** Fast pre-check so the injected parser costs one scan per statement
    * (case-insensitive contains, no upper-cased copy).
    */
  private[graft] def mentionsMr(sqlText: String): Boolean = {
    val n = "MATCH_RECOGNIZE".length
    var i = 0
    while (i + n <= sqlText.length) {
      if (sqlText.regionMatches(true, i, "MATCH_RECOGNIZE", 0, n))
        return true
      i += 1
    }
    false
  }

  /** Extracted fragment: (prefix, table, body, suffix, bodyOffset). */
  private[graft] final case class MrFragment(prefix: String, table: String,
      body: String, suffix: String, bodyOffset: Int)

  private[graft] def extract(sqlText: String): Option[MrFragment] = {
    val m = MrHead.findFirstMatchIn(sqlText).getOrElse(return None)
    val table = m.group(1)
    // m ends just after '('; scan the balanced body
    val open = m.end - 1
    var depth = 0
    var i = open
    var close = -1
    while (i < sqlText.length && close < 0) {
      val c = sqlText(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) close = i }
      i += 1
    }
    if (close < 0)
      throw err(sqlText, open,
        "MATCH_RECOGNIZE: unbalanced parentheses in the body")
    val suffix = sqlText.substring(close + 1)
    if (MrHead.findFirstMatchIn(suffix).isDefined)
      throw err(sqlText, close,
        "one MATCH_RECOGNIZE per statement is supported")
    Some(MrFragment(sqlText.substring(0, m.start), table,
      sqlText.substring(open + 1, close), suffix, open + 1))
  }

  private def err(sqlText: String, offset: Int, msg: String)
      : IllegalArgumentException = {
    val upTo = sqlText.substring(0, math.min(offset, sqlText.length))
    val line = upTo.count(_ == '\n') + 1
    val col = offset - math.max(0, upTo.lastIndexOf('\n'))
    new IllegalArgumentException(s"$msg (line $line, pos $col)")
  }

  private val Placeholder = "__graft_match_recognize"

  /** Rewrite + lower + substitute, delegating the surrounding statement
    * to `delegate`. Returns None when the text has no MATCH_RECOGNIZE.
    */
  private[graft] def rewritePlan(session: SparkSession,
      delegate: String => LogicalPlan, sqlText: String)
      : Option[LogicalPlan] = {
    if (!mentionsMr(sqlText)) return None
    val frag = extract(sqlText).getOrElse(return None)
    val lowered: DataFrame =
      try {
        val df = session.table(frag.table)
        val st = CepSql.parseStatement(frag.body, Vector.empty)
        // an empty universe is silently degenerate (relaxed-contiguity
        // ignore edges enumerate the declared types — zero types means
        // zero declared-type ignores), so the FROM-clause form REQUIRES
        // the inline IN-list
        require(st.query.schema.nonEmpty,
          "the FROM-clause form needs 'TYPE <col> IN (t1, ..., tn)' — " +
            "the inline event-type universe drives relaxed-contiguity " +
            "ignore edges and must list every type the stream carries")
        CepMeasures.run(df, st)
      } catch {
        case e: IllegalArgumentException =>
          throw err(sqlText, frag.bodyOffset,
            s"MATCH_RECOGNIZE body: ${e.getMessage}")
      }
    val rewritten = frag.prefix + Placeholder + frag.suffix
    val outer = delegate(rewritten)
    Some(outer.transformUp {
      case u: UnresolvedRelation
          if u.multipartIdentifier == Seq(Placeholder) =>
        SubqueryAlias(frag.table.split('.').last,
          lowered.queryExecution.logical)
    })
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
