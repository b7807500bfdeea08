package graft

import org.apache.spark.sql.DataFrame

/** SQL-native entry points for the curation ladder (round 18): the
  * highest-traffic pipeline operators exposed as FROM-clause table
  * operators through the injected parser ([[GraftSql]]), so a platform
  * user can run dedup / sampling / chunking from `spark.sql` without
  * writing Scala. The shape mirrors SQL:2016's MATCH_RECOGNIZE postfix
  * convention the parser already rewrites:
  *
  * {{{
  * SELECT * FROM documents DEDUP_EXACT (ID doc_id TEXT text)
  * SELECT * FROM documents DEDUP_MINHASH (ID doc_id TEXT text MAX_BUCKET 64)
  * SELECT * FROM documents
  *   SAMPLE_STRATIFIED (ID doc_id STRATUM lang
  *                      RATES ('en' 300, 'zh' 800) DEFAULT 600)
  * SELECT * FROM documents CHUNK_TOKENS (ID doc_id TEXT text SIZE 32 OVERLAP 8)
  * SELECT * FROM documents
  *   PACK_SHARDS (ID doc_id TEXT text STRATA (lang, source) BUDGET 512)
  * }}}
  *
  * Each operator lowers to EXACTLY the programmatic op (`DedupOps`,
  * `Sampling`, `Chunking`) — the SQL surface adds zero execution paths,
  * so the hash-equality of the SQL form and the Scala form is by
  * construction (spec-pinned in `GraftSqlSpec`, driver-gated by the
  * `sql_*` registry rows). Output schemas are the ops' own:
  * DEDUP_EXACT → `(id, keep_id, group_cnt)`; DEDUP_MINHASH →
  * `(id1, id2, est_milli)` candidate pairs; SAMPLE_STRATIFIED → the
  * input schema filtered; CHUNK_TOKENS → `(id, chunk_id, tok_off,
  * n_tok, chunk_text)`; PACK_SHARDS → `(strata…, id, n_tok,
  * start_off, shard_id)`.
  *
  * Grammar: section keywords are UPPERCASE words (as in the
  * MATCH_RECOGNIZE body); column references are bare identifiers;
  * strata are single-quoted string literals; rates are integers per
  * mille. Sections may appear in any order; unknown or duplicate
  * sections are rejected with the offending word.
  */
object CurationSql {

  /** keyword → body lowering. Keys are the FROM-clause operator names
    * [[GraftSql]] scans for (word-bounded, case-insensitive, followed
    * by a parenthesised body).
    */
  val operators: Map[String, (DataFrame, String) => DataFrame] = Map(
    "DEDUP_EXACT" -> dedupExact _,
    "DEDUP_MINHASH" -> dedupMinhash _,
    "SAMPLE_STRATIFIED" -> sampleStratified _,
    "CHUNK_TOKENS" -> chunkTokens _,
    "PACK_SHARDS" -> packShards _,
  )

  private def dedupExact(input: DataFrame, body: String): DataFrame = {
    val s = new Sections(body, Set("ID", "TEXT", "DIGEST"))
    val byDigest = s.flag("DIGEST")
    ops.DedupOps.exactDedup(input, s.ident("ID"), s.ident("TEXT"),
      byDigest = byDigest)
  }

  private def dedupMinhash(input: DataFrame, body: String): DataFrame = {
    val s = new Sections(body, Set("ID", "TEXT", "MAX_BUCKET"))
    val cap = s.intOpt("MAX_BUCKET").map(_.toLong).getOrElse(Long.MaxValue)
    require(cap > 0, s"MAX_BUCKET must be positive, got $cap")
    ops.DedupOps.minHashLshPairs(input, s.ident("ID"), s.ident("TEXT"),
      maxBucketSize = cap)
  }

  private def sampleStratified(input: DataFrame, body: String): DataFrame = {
    val s = new Sections(body, Set("ID", "STRATUM", "RATES", "DEFAULT"))
    val rates = s.rates("RATES")
    val dflt = s.intOpt("DEFAULT").getOrElse(1000)
    ops.Sampling.stratifiedSample(input, s.ident("ID"),
      s.ident("STRATUM"), rates, defaultMilli = dflt)
  }

  private def chunkTokens(input: DataFrame, body: String): DataFrame = {
    val s = new Sections(body, Set("ID", "TEXT", "SIZE", "OVERLAP"))
    ops.Chunking.chunkByTokens(input, s.ident("ID"), s.ident("TEXT"),
      chunkTokens = s.int("SIZE"),
      overlapTokens = s.intOpt("OVERLAP").getOrElse(0))
  }

  /** `PACK_SHARDS (ID c TEXT c STRATA (c1, c2, …) BUDGET n)` →
    * [[ops.Packing.packByBudget]] — stratified running-sum shard
    * assignment. STRATA is required non-empty: the op itself rejects an
    * unstratified window (single-task at scale; use the programmatic
    * `packGlobalByBudget`, the prefix-sum formulation, for the global
    * shape).
    */
  private def packShards(input: DataFrame, body: String): DataFrame = {
    val s = new Sections(body, Set("ID", "TEXT", "STRATA", "BUDGET"))
    ops.Packing.packByBudget(input, s.ident("ID"), s.ident("TEXT"),
      s.idents("STRATA"), budgetTokens = s.int("BUDGET").toLong)
  }

  // ------------------------------------------------------------ parsing

  /** Tokenize-and-section a curation body: `KW operand` pairs where the
    * operand is an identifier, an integer, a parenthesised rate list,
    * or (for flags) nothing. One pass, no backtracking — each section
    * keyword introduces its operand, every other token is an error.
    */
  private final class Sections(body: String, allowed: Set[String]) {
    private val toks: Vector[String] = tokenize(body)
    private val sections =
      scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    locally {
      var i = 0
      while (i < toks.length) {
        val kw = toks(i)
        require(allowed.contains(kw),
          s"unknown section '$kw' (expected one of " +
            s"${allowed.toSeq.sorted.mkString(", ")})")
        require(!sections.contains(kw), s"duplicate section '$kw'")
        i += 1
        val operand = Vector.newBuilder[String]
        if (i < toks.length && toks(i) == "(") {
          var depth = 0
          var go = true
          while (go && i < toks.length) {
            val t = toks(i)
            if (t == "(") depth += 1
            else if (t == ")") depth -= 1
            operand += t
            i += 1
            if (depth == 0) go = false
          }
          require(!go, s"unbalanced parens after '$kw'")
        } else if (i < toks.length && !allowed.contains(toks(i))) {
          operand += toks(i); i += 1
        }
        sections(kw) = operand.result()
      }
    }

    def flag(kw: String): Boolean = sections.get(kw) match {
      case None     => false
      case Some(op) =>
        require(op.isEmpty, s"'$kw' takes no operand, got '${op.mkString(" ")}'")
        true
    }

    def ident(kw: String): String = sections.get(kw) match {
      case Some(Vector(id))
          if id.headOption.exists(c => c.isLetter || c == '_') &&
            id.forall(c => c.isLetterOrDigit || c == '_') => id
      case Some(other) => throw new IllegalArgumentException(
        s"'$kw' takes a column name, got '${other.mkString(" ")}'")
      case None => throw new IllegalArgumentException(
        s"missing required section '$kw'")
    }

    def int(kw: String): Int = intOpt(kw).getOrElse(
      throw new IllegalArgumentException(s"missing required section '$kw'"))

    def intOpt(kw: String): Option[Int] = sections.get(kw).map {
      case Vector(n) if n.forall(_.isDigit) => n.toInt
      case other => throw new IllegalArgumentException(
        s"'$kw' takes an integer, got '${other.mkString(" ")}'")
    }

    /** `( col , col , … )` — a parenthesised identifier list. */
    def idents(kw: String): Seq[String] = sections.get(kw) match {
      case None => throw new IllegalArgumentException(
        s"missing required section '$kw'")
      case Some(op) =>
        require(op.headOption.contains("(") && op.lastOption.contains(")"),
          s"'$kw' takes a parenthesised column list: (lang, source)")
        val items = op.slice(1, op.length - 1).filterNot(_ == ",")
        require(items.nonEmpty && items.forall(id =>
          id.headOption.exists(c => c.isLetter || c == '_') &&
            id.forall(c => c.isLetterOrDigit || c == '_')),
          s"'$kw' entries must be column names, got " +
            s"'${op.mkString(" ")}'")
        items
    }

    /** `( 'stratum' rate , 'stratum' rate , … )` */
    def rates(kw: String): Map[String, Int] = sections.get(kw) match {
      case None => Map.empty
      case Some(op) =>
        require(op.headOption.contains("(") && op.lastOption.contains(")"),
          s"'$kw' takes a parenthesised list: ('en' 300, 'zh' 800)")
        val items = op.slice(1, op.length - 1)
        // split on commas
        val groups = Vector.newBuilder[Vector[String]]
        var cur = Vector.newBuilder[String]
        items.foreach { t =>
          if (t == ",") { groups += cur.result(); cur = Vector.newBuilder }
          else cur += t
        }
        groups += cur.result()
        groups.result().map {
          case Vector(s, n) if s.startsWith("'") && n.forall(_.isDigit) =>
            s.substring(1, s.length - 1) -> n.toInt
          case other => throw new IllegalArgumentException(
            s"'$kw' entries are <'stratum'> <permille>, got " +
              s"'${other.mkString(" ")}'")
        }.toMap
    }
  }

  /** Identifiers/keywords, integers, `'…'` string literals (no
    * escapes — the dialect's literal rule), and single-char punctuation.
    */
  private def tokenize(body: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < body.length) {
      val c = body(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val end = body.indexOf('\'', i + 1)
        require(end >= 0, "unterminated string literal")
        out += body.substring(i, end + 1)
        i = end + 1
      } else if (c.isLetterOrDigit || c == '_') {
        val st = i
        while (i < body.length &&
          (body(i).isLetterOrDigit || body(i) == '_')) i += 1
        // section keywords are the UPPERCASE words (the CepSql section
        // convention); column names keep their case
        out += body.substring(st, i)
      } else { out += c.toString; i += 1 }
    }
    out.result()
  }
}
