package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** MATCH_RECOGNIZE in the FROM clause ([[GraftSql]]): the injected
  * parser path (`spark.sql` on a session built WITH `GraftExtensions`)
  * and the extension-less `GraftSql.sql` path lower through the same
  * rewrite; outer SQL composes over the match frame; errors carry the
  * body position.
  */
class GraftSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    import s.implicits._
    Seq(
      (1L, 1L, "S", 5L), (1L, 2L, "C", 7L), (1L, 3L, "P", 2L),
      (2L, 10L, "C", 1L), (2L, 11L, "S", 3L), (2L, 12L, "C", 9L))
      .toDF("k", "id", "t", "v")
      .createOrReplaceTempView("mr_events")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val body =
    """PATTERN (s -> c) MEASURES FIRST(s) AS s_id, LAST(c) AS c_id,
      |SUM(c.v) AS cv PARTITION BY k ORDER BY id TYPE t IN (S, C, P)
      |DEFINE s AS S; c AS C""".stripMargin

  test("spark.sql: SELECT ... FROM t MATCH_RECOGNIZE (...) through the " +
    "injected parser, with outer projection/filter/order composing") {
    val out = spark.sql(
      s"""SELECT k, s_id, c_id FROM mr_events MATCH_RECOGNIZE ($body)
         |WHERE c_id > 0 ORDER BY k, s_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toVector
    assert(out == Vector((1L, 1L, 2L), (2L, 11L, 12L)))
  }

  test("extension-less path: GraftSql.sql lowers identically") {
    val out = GraftSql.sql(spark,
      s"""SELECT k, cv FROM mr_events MATCH_RECOGNIZE ($body)
         |ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(out == Vector((1L, 7L), (2L, 9L)))
    // statements without MATCH_RECOGNIZE delegate verbatim
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM mr_events").head().getLong(0) == 6L)
  }

  test("round-15 measure surface through the FROM clause: DISTINCT, " +
    "aggregate arguments, physical navigation") {
    val out = spark.sql(
      """SELECT k, n_db, energy, pl FROM mr_events MATCH_RECOGNIZE (
        |PATTERN (s -> c) MEASURES COUNT(DISTINCT c.v / 3) AS n_db,
        |SUM(c.v * c.v) AS energy, PREV(LAST(c.v)) AS pl
        |PARTITION BY k ORDER BY id TYPE t IN (S, C, P)
        |DEFINE s AS S; c AS C) ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toVector
    // k=1: c=id2(v7) after s=id1(v5) → PREV(last c) = s's v; k=2:
    // c=id12(v9) after s=id11(v3) → PREV = 3
    assert(out == Vector((1L, 1L, 49L, 5L), (2L, 1L, 81L, 3L)))
  }

  test("outer aggregation over the match frame") {
    val out = spark.sql(
      s"""SELECT count(*) AS n, sum(cv) AS total
         |FROM mr_events MATCH_RECOGNIZE ($body)""".stripMargin).head()
    assert((out.getLong(0), out.getLong(1)) == (2L, 16L))
  }

  test("ALL ROWS PER MATCH and partition anchors pass through the " +
    "FROM-clause surface") {
    val rows = spark.sql(
      """SELECT k, id, classifier FROM mr_events MATCH_RECOGNIZE (
        |PATTERN (s c) MEASURES COUNT(c) AS n ALL ROWS PER MATCH
        |PARTITION BY k ORDER BY id TYPE t IN (S, C, P)
        |DEFINE s AS S; c AS C) ORDER BY k, id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toVector
    assert(rows == Vector((1L, 1L, "s"), (1L, 2L, "c"),
      (2L, 11L, "s"), (2L, 12L, "c")))
    // '^' anchor: only key 1's journey STARTS with an S
    val anchored = spark.sql(
      """SELECT k, s_id FROM mr_events MATCH_RECOGNIZE (
        |PATTERN (^ s -> c) MEASURES FIRST(s) AS s_id
        |PARTITION BY k ORDER BY id TYPE t IN (S, C, P)
        |DEFINE s AS S; c AS C) ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(anchored == Vector((1L, 1L)))
  }

  test("round-15 continuation surface through the FROM clause: " +
    "SHOW EMPTY MATCHES and multi-column PARTITION BY") {
    // show-empty: nullable c{0,2} under skip-past — every row of key 2
    // surfaces (C rows as singleton matches, the S row as an empty
    // match with n_c = 0 and an interleaved number)
    val se = spark.sql(
      """SELECT match_no, classifier, id, n_c
        |FROM mr_events MATCH_RECOGNIZE (
        |PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c
        |ALL ROWS PER MATCH SHOW EMPTY MATCHES
        |PARTITION BY k ORDER BY id TYPE t IN (S, C, P)
        |DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW)
        |WHERE k = 2 ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) "-" else r.getString(1),
        r.getLong(2), r.getLong(3))).toVector
    assert(se == Vector(
      (1L, "c", 10L, 1L), (2L, "-", 11L, 0L), (3L, "c", 12L, 1L)))
    // multi-key: (k, t) partitions — adjacent same-type rows per key;
    // the original partition columns lead the output schema
    val mk = spark.sql(
      """SELECT k, t, a_id, b_id FROM mr_events MATCH_RECOGNIZE (
        |PATTERN (a b) MEASURES FIRST(a) AS a_id, LAST(b) AS b_id
        |PARTITION BY k, t ORDER BY id TYPE t IN (S, C, P)
        |DEFINE a AS C; b AS C) ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toVector
    assert(mk == Vector((2L, "C", 10L, 12L)))
  }

  test("errors carry the body position and a clear message") {
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        """SELECT * FROM mr_events MATCH_RECOGNIZE (
          |PATTERN (s) DEFINE s AS S)""".stripMargin)
    }
    assert(e.getMessage.contains("MATCH_RECOGNIZE body"), e.getMessage)
    assert(e.getMessage.contains("line 1"), e.getMessage)
    // missing inline universe → the self-contained-spec error surfaces
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(
        """SELECT * FROM mr_events MATCH_RECOGNIZE (
          |PATTERN (s) MEASURES FIRST(s) AS i PARTITION BY k
          |ORDER BY id TYPE t DEFINE s AS S)""".stripMargin)
    }
    assert(e2.getMessage.contains("MATCH_RECOGNIZE body"), e2.getMessage)
  }

  test("composability: TWO MATCH_RECOGNIZE fragments joined in one " +
    "statement (round 16 — the one-per restriction is gone)") {
    val out = spark.sql(
      s"""SELECT x.k, x.s_id, y.c_id
         |FROM mr_events MATCH_RECOGNIZE ($body) x
         |JOIN mr_events MATCH_RECOGNIZE ($body) y ON x.k = y.k
         |ORDER BY x.k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toVector
    assert(out == Vector((1L, 1L, 2L), (2L, 11L, 12L)))
    // UNION ALL shape too — each fragment lowers independently
    val u = spark.sql(
      s"""SELECT 'a' AS q, k FROM mr_events MATCH_RECOGNIZE ($body)
         |UNION ALL
         |SELECT 'b', k FROM mr_events MATCH_RECOGNIZE ($body)
         |ORDER BY q, k""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toVector
    assert(u == Vector(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)))
  }

  test("composability: a parenthesised SUBQUERY source (round 16)") {
    // exclude key 2's leading C — its s->c pair survives unchanged;
    // the subquery parses through the session's own parser
    val out = spark.sql(
      s"""SELECT k, s_id, c_id FROM
         |(SELECT * FROM mr_events WHERE id <> 10)
         |MATCH_RECOGNIZE ($body) ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toVector
    assert(out == Vector((1L, 1L, 2L), (2L, 11L, 12L)))
    // a subquery that CHANGES the frame: drop key 1's C — only key 2
    // matches
    val out2 = GraftSql.sql(spark,
      s"""SELECT k, s_id FROM
         |(SELECT * FROM mr_events WHERE NOT (k = 1 AND t = 'C'))
         |MATCH_RECOGNIZE ($body) ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(out2 == Vector((2L, 11L)))
  }

  test("composability: chained and nested MATCH_RECOGNIZE (round 16)") {
    // nested: the inner MR's ONE-ROW frame (k, s_id, c_id, cv) feeds
    // an outer MR through a subquery that reshapes it into an event
    // stream (type column from the match size, order from s_id)
    val out = spark.sql(
      s"""SELECT k, first_s FROM
         |(SELECT k, s_id, 'M' AS mt FROM mr_events
         |  MATCH_RECOGNIZE ($body))
         |MATCH_RECOGNIZE (
         |PATTERN (m) MEASURES FIRST(m) AS first_s
         |PARTITION BY k ORDER BY s_id TYPE mt IN (M)
         |DEFINE m AS M) ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(out == Vector((1L, 1L), (2L, 11L)))
  }

  test("fuzz: garbage and mutated MR statements parse or fail loudly " +
    "through the full sql path (no crashes, no hangs)") {
    val rnd = new scala.util.Random(20260822L)
    val alphabet = "SELECT FROM MATCH_RECOGNIZE PATTERN DEFINE MEASURES " +
      "PARTITION ORDER TYPE IN AS WHERE mr_events k id t v ()*,.;^$ \n"
    def attempt(sql: String): Unit =
      try { GraftSql.sql(spark, sql); () }
      catch {
        case e @ (_: IllegalArgumentException |
                  _: org.apache.spark.sql.AnalysisException |
                  _: org.apache.spark.sql.catalyst.parser.ParseException) =>
          assert(e.getMessage != null && e.getMessage.nonEmpty, sql)
        case e: Throwable =>
          fail(s"non-loud ${e.getClass.getName}: ${e.getMessage}\n  $sql")
      }
    for (_ <- 0 until 300) {
      val n = 1 + rnd.nextInt(60)
      attempt((0 until n).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val valid = s"SELECT k FROM mr_events MATCH_RECOGNIZE ($body)"
    for (_ <- 0 until 300) {
      val toks = valid.split(' ').toBuffer
      rnd.nextInt(3) match {
        case 0 => toks.remove(rnd.nextInt(toks.length))
        case 1 =>
          val t = toks(rnd.nextInt(toks.length))
          toks.insert(rnd.nextInt(toks.length + 1), t)
        case 2 =>
          val i = rnd.nextInt(toks.length)
          toks(i) = toks(i).drop(1)
      }
      attempt(toks.mkString(" "))
    }
  }

  test("TYPE ... IN universe: DEFINE types must be members; caller " +
    "schema conflicts rejected") {
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        """SELECT * FROM mr_events MATCH_RECOGNIZE (
          |PATTERN (s) MEASURES FIRST(s) AS i PARTITION BY k
          |ORDER BY id TYPE t IN (C, P) DEFINE s AS S)""".stripMargin)
    }
    assert(e.getMessage.contains("missing from the TYPE ... IN"),
      e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.cep.CepSql.parseStatement(
        "PATTERN (s) MEASURES FIRST(s) AS i PARTITION BY k ORDER BY id " +
          "TYPE t IN (S) DEFINE s AS S",
        Vector("S" -> Vector("id")))
    }
    assert(e2.getMessage.contains("drop the IN-list"), e2.getMessage)
  }

  test("relaxed contiguity uses the inline universe for ignore edges " +
    "(a type only in the IN-list is ignorable between units)") {
    // P sits between S and C; with the universe declaring P, the
    // relaxed '->' ignores it. (1: S(1) C(2) direct; 2: S(11) C(12).)
    val out = GraftSql.sql(spark,
      s"""SELECT k, s_id, c_id FROM mr_events MATCH_RECOGNIZE (
         |PATTERN (s -> c) MEASURES FIRST(s) AS s_id, LAST(c) AS c_id
         |PARTITION BY k ORDER BY id TYPE t IN (S, C, P)
         |DEFINE s AS S; c AS C WHERE v > 8) ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toVector
    // key 1: S(1), candidates C(2,v=7) fails cndt (relaxed: binds only
    // the FIRST c-candidate... c-candidate = C failing v>8 is a relaxed
    // ignore), P(3) ignorable via universe, no v>8 C → no match.
    // key 2: S(11) -> C(12,v=9) matches.
    assert(out == Vector((2L, 11L, 12L)))
  }

  // ------------------------------------------------- round-17 surface

  test("quote-aware keyword scan: MATCH_RECOGNIZE inside a string " +
    "literal (or a backticked identifier) delegates untouched") {
    // literal mention only — must NOT be treated as a fragment
    val out = spark.sql(
      "SELECT count(*) AS n FROM mr_events " +
        "WHERE t != 'x MATCH_RECOGNIZE (y)'").collect()
    assert(out.head.getLong(0) == 6L)
    // literal mention alongside a REAL fragment: the real one lowers,
    // the literal one survives as data
    val out2 = spark.sql(
      s"""SELECT k, s_id, 'see MATCH_RECOGNIZE (docs)' AS note
         |FROM mr_events MATCH_RECOGNIZE ($body) ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toVector
    assert(out2 == Vector(
      (1L, 1L, "see MATCH_RECOGNIZE (docs)"),
      (2L, 11L, "see MATCH_RECOGNIZE (docs)")))
    // backticked column named MATCH_RECOGNIZE is not a fragment either
    val out3 = spark.sql(
      "SELECT t AS `MATCH_RECOGNIZE` FROM mr_events WHERE id = 1")
      .collect()
    assert(out3.head.getString(0) == "S")
  }

  test("backtick-quoted source identifiers resolve and alias by the " +
    "unquoted last part") {
    val out = spark.sql(
      s"""SELECT k, s_id FROM `mr_events` MATCH_RECOGNIZE ($body)
         |ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(out == Vector((1L, 1L), (2L, 11L)))
    // alias = unquoted last part: outer qualification works
    val out2 = spark.sql(
      s"""SELECT mr_events.s_id FROM `mr_events` MATCH_RECOGNIZE ($body)
         |ORDER BY mr_events.s_id""".stripMargin)
      .collect().map(_.getLong(0)).toVector
    assert(out2 == Vector(1L, 11L))
  }

  test("error positions for SECOND and later fragments report the " +
    "original statement position") {
    val good = s"mr_events MATCH_RECOGNIZE ($body)"
    // the second body has a parse error (bad DEFINE). Position must be
    // computed against the ORIGINAL text, which is much longer than the
    // placeholder-rewritten text at the time the second body parses.
    val sql =
      s"""SELECT * FROM $good MATCH_RECOGNIZE (PATTERN (z)
         |MEASURES FIRST(z) AS z_id PARTITION BY k ORDER BY s_id
         |TYPE qname IN (S) DEFINE !!!)""".stripMargin
    val e = intercept[IllegalArgumentException](GraftSql.sql(spark, sql))
    val m = """line (\d+), pos (\d+)\)""".r
    val pos = m.findFirstMatchIn(e.getMessage)
    assert(pos.isDefined, e.getMessage)
    val line = pos.get.group(1).toInt
    // the offending body starts on line 1 of the ORIGINAL statement
    // (right after the first, valid fragment); against the REWRITTEN
    // text the first fragment has collapsed to a placeholder and the
    // position would drift left by its length — assert the reported
    // line/pos points into the original text at the second body
    val bodyAt = sql.indexOf("PATTERN (z)")
    val expLine = sql.substring(0, bodyAt).count(_ == '\n') + 1
    assert(line == expLine, s"line $line != $expLine: ${e.getMessage}")
  }

  // ------------------------- curation table operators (round 18) ------

  private def docsView(): Unit = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again", "en"),
      (2L, "the quick brown fox jumps over the lazy dog again", "en"),
      (3L, "the quick brown fox jumps over the lazy cat again", "en"),
      (4L, "completely different text about spark and scala", "en"),
      (5L, "noch ein ganz anderer text", "de"),
      (6L, "und noch einer dazu hier", "de"))
      .toDF("doc_id", "text", "lang")
      .createOrReplaceTempView("cur_docs")
  }

  test("DEDUP_EXACT via spark.sql equals DedupOps.exactDedup, and " +
    "composes with outer SQL") {
    docsView()
    val out = spark.sql(
      """SELECT doc_id, keep_id, group_cnt
        |FROM cur_docs DEDUP_EXACT (ID doc_id TEXT text)
        |ORDER BY doc_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    val prog = ops.DedupOps.exactDedup(spark.table("cur_docs"),
      "doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(out == prog)
    assert(out.take(2) == Vector((1L, 1L, 2L), (2L, 1L, 2L)))
    // outer filter composes: keepers only
    val keepers = spark.sql(
      """SELECT doc_id FROM cur_docs DEDUP_EXACT (ID doc_id TEXT text)
        |WHERE doc_id = keep_id ORDER BY doc_id""".stripMargin)
      .collect().map(_.getLong(0)).toVector
    assert(keepers == Vector(1L, 3L, 4L, 5L, 6L))
    // DIGEST flag: same keep map through the sha2 shuffle key
    val dg = spark.sql(
      """SELECT doc_id, keep_id FROM cur_docs
        |DEDUP_EXACT (ID doc_id TEXT text DIGEST)
        |ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(dg == out.map(t => (t._1, t._2)))
  }

  test("SAMPLE_STRATIFIED and CHUNK_TOKENS via spark.sql equal their " +
    "programmatic ops") {
    docsView()
    val sOut = spark.sql(
      """SELECT doc_id, lang FROM cur_docs
        |SAMPLE_STRATIFIED (ID doc_id STRATUM lang
        |                   RATES ('en' 300, 'de' 800) DEFAULT 600)
        |ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toVector
    val sProg = ops.Sampling.stratifiedSample(spark.table("cur_docs"),
      "doc_id", "lang", Map("en" -> 300, "de" -> 800), defaultMilli = 600)
      .select("doc_id", "lang").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toVector
    assert(sOut == sProg)

    val cOut = spark.sql(
      """SELECT doc_id, chunk_id, tok_off, n_tok, chunk_text
        |FROM cur_docs CHUNK_TOKENS (ID doc_id TEXT text SIZE 4 OVERLAP 1)
        |ORDER BY doc_id, chunk_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toVector
    val cProg = ops.Chunking.chunkByTokens(spark.table("cur_docs"),
      "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toVector
    assert(cOut == cProg)
    assert(cOut.nonEmpty && cOut.head._5.split(" ").length == 4)
  }

  test("DEDUP_MINHASH via spark.sql equals DedupOps.minHashLshPairs, " +
    "and curation ops compose with MATCH_RECOGNIZE in one statement") {
    docsView()
    val mOut = spark.sql(
      """SELECT id1, id2, est_milli FROM cur_docs
        |DEDUP_MINHASH (ID doc_id TEXT text MAX_BUCKET 64)
        |ORDER BY id1, id2""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    val mProg = ops.DedupOps.minHashLshPairs(spark.table("cur_docs"),
      "doc_id", "text", maxBucketSize = 64L).orderBy("id1", "id2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(mOut == mProg)
    // identical docs 1/2 must pair with full signature agreement
    assert(mOut.exists(t => t._1 == 1L && t._2 == 2L && t._3 == 1000L))

    // one statement mixing a curation op and MATCH_RECOGNIZE: dedup
    // keepers joined against a match frame
    val mixed = spark.sql(
      s"""SELECT m.k, m.s_id, d.doc_id
         |FROM mr_events MATCH_RECOGNIZE ($body) AS m
         |JOIN (SELECT doc_id FROM cur_docs
         |      DEDUP_EXACT (ID doc_id TEXT text)
         |      WHERE doc_id = keep_id) AS d
         |  ON d.doc_id = m.k
         |ORDER BY m.k""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(mixed == Vector((1L, 1L, 1L)))
  }

  test("PACK_SHARDS via spark.sql equals Packing.packByBudget") {
    docsView()
    val out = spark.sql(
      """SELECT lang, doc_id, n_tok, start_off, shard_id
        |FROM cur_docs PACK_SHARDS (ID doc_id TEXT text
        |  STRATA (lang) BUDGET 8)
        |ORDER BY lang, doc_id""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toVector
    val prog = ops.Packing.packByBudget(spark.table("cur_docs"),
      "doc_id", "text", Seq("lang"), budgetTokens = 8L)
      .orderBy("lang", "doc_id").collect()
      .map(r => (r.getString(r.fieldIndex("lang")),
        r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("n_tok")),
        r.getLong(r.fieldIndex("start_off")),
        r.getLong(r.fieldIndex("shard_id")))).toVector
    assert(out == prog)
    assert(out.nonEmpty && out.exists(_._5 > 0)) // crosses a shard edge
    // STRATA is required (the op rejects the unstratified window)
    val e = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "SELECT * FROM cur_docs PACK_SHARDS (ID doc_id TEXT text BUDGET 8)"))
    assert(e.getMessage.contains("STRATA"), e.getMessage)
  }

  test("a same-named FUNCTION call is not a fragment (r18): the " +
    "operator keywords only claim occurrences with a plausible source; " +
    "comment mentions delegate too") {
    docsView()
    // a user's scalar UDF that happens to share an operator name —
    // `SELECT chunk_tokens(...)` must delegate to the session parser
    // (the word after SELECT cannot be a table-operator source)
    spark.udf.register("chunk_tokens", (s: String) => s.length)
    val n = spark.sql(
      "SELECT chunk_tokens(text) AS n FROM cur_docs WHERE doc_id = 4")
      .head().getInt(0)
    assert(n == "completely different text about spark and scala".length)
    // ... and in a WHERE clause (preceded by a reserved word)
    val m = spark.sql(
      "SELECT count(*) AS c FROM cur_docs WHERE chunk_tokens(text) > 30")
      .head().getLong(0)
    assert(m > 0)
    // a comment mention is not a fragment — line and bracketed
    val c1 = spark.sql(
      "SELECT count(*) AS c FROM cur_docs -- DEDUP_EXACT (ID doc_id)\n")
      .head().getLong(0)
    assert(c1 == 6L)
    val c2 = spark.sql(
      "SELECT count(*) AS c /* MATCH_RECOGNIZE (x) */ FROM cur_docs")
      .head().getLong(0)
    assert(c2 == 6L)
    // the REAL operator still fires right next to those shapes
    val keep = spark.sql(
      """SELECT count(*) AS c -- DEDUP_EXACT (mention)
        |FROM cur_docs DEDUP_EXACT (ID doc_id TEXT text)
        |WHERE doc_id = keep_id""".stripMargin).head().getLong(0)
    assert(keep == 5L)
  }

  test("curation body errors carry the statement position and section " +
    "names; quote-aware scan leaves literal mentions alone") {
    docsView()
    val e1 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "SELECT * FROM cur_docs DEDUP_EXACT (ID doc_id)"))
    assert(e1.getMessage.contains("TEXT"), e1.getMessage)
    assert(e1.getMessage.contains("line 1"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "SELECT * FROM cur_docs CHUNK_TOKENS (ID doc_id TEXT text " +
        "SIZE 4 OVERLAP 9)"))
    assert(e2.getMessage.contains("overlap"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "SELECT * FROM cur_docs DEDUP_EXACT (BOGUS x ID doc_id TEXT text)"))
    assert(e3.getMessage.contains("BOGUS"), e3.getMessage)
    // a literal-only mention is NOT a fragment — delegates untouched
    val lit = spark.sql(
      "SELECT count(*) AS n FROM cur_docs WHERE text = 'DEDUP_EXACT (x)'")
      .head().getLong(0)
    assert(lit == 0L)
    val lit2 = spark.sql(
      "SELECT count(*) AS n FROM cur_docs WHERE text = \"DEDUP_EXACT (x)\"")
      .head().getLong(0)
    assert(lit2 == 0L)
  }
}
