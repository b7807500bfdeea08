package graft.cep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import SparkCep.CepSpec

/** SQL:2016 `ALL ROWS PER MATCH SHOW EMPTY MATCHES`
  * (`CepMeasures.allRows(showEmpty = true)` + the grammar spelling):
  * when the pattern is NULLABLE (`Pattern.canMatchEmpty`), every input
  * row where a match attempt yields only the empty match emits ONE row
  * with NULL classifier and empty-set measures (COUNT 0, others NULL),
  * numbered IN SEQUENCE with the real matches by site ordinal.
  *
  * Site rules pinned here: under `SkipPastLastEvent` sites are the
  * events outside every match's closed [first-bound, last-bound] span;
  * under `NoSkip`/`SkipToNext` they are the events that start no
  * reported match; under `SkipToFirst/Last a` they are the events
  * outside the PRUNE-ADJUSTED spans [start, max(start, anchor - 1)] —
  * the anchor event gets a fresh attempt and can itself host an empty
  * match, and a match never binding `a` prunes nothing (NoSkip
  * fallback: its span degenerates to its own start). `^`/`$` anchors
  * are rejected loudly; a non-nullable pattern makes the mode a
  * zero-cost no-op.
  */
class CepShowEmptySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val schema: Vector[(String, Vector[String])] = Vector(
    "A" -> Vector("id", "v"), "C" -> Vector("id", "v"),
    "X" -> Vector("id", "v"))

  private def eventsDf(rows: (Long, Long, String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("k", "id", "t", "v")
  }

  /** (key, match_no, classifier-or-"-", id, n_c, sv-or -1) rows. */
  private def shape(df: DataFrame): Vector[(Long, Long, String, Long,
      Long, Long)] =
    df.orderBy("k", "match_no", "id").collect().map { r =>
      (r.getLong(r.fieldIndex("k")),
        r.getLong(r.fieldIndex("match_no")),
        if (r.isNullAt(r.fieldIndex("classifier"))) "-"
        else r.getString(r.fieldIndex("classifier")),
        r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("n_c")),
        if (r.isNullAt(r.fieldIndex("sv"))) -1L
        else r.getLong(r.fieldIndex("sv")))
    }.toVector

  test("parse/render: SHOW EMPTY MATCHES round-trips; OMIT EMPTY " +
    "MATCHES is the explicit default spelling") {
    val show = CepSql.parseStatement(
      "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C", schema)
    assert(show.rowsPerMatch == CepSql.RowsPerMatch.AllRowsShowEmpty)
    assert(CepSql.render(show).contains(
      "ALL ROWS PER MATCH SHOW EMPTY MATCHES"))
    assert(CepSql.parseStatement(CepSql.render(show), schema) == show)
    val omit = CepSql.parseStatement(
      "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c " +
        "ALL ROWS PER MATCH OMIT EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C", schema)
    assert(omit.rowsPerMatch == CepSql.RowsPerMatch.AllRows)
    // OMIT is the default: renders as the plain mode, stable round-trip
    assert(!CepSql.render(omit).contains("OMIT"))
    assert(CepSql.parseStatement(CepSql.render(omit), schema) == omit)
  }

  test("canMatchEmpty: the SQL:2016 nullability lattice") {
    import Pattern._
    val c1 = spat("c", "C", "True")
    val l0 = lpat("a", "A", "True", Contiguity.Strict, 0, 3)
    val l1 = lpat("a", "A", "True", Contiguity.Strict, 1, 3)
    assert(!canMatchEmpty(c1))
    assert(canMatchEmpty(l0) && !canMatchEmpty(l1))
    assert(canMatchEmpty(lpatInf("a", "A", "True", Contiguity.Relaxed, 0)))
    assert(!canMatchEmpty(Combine(Contiguity.Relaxed, l0, c1)))
    assert(canMatchEmpty(Combine(Contiguity.Relaxed, l0,
      lpat("b", "C", "True", Contiguity.Strict, 0, 2))))
    assert(canMatchEmpty(Alt(c1, l0)) && !canMatchEmpty(Alt(c1, l1)))
    assert(canMatchEmpty(GpatTimes(c1, 0, 2)))
    assert(!canMatchEmpty(GpatTimes(c1, 1, 2)))
    assert(canMatchEmpty(Gpat(l0)) && !canMatchEmpty(Gpat(c1)))
    // negation: conservatively NOT nullable (documented)
    assert(!canMatchEmpty(CombineNot(Contiguity.Relaxed, l0,
      negSpec("n", "X", "True"), NegMode.NotNext,
      lpat("b", "C", "True", Contiguity.Strict, 0, 2))))
  }

  test("SKIP PAST LAST ROW: singleton matches + empty sites, " +
    "interleaved numbering") {
    val st = CepSql.parseStatement(
      "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    // key 1: A C C A — reluctant {0,3} under skip-past: each click its
    // own match; A rows are empty-match sites. key 2: clicks only.
    val df = eventsDf(
      (1L, 1L, "A", 9L), (1L, 2L, "C", 5L), (1L, 3L, "C", 7L),
      (1L, 4L, "A", 9L), (2L, 10L, "C", 3L))
    assert(shape(CepMeasures.run(df, st)) == Vector(
      (1L, 1L, "-", 1L, 0L, -1L),
      (1L, 2L, "c", 2L, 1L, 5L),
      (1L, 3L, "c", 3L, 1L, 7L),
      (1L, 4L, "-", 4L, 0L, -1L),
      (2L, 1L, "c", 10L, 1L, 3L)))
  }

  test("SKIP PAST LAST ROW: multi-event spans cover their rows; " +
    "running measures on real matches are untouched") {
    // (c{2,2} | x{0,1}) is nullable via the x branch; the c branch
    // binds two strictly-contiguous clicks, so its span covers both
    val st = CepSql.parseStatement(
      "PATTERN (c{2,2} | x{0,1}) " +
        "MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C; x AS X AFTER MATCH SKIP PAST LAST ROW", schema)
    val df = eventsDf(
      (1L, 1L, "A", 0L), (1L, 2L, "C", 5L), (1L, 3L, "C", 7L),
      (1L, 4L, "A", 0L), (1L, 5L, "X", 2L), (1L, 6L, "C", 1L))
    assert(shape(CepMeasures.run(df, st)) == Vector(
      (1L, 1L, "-", 1L, 0L, -1L),       // site before the pair
      (1L, 2L, "c", 2L, 1L, 5L),        // running
      (1L, 2L, "c", 3L, 2L, 12L),
      (1L, 3L, "-", 4L, 0L, -1L),       // between the pair and the x
      (1L, 4L, "x", 5L, 0L, -1L),       // real match, zero c's
      (1L, 5L, "-", 6L, 0L, -1L)))      // lone click: c{2,2} can't bind
  }

  test("SKIP TO NEXT ROW: sites are the non-start events; NoSkip " +
    "keeps every per-start match under one number each") {
    val st = CepSql.parseStatement(
      "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C", schema)
    // NoSkip (the default): C(1) C(2) A(3) — matches [1], [1,2], [2]
    // (reluctant emits every accepting length under NoSkip); site: 3
    val df = eventsDf(
      (1L, 1L, "C", 4L), (1L, 2L, "C", 6L), (1L, 3L, "A", 0L))
    assert(shape(CepMeasures.run(df, st)) == Vector(
      (1L, 1L, "c", 1L, 1L, 4L),
      (1L, 2L, "c", 1L, 1L, 4L),
      (1L, 2L, "c", 2L, 2L, 10L),
      (1L, 3L, "c", 2L, 1L, 6L),
      (1L, 4L, "-", 3L, 0L, -1L)))
  }

  test("MATCH_NUMBER() measure on an empty row is the interleaved " +
    "number; CLASSIFIER() is NULL") {
    val st = CepSql.parseStatement(
      "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c, " +
        "MATCH_NUMBER() AS mn, CLASSIFIER() AS cl " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    val df = eventsDf((1L, 1L, "A", 0L), (1L, 2L, "C", 5L))
    val out = CepMeasures.run(df, st).orderBy("id").collect().map { r =>
      (r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("match_no")),
        r.getLong(r.fieldIndex("mn")),
        if (r.isNullAt(r.fieldIndex("cl"))) "-"
        else r.getString(r.fieldIndex("cl")))
    }.toVector
    assert(out == Vector((1L, 1L, 1L, "-"), (2L, 2L, 2L, "c")))
  }

  test("exclusion x SHOW EMPTY: excluded real rows vanish, empty " +
    "rows survive the NULL-classifier filter") {
    val st = CepSql.parseStatement(
      "PATTERN ({- c{0,3} -}) MEASURES COUNT(c) AS n_c " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    val df = eventsDf((1L, 1L, "A", 0L), (1L, 2L, "C", 5L))
    val out = CepMeasures.run(df, st).orderBy("id").collect().map { r =>
      (r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("match_no")))
    }.toVector
    // the click row is excluded from output; the empty row (and its
    // interleaved number 1) remains
    assert(out == Vector((1L, 1L)))
  }

  test("non-nullable pattern: SHOW EMPTY MATCHES is a no-op equal to " +
    "plain ALL ROWS PER MATCH") {
    val base = "PATTERN (c{1,3}) MEASURES COUNT(c) AS n_c, " +
      "SUM(c.v) AS sv ALL ROWS PER MATCH%s " +
      "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C"
    val df = eventsDf(
      (1L, 1L, "A", 9L), (1L, 2L, "C", 5L), (1L, 3L, "C", 7L))
    val show = CepMeasures.run(df, CepSql.parseStatement(
      base.format(" SHOW EMPTY MATCHES"), schema))
    val plain = CepMeasures.run(df, CepSql.parseStatement(
      base.format(""), schema))
    assert(shape(show) == shape(plain))
  }

  test("unkeyed feed: sites and numbering over the single global " +
    "partition") {
    val st = CepSql.parseStatement(
      "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "ORDER BY id TYPE t DEFINE c AS C " +
        "AFTER MATCH SKIP PAST LAST ROW", schema)
    val s = spark
    import s.implicits._
    val df = Seq((1L, "A", 2L), (2L, "C", 5L), (3L, "A", 0L))
      .toDF("id", "t", "v")
    val out = CepMeasures.run(df, st).orderBy("id").collect().map { r =>
      (r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("match_no")),
        if (r.isNullAt(r.fieldIndex("classifier"))) "-"
        else r.getString(r.fieldIndex("classifier")))
    }.toVector
    assert(out == Vector((1L, 1L, "-"), (2L, 2L, "c"), (3L, 3L, "-")))
  }

  test("NULL-keyed rows never surface as empty-match sites (the " +
    "operators' null-key drop applies to sites too)") {
    val s = spark
    import s.implicits._
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    val df = Seq(
      (Option(1L), 1L, "A", 0L), (Option(1L), 2L, "C", 5L),
      (Option.empty[Long], 3L, "A", 0L), (Option.empty[Long], 4L, "C", 1L))
      .toDF("k", "id", "t", "v")
    val out = CepMeasures.run(df, st).select("id").collect()
      .map(_.getLong(0)).toVector.sorted
    // rows 3 and 4 carry a NULL key: the NFA never sees them, so they
    // are not matches AND not sites — both skip-past and the
    // NoSkip/SkipToNext anti-join arms must drop them
    assert(out == Vector(1L, 2L))
    val stNext = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C", schema)
    val outNext = CepMeasures.run(df, stNext).select("id").collect()
      .map(_.getLong(0)).toVector.distinct.sorted
    assert(!outNext.contains(3L) && !outNext.contains(4L))
  }

  test("streaming SHOW EMPTY: unwindowed ONE ROW rejects with the " +
    "WINDOWED reason (the windowed form is supported — " +
    "StreamingShowEmptySpec)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev]
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id",
      "event_type", Seq("value"))
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES DEFINE c AS click",
      Vector("click" -> Vector("event_id", "value")))
    val e = intercept[IllegalArgumentException] {
      StreamingCep.matchPatternMeasures(mem.toDF(), st, spec)
    }
    assert(e.getMessage.contains("WINDOWED"), e.getMessage)
  }

  test("SKIP TO LAST anchor: the resume-point click hosts an empty " +
    "match (prune-adjusted spans leave the anchor uncovered)") {
    val st = CepSql.parseStatement(
      "PATTERN (c{2,2} | x{0,1}) " +
        "MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C; x AS X AFTER MATCH SKIP TO LAST c", schema)
    // A C C C A X — anchor pruning keeps BOTH overlapping pairs [2,3]
    // and [3,4] (run 3's first take equals the raised threshold); the
    // prune-adjusted spans cover only each pair's START, so click 4 —
    // bound in a match, covered under SKIP PAST LAST ROW — is a SITE
    // here (the resume point gets a fresh attempt, which yields only
    // the empty match). The x match binds no c: NoSkip fallback, its
    // degenerate span still covers itself.
    val df = eventsDf(
      (1L, 1L, "A", 0L), (1L, 2L, "C", 5L), (1L, 3L, "C", 7L),
      (1L, 4L, "C", 9L), (1L, 5L, "A", 0L), (1L, 6L, "X", 2L))
    assert(shape(CepMeasures.run(df, st)) == Vector(
      (1L, 1L, "-", 1L, 0L, -1L),
      (1L, 2L, "c", 2L, 1L, 5L),
      (1L, 2L, "c", 3L, 2L, 12L),
      (1L, 3L, "c", 3L, 1L, 7L),
      (1L, 3L, "c", 4L, 2L, 16L),
      (1L, 4L, "-", 4L, 0L, -1L),
      (1L, 5L, "-", 5L, 0L, -1L),
      (1L, 6L, "x", 6L, 0L, -1L)))
    // ONE ROW SHOW EMPTY rides the same sites: one summary row per
    // real/empty match, interleaved numbering
    val one = CepSql.parseStatement(
      "PATTERN (c{2,2} | x{0,1}) " +
        "MEASURES COUNT(c) AS n_c, MATCH_NUMBER() AS mn " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C; x AS X AFTER MATCH SKIP TO LAST c", schema)
    val got = CepMeasures.run(df, one).orderBy("mn").collect().map(r =>
      (r.getLong(r.fieldIndex("mn")),
        r.getLong(r.fieldIndex("n_c")))).toVector
    assert(got == Vector((1L, 0L), (2L, 2L), (3L, 2L), (4L, 0L),
      (5L, 0L), (6L, 0L)))
  }

  test("'^' START anchor: the key's first event is the only attempt " +
    "site — one empty match per matchless key") {
    val st = CepSql.parseStatement(
      "PATTERN (^ c{0,2}) MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    // key 1 starts with a click → the reluctant loop's FIRST accept is
    // the singleton [1] (skip-past clears the run set and '^' never
    // re-seeds), which covers the first event — NO site, and events 2-3
    // are not attempt positions under '^' at all; key 2 starts with A →
    // exactly one site at its first event; key 3 (no clicks) → one site
    val df = eventsDf(
      (1L, 1L, "C", 5L), (1L, 2L, "C", 7L), (1L, 3L, "A", 0L),
      (2L, 10L, "A", 0L), (2L, 11L, "C", 4L),
      (3L, 20L, "X", 2L), (3L, 21L, "A", 0L))
    assert(shape(CepMeasures.run(df, st)) == Vector(
      (1L, 1L, "c", 1L, 1L, 5L),
      (2L, 1L, "-", 10L, 0L, -1L),
      (3L, 1L, "-", 20L, 0L, -1L)))
    // NoSkip emits every accepting length from the anchored seed; the
    // sites are unchanged (any match covers the first event)
    val noskip = CepSql.parseStatement(
      "PATTERN (^ c{0,2}) MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C", schema)
    assert(shape(CepMeasures.run(df, noskip)) == Vector(
      (1L, 1L, "c", 1L, 1L, 5L),
      (1L, 2L, "c", 1L, 1L, 5L),
      (1L, 2L, "c", 2L, 2L, 12L),
      (2L, 1L, "-", 10L, 0L, -1L),
      (3L, 1L, "-", 20L, 0L, -1L)))
    // ONE ROW PER MATCH rides the same sites
    val one = CepSql.parseStatement(
      "PATTERN (^ c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    val got = CepMeasures.run(df, one).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("n_c")))).toVector
    assert(got == Vector((1L, 1L), (2L, 0L), (3L, 0L)))
  }

  test("'^' START anchor, UNKEYED: the global first event is the " +
    "single site iff no match is reported") {
    val s = spark
    import s.implicits._
    val st = CepSql.parseStatement(
      "PATTERN (^ c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "ORDER BY id TYPE t DEFINE c AS C " +
        "AFTER MATCH SKIP PAST LAST ROW", schema)
    // starts with A → one global empty site at id 1
    val noMatch = Seq((1L, "A", 0L), (2L, "C", 5L)).toDF("id", "t", "v")
    val got = CepMeasures.run(noMatch, st).collect().map(r =>
      (r.getLong(r.fieldIndex("id")),
        r.isNullAt(r.fieldIndex("classifier")))).toVector
    assert(got == Vector((1L, true)))
    // starts with C → the singleton match covers the site; no empty row
    val matched = Seq((1L, "C", 5L), (2L, "A", 0L)).toDF("id", "t", "v")
    val got2 = CepMeasures.run(matched, st).collect().map(r =>
      (r.getLong(r.fieldIndex("id")),
        r.isNullAt(r.fieldIndex("classifier")))).toVector
    assert(got2 == Vector((1L, false)))
  }

  test("rejections: partition anchors, UNMATCHED combination") {
    val df = eventsDf((1L, 1L, "C", 5L))
    def run(sql: String): Unit =
      CepMeasures.run(df, CepSql.parseStatement(sql, schema)).collect()
    val base = "PATTERN (%s) MEASURES COUNT(c) AS n_c " +
      "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
      "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C%s"
    val e2 = intercept[IllegalArgumentException] {
      run(base.format("c{0,3} $", ""))
    }
    assert(e2.getMessage.contains("partition-end anchor"))
    // the grammar spellings are alternatives of ONE clause — both at
    // once is a duplicate rows-per-match clause
    val e3 = intercept[IllegalArgumentException] {
      CepSql.parseStatement(
        "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c " +
          "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
          "ALL ROWS PER MATCH WITH UNMATCHED ROWS " +
          "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C", schema)
    }
    assert(e3.getMessage.contains("duplicate"))
  }

  test("ONE ROW PER MATCH SHOW EMPTY MATCHES: one summary row per " +
    "empty match, interleaved MATCH_NUMBER, positional tier") {
    val st = CepSql.parseStatement(
      "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c, " +
        "MATCH_NUMBER() AS mn, CLASSIFIER() AS cl " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    assert(st.rowsPerMatch == CepSql.RowsPerMatch.OneRowShowEmpty)
    assert(CepSql.parseStatement(CepSql.render(st), schema) == st)
    // A(1) C(2) A(3): empty, singleton click, empty — numbered 1, 2, 3
    val df = eventsDf((1L, 1L, "A", 0L), (1L, 2L, "C", 5L),
      (1L, 3L, "A", 0L))
    val out = CepMeasures.run(df, st).orderBy("mn").collect().map { r =>
      (r.getLong(r.fieldIndex("mn")), r.getLong(r.fieldIndex("n_c")),
        if (r.isNullAt(r.fieldIndex("cl"))) "-"
        else r.getString(r.fieldIndex("cl")))
    }.toVector
    assert(out == Vector((1L, 0L, "-"), (2L, 1L, "c"), (3L, 0L, "-")))
  }

  test("ONE ROW SHOW EMPTY: attribute-tier measures are NULL over an " +
    "empty match (sentinel explode + left join path)") {
    val st = CepSql.parseStatement(
      "PATTERN (c{0,3}) MEASURES SUM(c.v) AS sv, MIN(c.v) AS mv, " +
        "COUNT(c) AS n_c " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    val df = eventsDf((1L, 1L, "A", 7L), (1L, 2L, "C", 5L))
    val out = CepMeasures.run(df, st).orderBy("n_c").collect().map { r =>
      (if (r.isNullAt(r.fieldIndex("sv"))) -1L
       else r.getLong(r.fieldIndex("sv")),
        if (r.isNullAt(r.fieldIndex("mv"))) -1L
        else r.getLong(r.fieldIndex("mv")),
        r.getLong(r.fieldIndex("n_c")))
    }.toVector
    // the A row's v=7 must NOT leak into the empty match's measures
    assert(out == Vector((-1L, -1L, 0L), (5L, 5L, 1L)))
  }

  test("ONE ROW: explicit OMIT EMPTY MATCHES spelling is the default; " +
    "SHOW on a non-nullable pattern is a no-op") {
    val omit = CepSql.parseStatement(
      "PATTERN (c{0,3}) MEASURES COUNT(c) AS n_c " +
        "ONE ROW PER MATCH OMIT EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t DEFINE c AS C", schema)
    assert(omit.rowsPerMatch == CepSql.RowsPerMatch.OneRow)
    assert(!CepSql.render(omit).contains("OMIT"))
    val base = "PATTERN (c{1,3}) MEASURES COUNT(c) AS n_c " +
      "ONE ROW PER MATCH%s PARTITION BY k ORDER BY id TYPE t DEFINE c AS C"
    val df = eventsDf((1L, 1L, "A", 9L), (1L, 2L, "C", 5L))
    val show = CepMeasures.run(df, CepSql.parseStatement(
      base.format(" SHOW EMPTY MATCHES"), schema)).collect()
    val plain = CepMeasures.run(df, CepSql.parseStatement(
      base.format(""), schema)).collect()
    assert(show.map(_.toString).sorted.toVector ==
      plain.map(_.toString).sorted.toVector)
  }

  test("WITHIN x SHOW EMPTY: a window that kills a match turns its " +
    "rows into empty-match sites") {
    val base = "PATTERN (c{2,2} | x{0,1}) MEASURES COUNT(c) AS n_c " +
      "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
      "PARTITION BY k ORDER BY id TYPE t " +
      "DEFINE c AS C; x AS X WITHIN %d AFTER MATCH SKIP PAST LAST ROW"
    val df = eventsDf(
      (1L, 1L, "C", 5L), (1L, 2L, "C", 7L), (1L, 3L, "X", 2L))
    def got(w: Int) = CepMeasures.run(df,
      CepSql.parseStatement(base.format(w), schema))
      .orderBy("id").collect().map { r =>
        (r.getLong(r.fieldIndex("id")),
          if (r.isNullAt(r.fieldIndex("classifier"))) "-"
          else r.getString(r.fieldIndex("classifier")))
      }.toVector
    // WITHIN 2 keeps the adjacent pair (1 step apart): pair + x match
    assert(got(2) == Vector((1L, "c"), (2L, "c"), (3L, "x")))
    // WITHIN 1 kills it: both clicks become empty-match sites — the
    // site set is derived from the REPORTED matches, after the window
    assert(got(1) == Vector((1L, "-"), (2L, "-"), (3L, "x")))
  }

  test("SUBSET measures over empty rows stay NULL/0 (union of empty " +
    "bindings)") {
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(u) AS n_u, SUM(u.v) AS sv " +
        "SUBSET u = (c) " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    val df = eventsDf((1L, 1L, "A", 9L), (1L, 2L, "C", 4L))
    val out = CepMeasures.run(df, st).orderBy("id").collect().map { r =>
      (r.getLong(r.fieldIndex("id")), r.getLong(r.fieldIndex("n_u")),
        if (r.isNullAt(r.fieldIndex("sv"))) -1L
        else r.getLong(r.fieldIndex("sv")))
    }.toVector
    assert(out == Vector((1L, 0L, -1L), (2L, 1L, 4L)))
  }

  test("SHOW EMPTY member on the batch shared scan equals the solo " +
    "run (the slice rides the same seed-union projection)") {
    val spec = SparkCep.CepSpec(Some("k"), "id", "t", Seq("v"))
    val st1 = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv, " +
        "MATCH_NUMBER() AS mn ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS C AFTER MATCH SKIP PAST LAST ROW", schema)
    val st2 = CepSql.parseStatement(
      "PATTERN (a x) MEASURES FIRST(a) AS a_id, LAST(x) AS x_id " +
        "DEFINE a AS A; x AS X", schema)
    val rnd = new scala.util.Random(20260819L)
    val types = Vector("A", "C", "X")
    val df = eventsDf((1L to 200L).map(i =>
      (i % 4L, i, types(rnd.nextInt(3)), rnd.nextInt(9).toLong)): _*)
    val shared = CepMeasures.runShared(df,
      Seq("se" -> st1, "ax" -> st2), spec).toMap
    def shape(d: DataFrame) = d.collect().map { r =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "-" else r.get(i).toString).mkString("|")
    }.sorted.toVector
    assert(shape(shared("se")) == shape(CepMeasures.run(df, st1, spec)))
    assert(shape(shared("ax")) == shape(CepMeasures.run(df, st2, spec)))
    assert(shape(shared("se")).nonEmpty)
  }

  test("randomized model differential: the relational site pipeline " +
    "equals the in-JVM model over the reported matches, all five " +
    "after-match strategies") {
    val rnd = new scala.util.Random(20260817L)
    val types = Vector("A", "C", "X")
    // the in-JVM model: per reported match, the covered ordinal span
    // under the strategy — [start, end-bound] for skip-past,
    // [start, max(start, anchor-1)] for the anchor strategies (fallback
    // start when the anchor never binds), degenerate [start, start] for
    // NoSkip/SkipToNext (start-only coverage = the anti-join rule,
    // since every span covers its start)
    def modelSites(rows: Seq[(Long, Long, String, Long)],
        frames: Seq[(Long, Map[String, Seq[Long]])],
        skip: String): Set[(Long, Long)] = {
      val spans = frames.map { case (k, byName) =>
        val all = byName.values.flatten
        val start = all.min
        val end =
          if (skip.contains("PAST LAST")) all.max
          else if (skip.contains("TO FIRST") || skip.contains("TO LAST")) {
            val a = skip.trim.split(' ').last
            val b = byName.getOrElse(a, Seq.empty)
            if (b.isEmpty) start
            else math.max(start,
              (if (skip.contains("TO FIRST")) b.min else b.max) - 1L)
          } else start
        (k, start, end)
      }
      rows.collect {
        case (k, id, _, _)
            if spans.forall { case (sk, s, e) =>
              sk != k || id < s || id > e } => (k, id)
      }.toSet
    }
    val skips = Seq("", " AFTER MATCH SKIP TO NEXT ROW",
      " AFTER MATCH SKIP PAST LAST ROW",
      " AFTER MATCH SKIP TO FIRST c", " AFTER MATCH SKIP TO LAST c",
      " AFTER MATCH SKIP TO FIRST x", " AFTER MATCH SKIP TO LAST x")
    // two nullable shapes: the alternation (anchor = branch head) and
    // a sequenced combine (the x anchor sits strictly INSIDE the span,
    // so the prune-adjusted end differs from both skip-past and NoSkip)
    val patterns = Seq("c{2,2} | x{0,1}", "c{0,2} -> x{0,1}")
    for (trial <- 0 until 3; pat <- patterns) {
      val rows = (1L to 150L).map(i =>
        (i % 5L, i, types(rnd.nextInt(3)), rnd.nextInt(9).toLong))
      val df = eventsDf(rows: _*)
      for (skip <- skips) {
        val st = CepSql.parseStatement(
          s"PATTERN ($pat) MEASURES COUNT(c) AS n_c " +
            "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
            "PARTITION BY k ORDER BY id TYPE t " +
            s"DEFINE c AS C; x AS X$skip", schema)
        // the reported matches, independent of the measures pipeline
        val frames = SparkCep.matchPatternExec(df, st.query, st.spec)
          .collect().map { r =>
            (r.getLong(r.fieldIndex("k")),
              Seq("c", "x").map(n =>
                n -> r.getSeq[Long](r.fieldIndex(n))).toMap
                .filter(_._2.nonEmpty))
          }.toSeq
        val engineSites = CepMeasures.run(df, st).collect().collect {
          case r if r.isNullAt(r.fieldIndex("classifier")) =>
            (r.getLong(r.fieldIndex("k")),
              r.getLong(r.fieldIndex("id")))
        }.toSet
        assert(engineSites == modelSites(rows, frames, skip),
          s"trial $trial pattern='$pat' skip='$skip': sites diverge " +
            "from the model")
      }
      // '^' START anchor (any strategy): the key's first event is the
      // only attempt site — a key with no reported match hosts exactly
      // one empty match at its first event, a matched key none
      val stA = CepSql.parseStatement(
        s"PATTERN (^ $pat) MEASURES COUNT(c) AS n_c " +
          "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
          "PARTITION BY k ORDER BY id TYPE t " +
          "DEFINE c AS C; x AS X AFTER MATCH SKIP PAST LAST ROW",
        schema)
      val matchedKeys = SparkCep.matchPatternExec(df, stA.query, stA.spec)
        .select("k").collect().map(_.getLong(0)).toSet
      val firstByKey = rows.groupBy(_._1).map { case (k, evs) =>
        k -> evs.map(_._2).min }
      val modelA = firstByKey.collect {
        case (k, first) if !matchedKeys(k) => (k, first) }.toSet
      val engineA = CepMeasures.run(df, stA).collect().collect {
        case r if r.isNullAt(r.fieldIndex("classifier")) =>
          (r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("id")))
      }.toSet
      assert(engineA == modelA,
        s"trial $trial pattern='^ $pat': anchored sites diverge")
    }
  }

  test("every input row surfaces exactly once under SKIP PAST LAST " +
    "ROW show-empty (partition invariant, randomized)") {
    val rnd = new scala.util.Random(20260816L)
    val types = Vector("A", "C", "X")
    val rows = (1L to 400L).map(i =>
      (i % 7L, i, types(rnd.nextInt(3)), rnd.nextInt(10).toLong))
    val df = eventsDf(rows: _*)
    val st = CepSql.parseStatement(
      "PATTERN (c{2,2} | x{0,1}) " +
        "MEASURES COUNT(c) AS n_c, SUM(c.v) AS sv " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "PARTITION BY k ORDER BY id TYPE t " +
        "DEFINE c AS C; x AS X AFTER MATCH SKIP PAST LAST ROW", schema)
    val out = CepMeasures.run(df, st)
      .select("k", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // under skip-past + show-empty with STRICT spans (no ignorable
    // mid-span rows) every event is either inside exactly one span or
    // exactly one site
    assert(out.length == out.distinct.length)
    val covered = out.toSet
    assert(rows.forall { case (k, id, _, _) => covered((k, id)) },
      "an input row surfaced neither as a match row nor a site")
  }
}
