package graft.cep

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming `ONE ROW PER MATCH SHOW EMPTY MATCHES` (round 17): on a
  * WINDOWED query the within window makes every empty-match site's
  * status final in bounded feed distance (`EmptySiteTracker`), so the
  * single-query measures operators — arrival-order AND event-time —
  * emit the batch mode's empty summary rows (COUNT 0 / NULL measures)
  * incrementally. Pinned: batch == stream under NoSkip/SkipToNext and
  * SKIP PAST spans, positional and time windows, the `^` anchor form,
  * micro-batch boundary crossings, the unwindowed rejection, and the
  * codec v7 round-trip.
  */
class StreamingShowEmptySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val schema: Vector[(String, Vector[String])] = Vector(
    "click" -> Vector("event_id", "value"),
    "view" -> Vector("event_id", "value"))
  private val spec = SparkCep.CepSpec(Some("user_id"), "event_id",
    "event_type", Seq("value"))

  /** Canonical row shape: key + measures, NULL → "-". */
  private def canon(rows: Array[Row]): Vector[String] =
    rows.map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) "-" else String.valueOf(r.get(i)))
      .mkString("|")).toVector.sorted

  private def batchRows(st: CepSql.CepSqlStatement,
      evs: Seq[Ev]): Vector[String] = {
    val s = spark
    import s.implicits._
    canon(CepMeasures.run(evs.toDF(), st, spec).collect())
  }

  private def streamRows(st: CepSql.CepSqlStatement, name: String,
      batches: Seq[Seq[Ev]]): Vector[String] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingCep.matchPatternMeasures(mem.toDF(), st, spec)
    val sq = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b =>
      mem.addData(b: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    canon(s.table(name).collect())
  }

  // trailing clicks: every tail position starts a reported match, so
  // no site is left pending when the stream stops (a pending tail is
  // the correct unbounded-stream behavior, but it would differ from
  // batch, which SEES the end)
  private def evsMixed(n: Int, tail: Int, seed: Long): Vector[Ev] = {
    val rnd = new scala.util.Random(seed)
    ((1 to n).map { i =>
      Ev(1L + (i % 2), i.toLong,
        if (rnd.nextInt(3) == 0) "view" else "click",
        rnd.nextInt(9).toLong)
    } ++ (n + 1 to n + tail).flatMap(i => Seq(
      Ev(1L, i.toLong * 2, "click", 1L),
      Ev(2L, i.toLong * 2 + 1, "click", 1L)))).toVector
  }

  test("arrival-order: batch == stream for NoSkip sites (view events " +
    "host empty matches; COUNT 0 / NULL SUM), across micro-batches") {
    val st2 = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c, SUM(c.value) AS sv " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS click WITHIN 3", schema)
    assert(st2.rowsPerMatch == CepSql.RowsPerMatch.OneRowShowEmpty)
    val evs = evsMixed(40, 6, 20260827L)
    val streamed = streamRows(st2, "se_arrival",
      evs.grouped(13).toSeq)
    val batch = batchRows(st2, evs)
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
    // the mode is live: some empty rows exist (views host them)
    assert(streamed.exists(_.endsWith("|0|-")),
      s"no empty rows in $streamed")
  }

  test("arrival-order: SKIP PAST LAST ROW spans cover their rows — " +
    "batch == stream") {
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c, SUM(c.value) AS sv " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS click AFTER MATCH SKIP PAST LAST ROW WITHIN 3",
      schema)
    val evs = evsMixed(40, 6, 20260828L)
    val streamed = streamRows(st, "se_skippast", evs.grouped(9).toSeq)
    val batch = batchRows(st, evs)
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
  }

  test("event-time operator: batch == stream with out-of-order arrival " +
    "(positional window over watermark-released order)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c, SUM(c.value) AS sv " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS click WITHIN 3", schema)
    val evs = evsMixed(40, 6, 20260829L)
    def ts(e: Ev) = new java.sql.Timestamp(e.event_id * 1000)
    val mem = MemoryStream[TsEv]
    val out = StreamingCep.matchPatternMeasuresEventTime(
      mem.toDF(), st, spec, "ts", "5 seconds")
    val sq = out.writeStream.format("memory").queryName("se_et")
      .outputMode("append").start()
    try {
      // shuffle WITHIN each chunk — the reorder buffer restores
      // event-time feed order under the 5 s watermark
      val rnd = new scala.util.Random(7L)
      evs.grouped(10).foreach { b =>
        mem.addData(rnd.shuffle(b.map(e =>
          TsEv(e.user_id, e.event_id, e.event_type, e.value, ts(e)))): _*)
        sq.processAllAvailable()
      }
      // drain the watermark far past the tail
      mem.addData(TsEv(9, 9999, "view", 0,
        new java.sql.Timestamp(10000 * 1000L)))
      sq.processAllAvailable()
      mem.addData(TsEv(9, 10000, "view", 0,
        new java.sql.Timestamp(20000 * 1000L)))
      sq.processAllAvailable()
    } finally sq.stop()
    val streamed = canon(s.table("se_et")
      .where(col("user_id") =!= 9L).collect())
    val batch = batchRows(st, evs)
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
    assert(streamed.exists(_.endsWith("|0|-")))
  }

  test("'^' anchor: a key with no match emits ONE empty row at its " +
    "first event once the window closes; a matching key emits none") {
    val st = CepSql.parseStatement(
      "PATTERN (^ c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS click WITHIN 2", schema)
    // key 1 starts with a view (no match can start there: c{0,2}
    // non-empty needs a click first) → ONE empty row; key 2 starts
    // with a click → real match, no empty row
    val evs = Vector(
      Ev(1, 1, "view", 0), Ev(1, 2, "view", 0), Ev(1, 3, "view", 0),
      Ev(1, 4, "view", 0),
      Ev(2, 10, "click", 5), Ev(2, 11, "view", 0), Ev(2, 12, "view", 0),
      Ev(2, 13, "view", 0))
    val streamed = streamRows(st, "se_anchor", evs.grouped(3).toSeq)
    val batch = batchRows(st, evs)
    assert(streamed == batch, s"$streamed vs $batch")
    assert(streamed.count(_.endsWith("|0")) == 1)
  }

  test("time window (WITHIN n ON attr): sites flush on the monotone " +
    "event-time clock — batch == stream") {
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS click WITHIN 4 ON event_id", schema)
    val evs = evsMixed(30, 5, 20260830L)
    val streamed = streamRows(st, "se_time", evs.grouped(7).toSeq)
    val batch = batchRows(st, evs)
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
  }

  test("RELAXED nullable loop + withinTime: the type prefilter is " +
    "disabled under SHOW EMPTY (ignorable events ARE sites) — " +
    "batch == stream") {
    // c{0,2}~ is all-skippable and withinTime keeps the match
    // operator's pushdown — but the view events it would drop host
    // the empty matches, so SHOW EMPTY must forgo it (as batch does:
    // sites derive from the RAW table)
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}~) MEASURES COUNT(c) AS n_c " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS click WITHIN 6 ON event_id", schema)
    val evs = evsMixed(30, 5, 20260831L)
    assert(evs.exists(_.event_type == "view"))
    val streamed = streamRows(st, "se_prefilter", evs.grouped(8).toSeq)
    val batch = batchRows(st, evs)
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
    // view sites are present (the pushdown would have dropped them)
    assert(streamed.exists(_.endsWith("|0")))
  }

  test("unwindowed streaming SHOW EMPTY rejects with the WINDOWED " +
    "reason; ALL ROWS SHOW EMPTY stays batch-only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES DEFINE c AS click", schema)
    val e = intercept[IllegalArgumentException] {
      StreamingCep.matchPatternMeasures(mem.toDF(), st, spec)
    }
    assert(e.getMessage.contains("WINDOWED"), e.getMessage)
    val stAll = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ALL ROWS PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS click WITHIN 3", schema)
    val e2 = intercept[IllegalArgumentException] {
      StreamingCep.matchPatternMeasures(mem.toDF(), stAll, spec)
    }
    assert(e2.getMessage.contains("batch-only"), e2.getMessage)
  }

  test("SHOW EMPTY composes with event-time NEXT (hold-back + site " +
    "tracker in one operator): streamed rows are a sub-multiset of " +
    "batch, cross-batch NEXT matches and empty sites both emit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val st = CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS click WHERE value < NEXT(value) WITHIN 3", schema)
    // key 1: click(v=1) view click(v=2) click(v=9) click(v=5) ...
    // clicks rise then fall; the view is a site; trailing clicks give
    // followers. The unbounded stream legitimately never resolves the
    // last held event or the trailing unflushed sites — so the gate is
    // sub-multiset plus the specific rows that REQUIRED the
    // composition, not full equality with an input batch can close.
    val evs = Vector(
      Ev(1, 1, "click", 1), Ev(1, 2, "view", 0), Ev(1, 3, "click", 2),
      Ev(1, 4, "click", 9), Ev(1, 5, "click", 5), Ev(1, 6, "click", 6),
      Ev(1, 7, "click", 7), Ev(1, 8, "click", 8), Ev(1, 9, "click", 9),
      Ev(1, 10, "click", 10), Ev(1, 11, "click", 11))
    val mem = MemoryStream[TsEv]
    val out = StreamingCep.matchPatternMeasuresEventTime(
      mem.toDF(), st, spec, "ts", "5 seconds")
    val sq = out.writeStream.format("memory").queryName("se_next")
      .outputMode("append").start()
    try {
      // split so click@3's NEXT (click@4) sits in a later batch
      Seq(evs.take(3), evs.slice(3, 7), evs.drop(7)).foreach { b =>
        mem.addData(b.map(e => TsEv(e.user_id, e.event_id, e.event_type,
          e.value, new java.sql.Timestamp(e.event_id * 1000))): _*)
        sq.processAllAvailable()
      }
      mem.addData(TsEv(9, 9999, "view", 0,
        new java.sql.Timestamp(100000 * 1000L)))
      sq.processAllAvailable()
      mem.addData(TsEv(9, 10000, "view", 0,
        new java.sql.Timestamp(200000 * 1000L)))
      sq.processAllAvailable()
    } finally sq.stop()
    val streamed = canon(spark.table("se_next")
      .where(col("user_id") =!= 9L).collect())
    val batch = batchRows(st, evs)
    // sub-multiset: every streamed row consumes one batch occurrence
    val remaining = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    batch.foreach(r => remaining(r) += 1)
    streamed.foreach { r =>
      assert(remaining(r) > 0, s"streamed row '$r' not in batch $batch")
      remaining(r) -= 1
    }
    // the view site emitted an empty row, and a rising-pair match
    // whose NEXT crossed the 3/4 batch boundary emitted too
    assert(streamed.contains("1|0"), streamed)
    assert(streamed.count(_ == "1|2") >= 1 || streamed.count(_ == "1|1") >= 1,
      streamed)
    assert(streamed.nonEmpty && batch.size >= streamed.size)
  }

  // ---------------------------------------------------- shared scan

  private val sharedMembers: Seq[(String, CepSql.CepSqlStatement)] = Seq(
    // SHOW EMPTY windowed member: turns the union prefilter off and
    // runs gate-less; sites from the FULL feed
    "se" -> CepSql.parseStatement(
      "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c, SUM(c.value) AS sv " +
        "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
        "DEFINE c AS click WITHIN 3", schema),
    // plain member on the same scan — must be unaffected
    "plain" -> CepSql.parseStatement(
      "PATTERN (x y) MEASURES FIRST(x) AS x_id, LAST(y) AS y_id " +
        "DEFINE x AS click; y AS view", schema))

  private def sharedRepr(qname: String, key: Long,
      vals: Map[String, Option[String]]): String =
    s"$qname|$key|" + vals.toVector.sortBy(_._1)
      .map { case (a, v) => s"$a=${v.getOrElse("-")}" }.mkString(",")

  private def sharedBatchReprs(evs: Seq[Ev]): Vector[String] = {
    val s = spark
    import s.implicits._
    CepMeasures.runShared(evs.toDF(), sharedMembers, spec).flatMap {
      case (name, df) =>
        val items = sharedMembers.toMap.apply(name).measures
        df.collect().map { r =>
          val vals = items.map { it =>
            val i = r.fieldIndex(it.alias)
            it.alias -> (if (r.isNullAt(i)) None
              else Some(String.valueOf(r.get(i))))
          }.toMap
          sharedRepr(name, r.getLong(r.fieldIndex("user_id")), vals)
        }
    }.toVector.sorted
  }

  private def sharedStreamReprs(name: String): Vector[String] =
    spark.table(name).collect().map { r =>
      val m = r.getAs[Map[String, Any]]("measures") ++
        r.getAs[Map[String, Any]]("smeasures")
      sharedRepr(r.getString(r.fieldIndex("qname")),
        r.getLong(r.fieldIndex("user_id")),
        m.map { case (k, v) => k -> Option(v).map(String.valueOf) })
    }.toVector.sorted

  test("SHARED scan, arrival-order: a SHOW EMPTY member == batch " +
    "runShared member-for-member; the plain member is unaffected") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = evsMixed(40, 6, 20260901L)
    val batch = sharedBatchReprs(evs)
    assert(batch.exists(x => x.startsWith("se|") && x.endsWith("n_c=0,sv=-")),
      s"fixture has no empty rows: $batch")
    val mem = MemoryStream[Ev]
    val out = StreamingCep.matchPatternsSharedMeasures(mem.toDF(),
      sharedMembers, spec)
    val sq = out.writeStream.format("memory").queryName("se_shared")
      .outputMode("append").start()
    try evs.grouped(11).foreach { b =>
      mem.addData(b: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    val streamed = sharedStreamReprs("se_shared")
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
  }

  test("SHARED scan, event-time: a SHOW EMPTY member == batch " +
    "runShared with out-of-order arrival") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = evsMixed(40, 6, 20260902L)
    val batch = sharedBatchReprs(evs)
    val rnd = new scala.util.Random(11L)
    val mem = MemoryStream[TsEv]
    val out = StreamingCep.matchPatternsSharedMeasuresEventTime(
      mem.toDF(), sharedMembers, spec, "ts", "5 seconds")
    val sq = out.writeStream.format("memory").queryName("se_shared_et")
      .outputMode("append").start()
    try {
      evs.grouped(10).foreach { b =>
        mem.addData(rnd.shuffle(b.map(e => TsEv(e.user_id, e.event_id,
          e.event_type, e.value,
          new java.sql.Timestamp(e.event_id * 1000)))): _*)
        sq.processAllAvailable()
      }
      mem.addData(TsEv(9, 99990, "view", 0,
        new java.sql.Timestamp(100000 * 1000L)))
      sq.processAllAvailable()
      mem.addData(TsEv(9, 99991, "view", 0,
        new java.sql.Timestamp(200000 * 1000L)))
      sq.processAllAvailable()
    } finally sq.stop()
    val streamed = spark.table("se_shared_et")
      .where(col("user_id") =!= 9L).collect().map { r =>
        val m = r.getAs[Map[String, Any]]("measures") ++
          r.getAs[Map[String, Any]]("smeasures")
        sharedRepr(r.getString(r.fieldIndex("qname")),
          r.getLong(r.fieldIndex("user_id")),
          m.map { case (k, v) => k -> Option(v).map(String.valueOf) })
      }.toVector.sorted
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
  }

  test("codec v7 round-trips the SHOW EMPTY section; v6-style payloads " +
    "migrate untracked") {
    import StreamingCep.{CepStateEt, PendingSite}
    val st = CepStateEt(7, Nil, Nil, 123L,
      CepStateCodec.VariantArrival, Nil, Nil,
      trackedEmpty = true,
      pending = Seq(PendingSite(5L, 100L, 3), PendingSite(9L, 200L, 6)))
    val back = CepStateCodec.decode(CepStateCodec.encode(st))
    assert(back.trackedEmpty && back.pending == st.pending)
    // an untracked payload round-trips untracked (the operator refuses
    // to resume a SHOW EMPTY query over it mid-key)
    val plain = CepStateEt(7, Nil, Nil, 123L,
      CepStateCodec.VariantArrival)
    val back2 = CepStateCodec.decode(CepStateCodec.encode(plain))
    assert(!back2.trackedEmpty && back2.pending.isEmpty)
  }

  test("SHARED scan, event-time: a SHOW EMPTY member WITH NEXT rides " +
    "the per-member hold-back (r18) — its rows are a sub-multiset of " +
    "batch with the cross-batch composition rows present; the plain " +
    "member equals batch EXACTLY (it feeds the held tail immediately)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val members: Seq[(String, CepSql.CepSqlStatement)] = Seq(
      "sen" -> CepSql.parseStatement(
        "PATTERN (c{0,2}) MEASURES COUNT(c) AS n_c " +
          "ONE ROW PER MATCH SHOW EMPTY MATCHES " +
          "DEFINE c AS click WHERE value < NEXT(value) WITHIN 3", schema),
      "plain" -> CepSql.parseStatement(
        "PATTERN (x y) MEASURES FIRST(x) AS x_id, LAST(y) AS y_id " +
          "DEFINE x AS click; y AS view", schema))
    // same fixture shape as the single-query composition case: clicks
    // rise then fall, a view hosts a site and closes a plain match
    val evs = Vector(
      Ev(1, 1, "click", 1), Ev(1, 2, "view", 0), Ev(1, 3, "click", 2),
      Ev(1, 4, "click", 9), Ev(1, 5, "click", 5), Ev(1, 6, "click", 6),
      Ev(1, 7, "click", 7), Ev(1, 8, "click", 8), Ev(1, 9, "click", 9),
      Ev(1, 10, "click", 10), Ev(1, 11, "view", 11))
    val mem = MemoryStream[TsEv]
    val out = StreamingCep.matchPatternsSharedMeasuresEventTime(
      mem.toDF(), members, spec, "ts", "5 seconds")
    val sq = out.writeStream.format("memory").queryName("se_next_shared")
      .outputMode("append").start()
    try {
      Seq(evs.take(3), evs.slice(3, 7), evs.drop(7)).foreach { b =>
        mem.addData(b.map(e => TsEv(e.user_id, e.event_id, e.event_type,
          e.value, new java.sql.Timestamp(e.event_id * 1000))): _*)
        sq.processAllAvailable()
      }
      mem.addData(TsEv(9, 9999, "view", 0,
        new java.sql.Timestamp(100000 * 1000L)))
      sq.processAllAvailable()
      mem.addData(TsEv(9, 10000, "view", 0,
        new java.sql.Timestamp(200000 * 1000L)))
      sq.processAllAvailable()
    } finally sq.stop()
    def reprs(qname: String): Vector[String] =
      spark.table("se_next_shared")
        .where(col("user_id") =!= 9L)
        .where(col("qname") === qname).collect().map { r =>
          val m = r.getAs[Map[String, Any]]("measures") ++
            r.getAs[Map[String, Any]]("smeasures")
          m.toVector.sortBy(_._1)
            .map { case (k, v) => Option(v).fold(s"$k=-")(x => s"$k=$x") }
            .mkString(",")
        }.toVector.sorted
    // plain member: full equality — non-NEXT, consumes every released
    // event including the sen member's held tail
    val plainBatch = CepMeasures.run(evs.toDF(), members(1)._2, spec)
      .collect().map { r =>
        Vector("x_id", "y_id").map(a => s"$a=${r.get(r.fieldIndex(a))}")
          .mkString(",")
      }.toVector.sorted
    assert(reprs("plain") == plainBatch, s"plain diverged")
    assert(plainBatch.nonEmpty)
    // sen member: sub-multiset of batch (the held event and the last
    // unflushed sites legitimately never resolve on an unbounded
    // stream), with the composition rows present
    val senBatch = CepMeasures.run(evs.toDF(), members(0)._2, spec)
      .collect().map { r =>
        s"n_c=${r.get(r.fieldIndex("n_c"))}"
      }.toVector.sorted
    val senStreamed = reprs("sen")
    val remaining = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    senBatch.foreach(r => remaining(r) += 1)
    senStreamed.foreach { r =>
      assert(remaining(r) > 0, s"streamed '$r' not in batch $senBatch")
      remaining(r) -= 1
    }
    assert(senStreamed.contains("n_c=0"), senStreamed)  // a flushed site
    assert(senStreamed.exists(_ != "n_c=0"), senStreamed) // a NEXT match
  }
}
