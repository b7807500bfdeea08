package graft.cep

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming CEP: per-key `flatMapGroupsWithState` holding the
  * NFA run-set `(i, S)` as explicit state (SURVEY.md §3 target lifecycle).
  *
  * The reference semantics are processing-time / arrival-order
  * (`exp/genjava.py:93-94` pins `inProcessingTime`), so events are fed in
  * micro-batch arrival order per key — there is no watermark/event-time
  * reordering, matching the reference exactly. State size is bounded by the
  * pattern's live-run count; skip strategies and `until` prune it.
  *
  * The DST is recompiled per executor from the broadcast query (compilation
  * is deterministic, so state names in stored runs resolve stably across
  * batches and restarts).
  */
object StreamingCep {

  /** State-store configuration for corpus-scale streaming CEP: the
    * default HDFSBackedStateStoreProvider keeps EVERY key's state (k
    * codec-versioned run-sets + the reorder buffer in the shared
    * operators) as deserialized JVM objects in executor memory — at
    * corpus-scale key cardinality that map is the first OOM. RocksDB
    * keeps working state off-heap/on-disk with an in-memory block
    * cache, so per-executor memory is bounded by the cache size, not
    * the key count; changelog checkpointing uploads per-batch deltas
    * instead of full snapshots, keeping commit latency flat as state
    * grows.
    *
    * The provider is a per-QUERY setting read from the session conf at
    * stream start — apply via `useRocksDbStateStore(spark)` (or merge
    * `rocksDbStateStoreConfs` into the session/builder) BEFORE
    * `.writeStream...start()`. The state PAYLOAD is provider-agnostic
    * (the store holds the `CepStateCodec` versioned binary + Spark's
    * row encoding of the state case classes), so checkpoints restart
    * under RocksDB exactly as under the default provider — pinned by
    * `RocksDbCepStateSpec`. The provider itself, however, must not be
    * switched on an EXISTING checkpoint's state directory (Spark
    * persists provider-specific files); pick it at first start.
    */
  val rocksDbStateStoreConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // delta uploads per commit instead of full rocksdb snapshots
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** Apply `rocksDbStateStoreConfs` to the session (takes effect for
    * queries started afterwards).
    */
  def useRocksDbStateStore(spark: org.apache.spark.sql.SparkSession): Unit =
    rocksDbStateStoreConfs.foreach { case (k, v) => spark.conf.set(k, v) }

  /** Serializable event binding (attr names/values in order; `sNames`/
    * `sVals` are the STRING attributes — round 16, codec v6).
    */
  final case class SerEvent(tpe: String, names: Seq[String], vals: Seq[Long],
      sNames: Seq[String] = Nil, sVals: Seq[String] = Nil)

  /** A buffered not-yet-processed event for the event-time variant. */
  final case class BufEvent(ts: Long, ord: Long, tpe: String,
      names: Seq[String], vals: Seq[Long],
      sNames: Seq[String] = Nil, sVals: Seq[String] = Nil)

  /** A not-yet-final empty-match candidate site (streaming `SHOW EMPTY
    * MATCHES`, round 17 — codec v7): the fed event's ordinal, the
    * withinTime clock at its feed, and its per-key feed index. A site
    * leaves the set either covered (a reported match's prune-adjusted
    * span reached it) or FINAL (the within window provably closed with
    * no covering match → one empty-match summary row emits).
    */
  final case class PendingSite(ord: Long, ts: Long, step: Int)

  /** Event-time state: NFA runs + the reorder buffer, plus (v3) the
    * withinTime clock floor and the writing operator's variant tag, plus
    * (v5) the navigation signature and per-key physical-row history
    * (streaming `PREV` — see `checkNavSig`), plus (v7) the SHOW EMPTY
    * site tracker (`trackedEmpty` tells a restore whether the writer
    * tracked sites — see `EmptySiteTracker.restore`).
    */
  final case class CepStateEt(step: Int, runs: Seq[SerRun],
      buffer: Seq[BufEvent], clock: Long = Long.MinValue,
      variant: Byte = CepStateCodec.VariantUnknown,
      navSig: Seq[String] = Nil, navHist: Seq[SerEvent] = Nil,
      trackedEmpty: Boolean = false, pending: Seq[PendingSite] = Nil)

  /** One live NFA run, state referenced by name. Carried in the
    * VERSIONED BINARY state payload (`CepStateCodec`), so adding fields
    * here means bumping `CepStateCodec.Version` and extending the
    * payload walk — the Spark state-store schema itself never changes.
    */
  final case class SerRun(start: Int, q: String, lastTake: Boolean,
      revEps: Seq[String], etaKeys: Seq[String], etaVals: Seq[Long],
      ctxKeys: Seq[String], ctxVals: Seq[Seq[SerEvent]],
      firstTake: Int = 0, firstTakeTs: Long = 0L,
      anchorFirst: Int = 0, anchorLast: Int = 0)

  /** Whole per-key executor state (position-order variant). */
  final case class CepState(step: Int, runs: Seq[SerRun])

  /** Decode an event from a projected row: `ordIdx`/`typeIdx` locate the
    * order and type columns, attrs start at `attrStart` (shared by both
    * streaming variants, whose projections differ only by the ts column).
    * A null order value fails loudly, matching the batch exec path
    * (`CepRowDecode`) — `getLong` on a null unboxes to 0, which would
    * silently corrupt match ids and `(ts, ord)` release order.
    */
  private def rowToEvent(row: Row, ordIdx: Int, typeIdx: Int, attrStart: Int,
      attrNames: Vector[String], orderName: String,
      strFlags: Array[Boolean]): Event = {
    if (row.isNullAt(ordIdx)) throw new IllegalArgumentException(
      "CEP order column is null — order values must be non-null and " +
        "unique per key")
    val attrs = Vector.newBuilder[(String, Long)]
    var strs: scala.collection.mutable.Builder[(String, String),
      Vector[(String, String)]] = null
    attrs += orderName -> row.getLong(ordIdx)
    var i = attrStart
    while (i < row.length) {
      if (!row.isNullAt(i)) {
        if (strFlags(i)) {
          if (strs == null) strs = Vector.newBuilder
          strs += attrNames(i - attrStart + 1) -> row.getString(i)
        } else attrs += attrNames(i - attrStart + 1) -> row.getLong(i)
      }
      i += 1
    }
    Event(row.getString(typeIdx), attrs.result(),
      if (strs == null) Vector.empty else strs.result())
  }

  private def matchToRow(key: Any, m: Match, piNames: Vector[String],
      orderName: String): Row = {
    val byName = m.toMap
    Row.fromSeq(key +: piNames.map(n =>
      byName.getOrElse(n, Vector.empty).map(_(orderName))))
  }

  /** The per-key stateful dispatch shared by every streaming operator:
    * group the prepared frame by its key column (ordinal 0) under the
    * key's EXACT type and run `f` per key with explicit state/output
    * encoders. Long (numeric/unkeyed), string and struct (multi-column
    * `PARTITION BY`) keys are supported — the state store's KEY schema
    * is the key's own type, so key identity is exact end-to-end (no
    * hashed-key collision contract), and Spark's state schema check
    * refuses a checkpoint whose key type changed, loudly. Numeric keys
    * keep the exact long layout earlier rounds wrote — their
    * checkpoints restore unchanged. Other key types: cast to long or
    * string upstream, or wrap in a struct.
    */
  private def groupedFlatMap[S](prepared: DataFrame, keyDt: DataType,
      timeout: GroupStateTimeout, stateEnc: Encoder[S],
      outEnc: Encoder[Row])(
      f: (Any, Iterator[Row], GroupState[S]) => Iterator[Row])
      : Dataset[Row] = keyDt match {
    case LongType =>
      prepared.groupByKey(_.getLong(0))(Encoders.scalaLong)
        .flatMapGroupsWithState[S, Row](OutputMode.Append(), timeout)(
          (k: Long, rows, st) => f(k, rows, st))(stateEnc, outEnc)
    case StringType =>
      prepared.groupByKey(_.getString(0))(Encoders.STRING)
        .flatMapGroupsWithState[S, Row](OutputMode.Append(), timeout)(
          (k: String, rows, st) => f(k, rows, st))(stateEnc, outEnc)
    case st0: StructType =>
      prepared.groupByKey(_.getStruct(0))(Encoders.row(st0))
        .flatMapGroupsWithState[S, Row](OutputMode.Append(), timeout)(
          (k: Row, rows, st) => f(k, rows, st))(stateEnc, outEnc)
    case other => throw new IllegalArgumentException(
      s"streaming CEP key type $other is not supported — cast the key " +
        "to a long or string upstream, or use a (multi-column) struct " +
        "key (batch supports any key type)")
  }

  private def toSer(e: Event): SerEvent =
    SerEvent(e.tpe, e.attrs.map(_._1), e.attrs.map(_._2),
      e.strs.map(_._1), e.strs.map(_._2))
  private def fromSer(e: SerEvent): Event =
    Event(e.tpe, e.names.zip(e.vals).toVector,
      e.sNames.zip(e.sVals).toVector)

  private def snapshotState(ex: Executor): CepState = {
    val (step, runs) = ex.snapshot
    CepState(step, runs.map { case (k, c) =>
      SerRun(k, c.q.name, c.lastTake, c.revEpsClosure.toSeq,
        c.eta.keys.toSeq, c.eta.values.toSeq,
        c.ctx.keys.toSeq, c.ctx.values.toSeq.map(_.map(toSer)),
        c.firstTake, c.firstTakeTs, c.anchorFirst, c.anchorLast)
    })
  }

  private def restoreState(ex: Executor, s: CepState,
      clockFloor: Long): Unit =
    ex.restore(s.step, s.runs.toVector.map { r =>
      (r.start, Configuration(
        ex.stateByName(r.q),
        r.etaKeys.zip(r.etaVals).toMap,
        r.ctxKeys.zip(r.ctxVals.map(_.map(fromSer).toVector)).toMap,
        r.lastTake,
        r.revEps.toSet,
        r.firstTake,
        r.firstTakeTs,
        r.anchorFirst,
        r.anchorLast))
    }, clockFloor)

  /** Event-time source policy shared by the single- and multi-query
    * event-time operators — ONE implementation so it cannot drift between
    * formulations: watermark first, then the optional pre-NFA filter,
    * null key/ts drop, canonical `(__key, __ts, __ord, __type, attr…)`
    * projection. `tsCol` stays a TIMESTAMP — a cast would strip the
    * watermark tag and EventTimeTimeout requires a watermarked column in
    * the child plan.
    *
    * The pre-NFA filter must run ABOVE the watermark node: Catalyst
    * pushes deterministic predicates that do not reference the
    * watermark column below `EventTimeWatermark`, and a pushed-down
    * union filter would compute the watermark on the FILTERED stream —
    * a member set whose alphabet drops most events would then stall the
    * reorder-buffer drain (events outside the alphabet never advance
    * the watermark, so buffered in-alphabet events are never released).
    * The filter is therefore applied as `cond OR tsCol IS NULL`: it
    * references the watermark column, which blocks the pushdown (the
    * optimizer's EventTimeWatermark pushdown rule keeps any
    * ts-referencing predicate above the node), and it is semantically
    * identical because ts-null rows are dropped by the source policy
    * immediately after. Non-alphabet events still drop BEFORE the key
    * shuffle and the state store — only the parquet-scan pushdown is
    * traded away, for drain liveness (`EventTimeCepSpec` pins both the
    * plan shape and the drain). A watermark heartbeat therefore needs
    * no special type: ANY event with a non-null key and ts advances
    * the watermark, and events outside the union alphabet are never
    * fed to members.
    */
  /** Navigation for the SHARED operators: ONE history per key over the
    * UNION of the members' navigations (the physical rows are common to
    * every member — that sharing is the point), augmenting each event
    * once BEFORE the member feed gates. The union prefilter is disabled
    * when any member navigates (`PREV` observes rows the filter would
    * drop); the per-member feed gates stay — a gate only skips rows the
    * member's own prefilter proves invisible, and such rows still enter
    * the shared history first. Each member is validated individually so
    * the error names the member's own navigation.
    */
  private def sharedNavs(queries: Seq[(String, CepQuery)],
      spec: SparkCep.CepSpec, allowNext: Boolean = false): Vector[Nav] =
    queries.flatMap { case (_, q) => streamingNavs(q, spec, allowNext) }
      .distinct.sortBy(_.valueName).toVector

  /** Navigation contract for the ARRIVAL-ORDER streaming operators:
    * `PREV` is supported via a per-key history of the last maxK
    * physical rows carried in state (codec v5); `NEXT` is rejected — it
    * references FOLLOWING rows the unbounded stream has not produced.
    * The navigated base attribute must be in the operator's projection
    * (`attrCols` or the order column): unlike batch, where any input
    * column can be navigated (the lag/lead window reads the raw frame),
    * the history is built from the projected event, so a base outside
    * the projection would silently read as absent. Nav queries take no
    * pre-NFA filter (`PREV` observes rows the filter would drop —
    * exactly the batch navigation path's rule) and forgo the idle-key
    * state GC (the history on a run-free key is itself semantics), so
    * per-key state is O(maxK × bases) for every key ever seen.
    */
  private def streamingNavs(query: CepQuery,
      spec: SparkCep.CepSpec, allowNext: Boolean = false): Vector[Nav] = {
    val navs = Nav.ofQuery(query)
    val nexts = navs.filterNot(_.prev)
    if (nexts.nonEmpty && !allowNext)
      throw new IllegalArgumentException(
        "CEP navigation NEXT is not supported by the ARRIVAL-ORDER " +
          "streaming operators (" +
          nexts.map(_.sqlForm).mkString(", ") + "): it references " +
          "FOLLOWING physical rows the unbounded stream has not " +
          "produced yet. PREV is supported everywhere; NEXT is " +
          "supported by the EVENT-TIME operators, single-query, shared " +
          "and timeouts (matchPatternEventTime / " +
          "matchPatternMeasuresEventTime / matchPatternsSharedEventTime " +
          "/ matchPatternsSharedMeasuresEventTime / " +
          "timedOutPartialsEventTime), whose watermark hold-back makes " +
          "the followers final — or run the query in batch.")
    navs.foreach { nv =>
      require(nv.base == spec.orderCol || spec.attrCols.contains(nv.base),
        s"CEP streaming navigation ${nv.sqlForm}: base attribute " +
          s"'${nv.base}' is not in the operator's attrCols — streaming " +
          "navigation reads history from the projected event, so add " +
          s"'${nv.base}' to CepSpec.attrCols")
    }
    navs
  }

  /** NEXT augmentation over a watermark-release slice — ONE
    * implementation for the single-query and shared event-time
    * operators so the hold-back semantics cannot drift between them:
    * event `i` of `sortedReady` reads each `NEXT(base, k)` value from
    * slice position `i + k`, which the caller's hold-back (only the
    * first `length - maxK` events are fed) guarantees exists and is
    * final. Last occurrence of the base wins — parity with the generic
    * attribute lookup.
    */
  private def withNextFromSlice(nextNavs: Vector[Nav],
      sortedReady: Vector[BufEvent], ev: Event, i: Int): Event =
    if (nextNavs.isEmpty) ev
    else {
      val extra = Vector.newBuilder[(String, Long)]
      nextNavs.foreach { nv =>
        val f = sortedReady(i + nv.k)
        val idx = f.names.lastIndexOf(nv.base)
        if (idx >= 0) {
          extra += nv.valueName -> f.vals(idx)
          extra += nv.hasName -> 1L
        } else extra += nv.hasName -> 0L
      }
      Event(ev.tpe, ev.attrs ++ extra.result(), ev.strs)
    }

  /** Per-key navigation feed state, ONE implementation for every
    * streaming operator that supports `PREV` so the history semantics
    * cannot drift between them: instantiate per key invocation, restore
    * from the decoded state (validates the signature), `augment` each
    * event IN FEED ORDER (arrival order for the processing-time
    * operators, watermark-release `(ts, ord)` order for the event-time
    * ones — whatever order the NFA consumes is the order PREV sees),
    * and persist `sig`/`serHist` back into the codec payload. A key
    * with an ACTIVE nav feed must skip the idle-key state GC.
    */
  private final class NavFeed(navs: Vector[Nav]) {
    val sig: Seq[String] = navs.map(_.valueName)
    private val bases = navs.map(_.base).toSet
    private val maxK = navs.map(_.k).maxOption.getOrElse(0)
    private var hist: Vector[Event] = Vector.empty
    def active: Boolean = navs.nonEmpty
    def restore(st: CepStateEt): Unit = {
      checkNavSig(st.navSig, sig)
      hist = st.navHist.map(fromSer).toVector
    }
    def augment(ev: Event): Event =
      if (navs.isEmpty) ev
      else {
        val a = Nav.augmentFromHistory(ev, hist, navs)
        hist = (hist :+ Nav.historyEntry(ev, bases)).takeRight(maxK)
        a
      }
    def serHist: Seq[SerEvent] = hist.map(toSer)
  }

  /** Streaming `ONE ROW PER MATCH SHOW EMPTY MATCHES` (round 17): the
    * per-key empty-match site tracker. Batch derives sites from the
    * COMPLETE reported match set ([[CepMeasures.emptySites]]); a stream
    * cannot close that set — but a WINDOWED query (within/withinTime)
    * makes each site's status final in bounded feed distance: a match
    * STARTING at position p takes its first event AT p, and the
    * executor's accept guard (`i - firstTake < w`,
    * `tsAttr - firstTakeTs < span`) kills every run started at p once
    * w more events fed (positional) or the monotone tsAttr clock
    * passed `ts_p + span` (time) — so after that point p's site status
    * cannot change. The tracker mirrors the batch site rules exactly:
    *
    *  - every fed event enters the pending set (under the `^` anchor:
    *    only the key's FIRST event — the only attempt site);
    *  - every reported match removes the pending ordinals its
    *    prune-adjusted span covers: `[start, start]` for
    *    NoSkip/SkipToNext, `[start, last bound]` for SkipPastLastEvent,
    *    `[start, max(start, anchor-1)]` for SkipToFirst/Last (anchor
    *    unbound → start alone), everything for `^`;
    *  - `flush` emits (and drops) every pending site whose window
    *    provably closed — by EITHER bound when both are declared.
    *
    * Pending size is bounded by the window (sites flush as the feed
    * advances), the same state-bound argument `within` already makes
    * for the run set. Feed-driven throughout: correct for BOTH the
    * arrival-order and the event-time operators (each tracks its own
    * feed order, which is the order its matches see).
    */
  private[cep] final class EmptySiteTracker(active: Boolean,
      strategy: AfterMatchStrategy, anchorStart: Boolean,
      within: Option[Int], withinTimeSpan: Option[Long]) {
    private var pend: Vector[PendingSite] = Vector.empty
    def pending: Vector[PendingSite] = pend
    def tracking: Boolean = active
    def restore(st: CepStateEt): Unit = if (active) {
      // a site tracked before the checkpoint must survive it — state
      // written by a pre-v7 build (or a non-SHOW-EMPTY run) mid-key
      // would silently LOSE sites, so refuse, mirroring checkNavSig
      if (!st.trackedEmpty && st.step > 0)
        throw new IllegalStateException(
          "CEP streaming checkpoint was written without SHOW EMPTY " +
            "MATCHES site tracking, but the query declares it — " +
            "empty-match rows for already-fed events would be lost. " +
            "Resume without SHOW EMPTY MATCHES, or discard the " +
            "checkpoint directory.")
      pend = st.pending.toVector
    }
    def onFeed(ord: Long, ts: Long, step: Int): Unit = if (active) {
      // feed indices are 1-based (executor step counter semantics —
      // `firstTake == 0` is the no-take sentinel), so the key's first
      // event ever carries step 1
      if (!anchorStart) pend = pend :+ PendingSite(ord, ts, step)
      else if (step == 1) pend = Vector(PendingSite(ord, ts, step))
    }
    def onMatch(byName: Map[String, Vector[Event]],
        orderName: String): Unit = if (active && pend.nonEmpty) {
      if (anchorStart) { pend = Vector.empty; return }
      val ords = byName.valuesIterator.flatten.map(_(orderName)).toVector
      if (ords.isEmpty) return
      val start = ords.min
      def anchorEnd(a: String, first: Boolean): Long = {
        val bound = byName.getOrElse(a, Vector.empty).map(_(orderName))
        if (bound.isEmpty) start
        else math.max(start, (if (first) bound.min else bound.max) - 1)
      }
      val end = strategy match {
        case AfterMatchStrategy.SkipPastLastEvent => ords.max
        case AfterMatchStrategy.SkipToFirst(a) => anchorEnd(a, first = true)
        case AfterMatchStrategy.SkipToLast(a) => anchorEnd(a, first = false)
        case _ => start // NoSkip / SkipToNext: non-starts host empties
      }
      pend = pend.filterNot(p => p.ord >= start && p.ord <= end)
    }
    /** Sites whose window closed, removed from the set — one empty
      * summary row each. `stepNow` = total events fed, `clock` = the
      * executor's monotone tsAttr floor.
      */
    def flush(stepNow: Int, clock: Long): Vector[PendingSite] =
      if (!active || pend.isEmpty) Vector.empty
      else {
        val (done, keep) = pend.partition(p =>
          within.exists(w => stepNow >= p.step + w) ||
            withinTimeSpan.exists(t =>
              clock != Long.MinValue && clock >= p.ts + t))
        pend = keep
        done
      }
  }

  /** Checkpoint contract for streaming navigation: the stored signature
    * (the nav value names the writer maintained history for) must equal
    * the query's — a nav query restoring a sig-less or different-sig
    * checkpoint would compute wrong PREV values across the restart
    * boundary with no error (missing or misaligned history). The
    * converse — a non-nav query restoring a nav checkpoint — is allowed:
    * the run state is independent of the history, which is simply
    * dropped at the next state write.
    */
  private def checkNavSig(stored: Seq[String], current: Seq[String]): Unit =
    if (current.nonEmpty && stored != current)
      throw new IllegalStateException(
        "CEP streaming checkpoint holds navigation history for [" +
          stored.mkString(", ") + "] but the query navigates [" +
          current.mkString(", ") + "] — PREV values across the restart " +
          "boundary would be wrong. Resume with the original " +
          "navigation set, or discard the checkpoint directory.")

  private def etPrepare(df: DataFrame,
      filter: Option[org.apache.spark.sql.Column], spec: SparkCep.CepSpec,
      tsCol: String, delay: String): (DataFrame, Vector[String]) = {
    val attrNames: Vector[String] =
      (spec.orderCol +: spec.attrCols.filterNot(_ == spec.orderCol)).toVector
    val withWm = df.withWatermark(tsCol, delay)
    val filtered = filter match {
      case Some(cond) => withWm.filter(cond || col(tsCol).isNull)
      case None       => withWm
    }
    val source = spec.keyCol match {
      case Some(k) =>
        filtered.filter(col(k).isNotNull && col(tsCol).isNotNull)
      case None => filtered.filter(col(tsCol).isNotNull)
    }
    // TYPE-DRIVEN attr projection, same rule as the arrival-order path
    // (`SparkCep.attrProj`): a STRING input column stays a string so
    // `strAttrFlags`/`rowToEvent` land it in `Event.strs` — before
    // round 17 every attr was cast to long here, so a string attr came
    // through all-NULL and the event-time path silently broke the
    // string tier that the arrival-order path advertised.
    val prepared = source.select(
      SparkCep.keyExpr(df, spec).as("__key") +:
        col(tsCol).as("__ts") +:
        col(spec.orderCol).cast(LongType).as("__ord") +:
        col(spec.typeCol).cast(StringType).as("__type") +:
        attrNames.drop(1).map(c => SparkCep.attrProj(source, c)): _*)
    (prepared, attrNames)
  }

  /** Reorder-buffer step shared by both event-time operators: append
    * non-late arrivals (events already behind the watermark are dropped —
    * standard late-data policy), release the strict prefix below the
    * watermark. Returns (ready, still-buffered).
    *
    * Epoch-0 boundary: BEFORE this buffer ever runs, Spark's own
    * stateful late-row filter drops rows whose event time is <= the
    * current watermark — and the INITIAL watermark is 0, so an event
    * timestamped exactly epoch 0 never reaches the operator at all.
    * Real event times are never epoch 0; synthetic ts columns derived
    * from 0-based ids must offset away from it (the event-time gates
    * use id+1 seconds — found by the `^` anchor, which observes the
    * true first event).
    */
  private def releaseBuffer(prev: Seq[BufEvent], incoming: Vector[BufEvent],
      wmMs: Long): (Vector[BufEvent], Vector[BufEvent]) = {
    val buffered =
      (prev ++ incoming.filter(e => wmMs <= 0 || e.ts >= wmMs)).toVector
    if (wmMs <= 0) (Vector.empty, buffered)
    else buffered.partition(_.ts < wmMs)
  }

  /** Member-set checkpoint contract shared by both shared operators:
    * names AND order must match exactly — a count-only check would let a
    * reordered set silently decode one pattern's runs into another
    * executor (DST state names are per-pattern counters like `a:1` that
    * resolve against the wrong pattern without error).
    */
  private def validateMemberNames(stored: Seq[String],
      built: Seq[String]): Unit =
    if (stored != built)
      throw new IllegalStateException(
        s"shared CEP checkpoint holds member states for " +
          s"[${stored.mkString(", ")}] but the operator was built with " +
          s"[${built.mkString(", ")}] — the query set changed across " +
          "restart (names and order are the checkpoint contract); " +
          "discard the checkpoint or restore the original set")

  /** A per-match output renderer for the shared operators:
    * `(member index, key, bound events by pattern name, order attr)` →
    * one output Row.
    */
  private type SharedRender =
    (Int, Any, Map[String, Vector[Event]], String) => Row

  /** Gated feed shared by the shared streaming operators (gate semantics
    * proven at `SparkCep.memberFeedTypes`); the output shape is the
    * renderer's affair.
    */
  private def feedShared(executors: Vector[Executor],
      gates: Array[Set[String]], key: Any, orderName: String,
      ev: Event, trackers: Vector[EmptySiteTracker] = Vector.empty,
      memberSteps: Array[Int] = null,
      only: Int => Boolean = _ => true)(render: SharedRender): Seq[Row] =
    executors.indices.filter(only).flatMap { i =>
      val gate = gates(i)
      if (gate == null || (ev.tpe != null && gate.contains(ev.tpe))) {
        val ms = executors(i).feed(ev)
        if (trackers.nonEmpty) {
          // tracked members run gate-less (sites are defined over the
          // full feed), so memberSteps mirrors the executor's counter
          memberSteps(i) += 1
          trackers(i).onFeed(ev(orderName), executors(i).clock,
            memberSteps(i))
          ms.map { m =>
            val byName = m.toMap
            trackers(i).onMatch(byName, orderName)
            render(i, key, byName, orderName)
          }
        } else ms.map(m => render(i, key, m.toMap, orderName))
      } else Vector.empty
    }

  /** The classic shared reporting shape `(qname, key, binding)`: order
    * ids comma-joined per pattern name, ';'-joined across names in
    * declared order.
    */
  private def bindingRender(queries: Seq[(String, CepQuery)])
      : SharedRender = {
    val names = queries.toVector.map(_._1)
    val piNamesByQ = queries.toVector.map { case (_, q) =>
      SparkCep.patternNames(q.patseq) }
    (i, key, byName, orderName) =>
      Row(names(i), key, piNamesByQ(i).map { n =>
        byName.getOrElse(n, Vector.empty)
          .map(_(orderName)).mkString(",")
      }.mkString(";"))
  }

  /** The measured shared shape `(qname, key, measures, smeasures)` —
    * alias → emission-time folded value, NULL kept for
    * measure-over-missing. TWO maps split by the item's declared type
    * (`CepMeasures.itemDataType`): long-valued measures in `measures`,
    * STRING-valued ones — `CLASSIFIER()` and FIRST/LAST over a
    * string-typed attribute (round 16) — in `smeasures` (empty when a
    * member declares none). The split keeps the long map's existing
    * contract while giving string measures a typed sink, so the shared
    * shape no longer rejects CLASSIFIER().
    */
  private def measuresRender(stmts: Seq[(String, CepSql.CepSqlStatement)],
      strAttrs: Set[String]): SharedRender = {
    val names = stmts.toVector.map(_._1)
    val sVec = stmts.toVector.map(_._2)
    val isStrItem = stmts.toVector.map(_._2.measures.map(it =>
      CepMeasures.itemDataType(it, strAttrs) ==
        org.apache.spark.sql.types.StringType))
    (i, key, byName, orderName) => {
      val st = sVec(i)
      val flags = isStrItem(i)
      val longs = Map.newBuilder[String, Any]
      val strs = Map.newBuilder[String, Any]
      st.measures.zip(flags).foreach { case (it, isStr) =>
        val v = CepMeasures.evalItemBoxed(it, byName, orderName,
          st.subsetMap, strAttrs)
        if (isStr) strs += it.alias -> v else longs += it.alias -> v
      }
      Row(names(i), key, longs.result(), strs.result())
    }
  }

  /** Snapshot / restore of k member run-sets through the versioned
    * binary codec (payloads tagged with the writing operator's variant).
    */
  private def encodeMembers(executors: Vector[Executor],
      variant: Byte,
      trackers: Vector[EmptySiteTracker] = Vector.empty)
      : Vector[CepStateCodec.VersionedState] =
    executors.zipWithIndex.map { case (ex, i) =>
      val snap = snapshotState(ex)
      val (te, pe) =
        if (trackers.isEmpty) (false, Nil)
        else (trackers(i).tracking, trackers(i).pending)
      CepStateCodec.encode(
        CepStateEt(snap.step, snap.runs, Nil, ex.clock, variant,
          trackedEmpty = te, pending = pe))
    }

  /** Restore member executors and return the decoded states (the SHOW
    * EMPTY trackers read their pending sections from them).
    */
  private def restoreMembers(members: Seq[CepStateCodec.VersionedState],
      executors: Vector[Executor]): Vector[CepStateEt] =
    members.zip(executors).map { case (vs, ex) =>
      val st = CepStateCodec.decode(vs)
      restoreState(ex, CepState(st.step, st.runs), st.clock)
      st
    }.toVector

  /** Apply a CEP query to a *streaming* DataFrame. Input columns are mapped
    * exactly as in the batch operator (`SparkCep.CepSpec`); output rows are
    * (key, one array<bigint> of order-ids per pattern name).
    *
    * Usage: `StreamingCep.matchPattern(readStreamDf, query, spec)
    * .writeStream.outputMode("append")...`
    */
  def matchPattern(df: DataFrame, query: CepQuery,
      spec: SparkCep.CepSpec, maxRunsPerKey: Option[Int] = None): DataFrame = {
    val piNames = SparkCep.patternNames(query.patseq)
    val keyName = spec.keyCol.getOrElse("__global")
    SparkCep.checkWithinStateBound(query, maxRunsPerKey, streaming = true)
    val effMaxRuns =
      SparkCep.resolveMaxRuns(df.sparkSession, Seq(query), maxRunsPerKey)
    val navs = streamingNavs(query, spec)
    // same source policy as the batch operator (shared `prepare`):
    // semantics-preserving pre-NFA pushdown, null keys dropped,
    // non-numeric keys hashed, canonical projection — the returned
    // attrNames ARE the projection's attr order the row decode relies on.
    // Navigation queries take no pre-NFA filter (PREV observes rows the
    // filter would drop) and no lag/lead window (batch-only) — the
    // per-key history in state supplies the nav attributes instead.
    val (prepared, attrNames) =
      if (navs.isEmpty) SparkCep.prepare(df, query, spec)
      else {
        SparkCep.checkStrTyping(df, query, spec)
        SparkCep.prepareWithFilter(df, None, spec)
      }
    val strFlags = SparkCep.strAttrFlags(prepared)
    val orderName = attrNames.head

    val outSchema = StructType(
      StructField(keyName, SparkCep.keyType(df, spec), nullable = false) +:
        piNames.map(n =>
          StructField(n, ArrayType(LongType, containsNull = false),
            nullable = false)))
    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    val stateEnc: Encoder[CepStateCodec.VersionedState] =
      Encoders.product[CepStateCodec.VersionedState]

    // compile once on the driver; the immutable DST ships in the closure
    // and is shared by every key in the task (state names resolve against
    // it stably across batches/restarts since compilation is deterministic)
    val dst = DstCompiler.compile(query)

    groupedFlatMap[CepStateCodec.VersionedState](prepared,
      SparkCep.keyType(df, spec), GroupStateTimeout.NoTimeout(),
      stateEnc, outEnc) {
        (key, rows, state) =>
          val executor = new Executor(dst, query.strategy, effMaxRuns,
            query.within, query.withinTime,
            anchorStart = query.anchorStart)
          val nf = new NavFeed(navs)
          if (state.exists) {
            val st = CepStateCodec.decode(state.get)
            // cross-variant refusal is DETERMINISTIC via the v3 variant
            // tag: the event-time operator feeds in watermark-released
            // event-time order, this one in arrival order — restoring its
            // state here changes match multisets even when its reorder
            // buffer happens to be empty. Migrated v2 state (unknown
            // writer) falls back to the old buffer-contents inference.
            if (st.variant == CepStateCodec.VariantEventTime ||
                (st.variant == CepStateCodec.VariantUnknown &&
                  st.buffer.nonEmpty))
              throw new IllegalStateException(
                "CEP streaming state was written by matchPatternEventTime " +
                  "and cannot be restored by the arrival-order operator " +
                  "(different feed-order semantics; buffered events would " +
                  "be lost). Resume with matchPatternEventTime, or " +
                  "discard the checkpoint directory.")
            nf.restore(st)
            restoreState(executor, CepState(st.step, st.runs), st.clock)
          }
          // arrival-order semantics within the micro-batch: sort by order
          // column (monotone ingestion ids), as the reference's processing
          // order is the stream order
          val events = rows.toVector.sortBy(_.getLong(1))
          val out = events.flatMap { row =>
            executor.feed(nf.augment(
              rowToEvent(row, 1, 2, 3, attrNames, orderName, strFlags)))
              .map(matchToRow(key, _, piNames, orderName))
          }
          val snap = snapshotState(executor)
          // idle-key state GC: a key with NO live runs is semantically
          // a fresh key (every semantic quantity is a step/clock
          // DIFFERENCE within a live run, so resetting the counters is
          // invisible) — remove the entry instead of storing it, so the
          // state store scales with keys that have LIVE RUNS, not with
          // every key ever seen. EXCEPTION: withinTime queries keep
          // their entries — the persisted clock floor on a run-free key
          // is itself semantics (the loud rewound-clock refusal pinned
          // by CheckpointRestartSpec) — and navigation queries keep
          // theirs (the physical-row history on a run-free key feeds the
          // NEXT event's PREV), so both forgo the GC.
          if (executor.liveRunCount == 0 && query.withinTime.isEmpty &&
              !nf.active && !query.anchorStart)
            state.remove()
          else state.update(CepStateCodec.encode(
            CepStateEt(snap.step, snap.runs, Nil, executor.clock,
              CepStateCodec.VariantArrival, nf.sig, nf.serHist)))
          out.iterator
      }
      // align with the batch operator: the synthetic key column is an
      // implementation detail in un-keyed mode
      .transform(ds =>
        if (spec.keyCol.isEmpty) ds.drop(keyName) else ds.toDF())
  }

  /** Streaming MEASURES: `matchPattern` + the MATCH_RECOGNIZE `MEASURES`
    * projection in ONE stateful operator — output is one flat row of
    * scalar measures per match, emitted the micro-batch the match
    * completes.
    *
    * Unlike the batch tier (`CepMeasures.project`, which joins the match
    * frame back to the event table because the relational frame keeps
    * order ids alone), the streaming operator folds every measure AT
    * EMISSION over the match's own bound events, which still carry all
    * their attributes inside the executor (`CepMeasures.evalMeasure`).
    * That sidesteps both streaming hazards of the relational
    * formulation: no stream-stream join-back (the event table IS the
    * stream) and no cross-batch streaming aggregation whose `__mid`
    * grouping state would grow without a watermark. Cost is O(match) per
    * match, state is exactly `matchPattern`'s (same codec, same
    * `VariantArrival` tag — a checkpoint written by either operator
    * restores into the other; only the projection differs).
    *
    * Semantics gate: `StreamingCepMeasuresSpec` pins batch==stream
    * across micro-batch boundaries — the fold here must equal the batch
    * join-back tier row-for-row — plus a checkpoint restart.
    */
  def matchPatternMeasures(df: DataFrame, st: CepSql.CepSqlStatement,
      spec: SparkCep.CepSpec, maxRunsPerKey: Option[Int] = None): DataFrame = {
    // multi-column `PARTITION BY a, b, …` — the streaming form of
    // `CepMeasures.runMultiKey`: derive the EXACT composite struct key,
    // run single-key (the struct rides the state store's key schema
    // verbatim — no restore join, no hash, batch-identical identity),
    // and expand the struct back into the original leading columns.
    if (st.partitionByCols.nonEmpty) {
      require(spec.keyCol.isEmpty,
        "matchPatternMeasures: the statement declares a multi-column " +
          "PARTITION BY — pass a spec without keyCol (the composite " +
          "key is derived from the statement)")
      val keyed = df.withColumn("__mkey",
        CepMeasures.multiKeyExpr(df, st.partitionByCols))
      val inner = matchPatternMeasures(keyed,
        st.copy(partitionByCols = Vector.empty),
        spec.copy(keyCol = Some("__mkey")), maxRunsPerKey)
      val rest = inner.columns.filterNot(_ == "__mkey").toSeq
      return inner.select(st.partitionByCols.map(c =>
        col("__mkey").getField(c).as(c)) ++ rest.map(col): _*)
    }
    val query = st.query
    // nullary atoms are rejected wherever they appear — standalone or
    // inside a measure expression (MATCH_NUMBER() is legal in batch
    // arithmetic but needs the key's total match order; CLASSIFIER()
    // never reaches here, the Atom constructor rejects it in arithmetic)
    validateStreamingMeasures(st, spec, "matchPatternMeasures",
      allowClassifier = true, allowShowEmpty = true)
    val trackEmpty =
      st.rowsPerMatch == CepSql.RowsPerMatch.OneRowShowEmpty &&
        Pattern.canMatchEmpty(st.query.patseq)
    val keyName = spec.keyCol.getOrElse("__global")
    SparkCep.checkWithinStateBound(query, maxRunsPerKey, streaming = true)
    val effMaxRuns =
      SparkCep.resolveMaxRuns(df.sparkSession, Seq(query), maxRunsPerKey)
    val navs = streamingNavs(query, spec)
    // nav queries: no pre-NFA filter, history-fed nav attrs (see
    // matchPattern). SHOW EMPTY disables it too: sites are defined
    // over ALL events of the key (batch derives them from the raw
    // table), and a withinTime all-skippable pattern would otherwise
    // keep the type pushdown and silently drop the ignorable events
    // that host empty matches (positional WITHIN already forgoes the
    // pushdown, so only the withinTime form could hit this)
    val (prepared, attrNames) =
      if (navs.isEmpty && !trackEmpty) SparkCep.prepare(df, query, spec)
      else {
        SparkCep.checkStrTyping(df, query, spec)
        SparkCep.prepareWithFilter(df, None, spec)
      }
    val strFlags = SparkCep.strAttrFlags(prepared)
    val strAttrs = CepMeasures.strAttrsOf(df, spec)
    CepMeasures.requireStrMeasuresSupported(st.measures, strAttrs)
    val orderName = attrNames.head

    val outSchema = StructType(
      StructField(keyName, SparkCep.keyType(df, spec), nullable = false) +:
        st.measures.map(m =>
          StructField(m.alias, CepMeasures.itemDataType(m, strAttrs),
            nullable = true)))
    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    val stateEnc: Encoder[CepStateCodec.VersionedState] =
      Encoders.product[CepStateCodec.VersionedState]

    val dst = DstCompiler.compile(query)
    val measures = st.measures

    groupedFlatMap[CepStateCodec.VersionedState](prepared,
      SparkCep.keyType(df, spec), GroupStateTimeout.NoTimeout(),
      stateEnc, outEnc) {
        (key, rows, state) =>
          val executor = new Executor(dst, query.strategy, effMaxRuns,
            query.within, query.withinTime,
            anchorStart = query.anchorStart)
          val nf = new NavFeed(navs)
          val tracker = new EmptySiteTracker(trackEmpty,
            query.strategy, query.anchorStart, query.within,
            query.withinTime.map(_.span))
          var stepIdx = 0
          if (state.exists) {
            val stt = CepStateCodec.decode(state.get)
            if (stt.variant == CepStateCodec.VariantEventTime ||
                (stt.variant == CepStateCodec.VariantUnknown &&
                  stt.buffer.nonEmpty))
              throw new IllegalStateException(
                "CEP streaming state was written by matchPatternEventTime " +
                  "and cannot be restored by the arrival-order operator " +
                  "(different feed-order semantics; buffered events would " +
                  "be lost). Resume with matchPatternEventTime, or " +
                  "discard the checkpoint directory.")
            nf.restore(stt)
            tracker.restore(stt)
            stepIdx = stt.step
            restoreState(executor, CepState(stt.step, stt.runs), stt.clock)
          }
          def emptyRow: Row = Row.fromSeq(key +: measures.map(ms =>
            CepMeasures.evalItemBoxed(ms, Map.empty, orderName,
              st.subsetMap, strAttrs)))
          val events = rows.toVector.sortBy(_.getLong(1))
          val out = events.flatMap { row =>
            val ms = executor.feed(nf.augment(
              rowToEvent(row, 1, 2, 3, attrNames, orderName, strFlags)))
            stepIdx += 1
            tracker.onFeed(row.getLong(1), executor.clock, stepIdx)
            ms.map { m =>
              val byName = m.toMap
              tracker.onMatch(byName, orderName)
              Row.fromSeq(key +: measures.map(ms2 =>
                CepMeasures.evalItemBoxed(ms2, byName, orderName,
                  st.subsetMap, strAttrs)))
            }
          }
          val snap = snapshotState(executor)
          val empties =
            tracker.flush(snap.step, executor.clock).map(_ => emptyRow)
          if (executor.liveRunCount == 0 && query.withinTime.isEmpty &&
              !nf.active && !query.anchorStart &&
              tracker.pending.isEmpty)
            state.remove()
          else state.update(CepStateCodec.encode(
            CepStateEt(snap.step, snap.runs, Nil, executor.clock,
              CepStateCodec.VariantArrival, nf.sig, nf.serHist,
              trackedEmpty = tracker.tracking,
              pending = tracker.pending)))
          (out ++ empties).iterator
      }
      .transform(ds =>
        if (spec.keyCol.isEmpty) ds.drop(keyName) else ds.toDF())
  }

  /** Streaming form of the TIMEOUT side output
    * (`SparkCep.timedOutPartials` — FlinkCEP's
    * `TimedOutPartialMatchHandler`): emits the partial runs whose
    * `within`/`withinTime` window provably closed without completing,
    * with run state carried across micro-batches exactly like
    * `matchPattern` (same codec, same `VariantArrival` tag — the state
    * EVOLUTION is identical to the match operator's, only the
    * projection differs, so a checkpoint written by either restores
    * into the other without semantic drift; runs whose window closes
    * after a restart still report). The drain happens after every fed
    * event, so a snapshot never holds an undrained timeout — the
    * buffer needs no codec representation.
    */
  def timedOutPartials(df: DataFrame, query: CepQuery,
      spec: SparkCep.CepSpec, maxRunsPerKey: Option[Int] = None)
      : DataFrame = {
    require(query.within.isDefined || query.withinTime.isDefined,
      "timedOutPartials needs a windowed query (within/withinTime) — " +
        "an unwindowed run never times out")
    val piNames = SparkCep.patternNames(query.patseq)
    val keyName = spec.keyCol.getOrElse("__global")
    SparkCep.checkWithinStateBound(query, maxRunsPerKey, streaming = true)
    val effMaxRuns =
      SparkCep.resolveMaxRuns(df.sparkSession, Seq(query), maxRunsPerKey)
    // no pre-NFA filter: the timeout output observes sweep moments (see
    // the batch operator's doc) — a dropped event can be the only one
    // that closes a window. PREV is history-fed as in matchPattern.
    val navs = streamingNavs(query, spec)
    SparkCep.checkStrTyping(df, query, spec)
    val (prepared, attrNames) = SparkCep.prepareWithFilter(df, None, spec)
    val strFlags = SparkCep.strAttrFlags(prepared)
    val orderName = attrNames.head
    val outSchema = StructType(
      StructField(keyName, SparkCep.keyType(df, spec), nullable = false) +:
        piNames.map(n =>
          StructField(n, ArrayType(LongType, containsNull = false),
            nullable = false)))
    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    val stateEnc: Encoder[CepStateCodec.VersionedState] =
      Encoders.product[CepStateCodec.VersionedState]
    val dst = DstCompiler.compile(query)
    groupedFlatMap[CepStateCodec.VersionedState](prepared,
      SparkCep.keyType(df, spec), GroupStateTimeout.NoTimeout(),
      stateEnc, outEnc) {
        (key, rows, state) =>
          val executor = new Executor(dst, query.strategy, effMaxRuns,
            query.within, query.withinTime, captureTimeouts = true,
            anchorStart = query.anchorStart)
          val nf = new NavFeed(navs)
          if (state.exists) {
            val st = CepStateCodec.decode(state.get)
            if (st.variant == CepStateCodec.VariantEventTime ||
                (st.variant == CepStateCodec.VariantUnknown &&
                  st.buffer.nonEmpty))
              throw new IllegalStateException(
                "CEP streaming state was written by matchPatternEventTime " +
                  "and cannot be restored by the arrival-order operator " +
                  "(different feed-order semantics; buffered events would " +
                  "be lost). Resume with matchPatternEventTime, or " +
                  "discard the checkpoint directory.")
            nf.restore(st)
            restoreState(executor, CepState(st.step, st.runs), st.clock)
          }
          val events = rows.toVector.sortBy(_.getLong(1))
          val out = events.flatMap { row =>
            executor.feed(nf.augment(
              rowToEvent(row, 1, 2, 3, attrNames, orderName, strFlags)))
            executor.drainTimedOut().map(c =>
              matchToRow(key, executor.partialOutput(c, piNames),
                piNames, orderName))
          }
          val snap = snapshotState(executor)
          // idle-key state GC (see matchPattern)
          if (executor.liveRunCount == 0 && query.withinTime.isEmpty &&
              !nf.active && !query.anchorStart)
            state.remove()
          else state.update(CepStateCodec.encode(
            CepStateEt(snap.step, snap.runs, Nil, executor.clock,
              CepStateCodec.VariantArrival, nf.sig, nf.serHist)))
          out.iterator
      }
      .transform(ds =>
        if (spec.keyCol.isEmpty) ds.drop(keyName) else ds.toDF())
  }

  /** Per-key state of the multi-query shared stream: one codec-versioned
    * member payload per query, in declared query order, plus the member
    * NAMES that wrote them — restore validates names and order exactly,
    * so a reordered or swapped member set can never silently decode one
    * pattern's runs into another executor (a count-only check would:
    * DST state names are per-pattern counters like `a:1` that resolve
    * against the wrong pattern without error). Editing a member's
    * PATTERN under an unchanged name follows the single-pattern
    * operator's semantics: stored run state resolves against the
    * recompiled DST. A DIFFERENT state-store schema from the
    * single-pattern operators (Seq of payloads vs one payload), so a
    * checkpoint can never be restored across operator kinds by
    * accident — Spark's state schema check refuses it before any
    * payload is read.
    *
    * When any member NAVIGATES, `members` carries ONE EXTRA trailing
    * payload — an empty-run `CepStateEt` holding only the shared
    * navigation signature + history. A Seq length is data, not schema,
    * so old checkpoints still decode (k payloads → no nav section, and
    * the signature check then refuses a nav query over them loudly);
    * anything other than k or k+1 payloads is corrupt and refused.
    */
  final case class SharedMultiState(
      names: Seq[String],
      members: Seq[CepStateCodec.VersionedState])

  /** Streaming multi-query shared-scan CEP: the streaming form of
    * `SparkCep.matchPatternsShared` — k patterns over ONE source read,
    * ONE union pushdown filter, ONE key shuffle, and ONE state store
    * (per-key state = k member run-sets). Running k separate streaming
    * queries instead costs k× everything: each `writeStream` is its own
    * source scan, exchange, and state store, and at corpus scale the
    * source re-read alone dominates.
    *
    * Semantics: arrival-order per key within each micro-batch (the
    * reference's processing-time order), identical to running
    * `StreamingCep.matchPattern` per query — same union-filter sandwich
    * and per-member alphabet feed gates as the batch shared operator
    * (proof at `SparkCep.memberFeedTypes`). Output is the batch shared
    * operator's reporting shape `(qname, <key>, binding)`.
    *
    * The member query SET (names and order) is part of the checkpoint
    * contract: restoring with a different set fails loudly rather than
    * silently misassigning member states.
    */
  def matchPatternsShared(df: DataFrame, queries: Seq[(String, CepQuery)],
      spec: SparkCep.CepSpec, maxRunsPerKey: Option[Int] = None)
      : DataFrame = {
    val keyName = spec.keyCol.getOrElse("__global")
    val outSchema = StructType(Seq(
      StructField("qname", StringType, nullable = false),
      StructField(keyName, SparkCep.keyType(df, spec), nullable = false),
      StructField("binding", StringType, nullable = false)))
    sharedArrival(df, queries, spec, maxRunsPerKey, outSchema)(
      bindingRender(queries))
  }

  /** Streaming MEASURES over the SHARED multi-pattern scan — the
    * streaming form of `CepMeasures.runShared`: k measured statements,
    * ONE source read, ONE union pushdown filter, ONE key exchange, ONE
    * state store. Because the members declare DIFFERENT measure lists,
    * the uniform output shape is `(qname, <key>, measures)` with
    * `measures: map<string, bigint>` — alias → emission-time folded
    * value (NULL kept: measure-over-missing) — a consumer filters by
    * `qname` and reads `measures['alias']`. A k-sink split would cost
    * k× source scans and state stores (each writeStream is its own
    * query), which is exactly what the shared operator exists to avoid.
    *
    * Members are `ONE ROW PER MATCH` with non-empty, non-nullary
    * MEASURES (same rules as `matchPatternMeasures`; expressions fold
    * per atom and combine). State is IDENTICAL to `matchPatternsShared`
    * (same `SharedMultiState` layout, same member codec, same nav
    * section) — a checkpoint written by either operator restores into
    * the other; only the emission projection differs. Batch==stream is
    * gated member-for-member against `CepMeasures.runShared` in
    * `StreamingCepSharedMeasuresSpec`.
    */
  def matchPatternsSharedMeasures(df: DataFrame,
      stmts: Seq[(String, CepSql.CepSqlStatement)], spec: SparkCep.CepSpec,
      maxRunsPerKey: Option[Int] = None): DataFrame = {
    require(stmts.nonEmpty, "matchPatternsSharedMeasures needs >= 1 member")
    val strAttrs = CepMeasures.strAttrsOf(df, spec)
    stmts.foreach { case (n, st) =>
      require(st.measures.nonEmpty,
        s"matchPatternsSharedMeasures: member '$n' has no MEASURES — " +
          "use matchPatternsShared for the plain binding shape")
      validateStreamingMeasures(st, spec,
        s"matchPatternsSharedMeasures: member '$n'",
        allowClassifier = true, allowShowEmpty = true)
      CepMeasures.requireStrMeasuresSupported(st.measures, strAttrs)
    }
    val keyName = spec.keyCol.getOrElse("__global")
    sharedArrival(df, stmts.map { case (n, st) => n -> st.query }, spec,
      maxRunsPerKey, sharedMeasuresSchema(df, spec, keyName),
      trackFlags = stmts.toVector.map { case (_, st) =>
        st.rowsPerMatch == CepSql.RowsPerMatch.OneRowShowEmpty &&
          Pattern.canMatchEmpty(st.query.patseq) })(
      measuresRender(stmts, strAttrs))
  }

  /** The shared measured output schema: `(qname, key, measures:
    * map<string,long>, smeasures: map<string,string>)`.
    */
  private def sharedMeasuresSchema(df: DataFrame, spec: SparkCep.CepSpec,
      keyName: String): StructType =
    StructType(Seq(
      StructField("qname", StringType, nullable = false),
      StructField(keyName, SparkCep.keyType(df, spec), nullable = false),
      StructField("measures",
        MapType(StringType, LongType, valueContainsNull = true),
        nullable = false),
      StructField("smeasures",
        MapType(StringType, StringType, valueContainsNull = true),
        nullable = false)))

  /** The arrival-order shared-scan core behind [[matchPatternsShared]]
    * and [[matchPatternsSharedMeasures]]: one `flatMapGroupsWithState`
    * over k member executors with the `SharedMultiState` checkpoint
    * layout; the output row shape is the renderer's.
    */
  private def sharedArrival(df: DataFrame,
      queries: Seq[(String, CepQuery)], spec: SparkCep.CepSpec,
      maxRunsPerKey: Option[Int], outSchema: StructType,
      trackFlags: Vector[Boolean] = Vector.empty)(
      render: SharedRender): DataFrame = {
    require(queries.nonEmpty, "matchPatternsShared needs >= 1 query")
    val keyName = spec.keyCol.getOrElse("__global")
    queries.foreach { case (_, q) =>
      SparkCep.checkWithinStateBound(q, maxRunsPerKey, streaming = true)
    }
    val anyTrack = trackFlags.exists(identity)
    val effMaxRuns =
      SparkCep.resolveMaxRuns(df.sparkSession, queries.map(_._2), maxRunsPerKey)
    val navs = sharedNavs(queries, spec)
    queries.foreach { case (_, q) =>
      SparkCep.checkStrTyping(df, q, spec) }
    // SHOW EMPTY members disable the union pushdown like nav does:
    // sites are defined over ALL events of the key (see the single-op
    // note at matchPatternMeasures)
    val (prepared, attrNames) = SparkCep.prepareWithFilter(
      df,
      if (navs.isEmpty && !anyTrack)
        SparkCep.unionPrefilter(queries, spec)
      else None,
      spec)
    val strFlags = SparkCep.strAttrFlags(prepared)
    val orderName = attrNames.head

    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    val stateEnc: Encoder[SharedMultiState] =
      Encoders.product[SharedMultiState]

    val qVec = queries.toVector
    val names = qVec.map(_._1)
    val dsts = qVec.map { case (_, q) => DstCompiler.compile(q) }
    // null = feed everything (member declined a prefilter). A SHOW
    // EMPTY member runs GATE-LESS: its sites are the full feed, and
    // its executor's step/clock must advance on the site events
    // themselves (the gate is an optimization the prefilter proof
    // makes invisible, so dropping it only costs ignored feeds)
    val gates: Array[Set[String]] =
      qVec.zipWithIndex.map { case ((_, q), i) =>
        if (i < trackFlags.length && trackFlags(i)) null
        else SparkCep.memberFeedTypes(q, spec).orNull
      }.toArray
    val flags =
      if (trackFlags.nonEmpty) trackFlags
      else Vector.fill(qVec.length)(false)

    groupedFlatMap[SharedMultiState](prepared,
      SparkCep.keyType(df, spec), GroupStateTimeout.NoTimeout(),
      stateEnc, outEnc) {
        (key, rows, state) =>
          val executors = qVec.zipWithIndex.map { case ((_, q), i) =>
            new Executor(dsts(i), q.strategy, effMaxRuns,
              q.within, q.withinTime,
              anchorStart = q.anchorStart)
          }
          val nf = new NavFeed(navs)
          val trackers = qVec.indices.toVector.map { i =>
            new EmptySiteTracker(flags(i), qVec(i)._2.strategy,
              qVec(i)._2.anchorStart, qVec(i)._2.within,
              qVec(i)._2.withinTime.map(_.span))
          }
          val memberSteps = new Array[Int](qVec.length)
          if (state.exists) {
            val stored = state.get
            validateMemberNames(stored.names, names)
            // k payloads = written without navigation; k+1 = trailing
            // shared nav section (see SharedMultiState)
            val (memberPayloads, navPayload) =
              if (stored.members.size == names.size)
                (stored.members, None)
              else if (stored.members.size == names.size + 1)
                (stored.members.init, Some(stored.members.last))
              else throw new IllegalStateException(
                s"shared CEP checkpoint holds ${stored.members.size} " +
                  s"payloads for ${names.size} members — corrupt state")
            val decoded = restoreMembers(memberPayloads, executors)
            decoded.zipWithIndex.foreach { case (st, i) =>
              trackers(i).restore(st)
              memberSteps(i) = st.step
            }
            // a missing section restores as an empty signature, which
            // checkNavSig refuses when this query set navigates
            nf.restore(navPayload.map(CepStateCodec.decode)
              .getOrElse(CepStateEt(0, Nil, Nil)))
          }
          val events = rows.toVector.sortBy(_.getLong(1))
          val out = events.flatMap { row =>
            feedShared(executors, gates, key, orderName,
              nf.augment(rowToEvent(row, 1, 2, 3, attrNames, orderName, strFlags)),
              trackers, memberSteps)(
              render)
          }
          val empties = qVec.indices.flatMap { i =>
            trackers(i).flush(memberSteps(i), executors(i).clock)
              .map(_ => render(i, key,
                Map.empty[String, Vector[Event]], orderName))
          }
          // idle-key state GC: all members run-free, no member query
          // carrying a withinTime floor, no navigation history to keep
          if (executors.forall(_.liveRunCount == 0) &&
              qVec.forall(q => q._2.withinTime.isEmpty &&
                !q._2.anchorStart) && !nf.active &&
              trackers.forall(_.pending.isEmpty))
            state.remove()
          else {
            val base = encodeMembers(executors,
              CepStateCodec.VariantArrival, trackers)
            state.update(SharedMultiState(names,
              if (nf.active) base :+ CepStateCodec.encode(CepStateEt(
                0, Nil, Nil, Long.MinValue, CepStateCodec.VariantArrival,
                nf.sig, nf.serHist))
              else base))
          }
          (out ++ empties).iterator
      }
      .transform(ds =>
        if (spec.keyCol.isEmpty) ds.drop(keyName) else ds.toDF())
  }

  /** Event-time CEP (beyond-parity extension — the reference is strictly
    * processing-time): out-of-order events are buffered per key and fed to
    * the NFA in `(ts, order)` order once the watermark passes them, so any
    * event no later than `delay` behind the stream head lands in its
    * event-time position. Events older than the watermark at arrival are
    * dropped (standard late-data policy). An event-time timeout re-wakes
    * each key when the watermark passes its earliest buffered event, so
    * quiet keys still drain.
    *
    * `tsCol` must be a timestamp column; `delay` is a duration string
    * (e.g. "10 seconds") used for `withWatermark`.
    */
  def matchPatternEventTime(df: DataFrame, query: CepQuery,
      spec: SparkCep.CepSpec, tsCol: String, delay: String,
      maxRunsPerKey: Option[Int] = None): DataFrame = {
    val piNames = SparkCep.patternNames(query.patseq)
    val keyName = spec.keyCol.getOrElse("__global")
    val outSchema = StructType(
      StructField(keyName, SparkCep.keyType(df, spec),
        nullable = false) +:
        piNames.map(n =>
          StructField(n, ArrayType(LongType, containsNull = false),
            nullable = false)))
    etSingle(df, query, spec, tsCol, delay, maxRunsPerKey, outSchema)(
      (key, m, orderName) => matchToRow(key, m.toVector, piNames, orderName))
  }

  /** Event-time MEASURES: `matchPatternEventTime`'s reorder buffer +
    * `matchPatternMeasures`' emission-time fold in one operator — the
    * event-time member of the measures family. Output `(key?,
    * <aliases…>)`, one flat row per match, emitted once the watermark
    * releases the match's last event. Same validation as the
    * arrival-order measures operator (ONE ROW PER MATCH, no nullary
    * measures); state is `matchPatternEventTime`'s
    * (`VariantEventTime` — checkpoints interchange with it, and the
    * arrival-order refusal applies unchanged).
    */
  def matchPatternMeasuresEventTime(df: DataFrame,
      st: CepSql.CepSqlStatement, spec: SparkCep.CepSpec, tsCol: String,
      delay: String, maxRunsPerKey: Option[Int] = None): DataFrame = {
    // multi-column PARTITION BY: exact composite struct key, expanded
    // back into the leading output columns (see matchPatternMeasures)
    if (st.partitionByCols.nonEmpty) {
      require(spec.keyCol.isEmpty,
        "matchPatternMeasuresEventTime: the statement declares a " +
          "multi-column PARTITION BY — pass a spec without keyCol " +
          "(the composite key is derived from the statement)")
      val keyed = df.withColumn("__mkey",
        CepMeasures.multiKeyExpr(df, st.partitionByCols))
      val inner = matchPatternMeasuresEventTime(keyed,
        st.copy(partitionByCols = Vector.empty),
        spec.copy(keyCol = Some("__mkey")), tsCol, delay, maxRunsPerKey)
      val rest = inner.columns.filterNot(_ == "__mkey").toSeq
      return inner.select(st.partitionByCols.map(c =>
        col("__mkey").getField(c).as(c)) ++ rest.map(col): _*)
    }
    validateStreamingMeasures(st, spec,
      "matchPatternMeasuresEventTime", allowClassifier = true,
      allowShowEmpty = true)
    val trackEmpty =
      st.rowsPerMatch == CepSql.RowsPerMatch.OneRowShowEmpty &&
        Pattern.canMatchEmpty(st.query.patseq)
    val keyName = spec.keyCol.getOrElse("__global")
    val strAttrs = CepMeasures.strAttrsOf(df, spec)
    CepMeasures.requireStrMeasuresSupported(st.measures, strAttrs)
    val outSchema = StructType(
      StructField(keyName, SparkCep.keyType(df, spec),
        nullable = false) +:
        st.measures.map(m =>
          StructField(m.alias, CepMeasures.itemDataType(m, strAttrs),
            nullable = true)))
    etSingle(df, st.query, spec, tsCol, delay, maxRunsPerKey, outSchema,
      trackEmpty)(
      (key, byName, orderName) => Row.fromSeq(key +: st.measures.map(ms =>
        CepMeasures.evalItemBoxed(ms, byName, orderName, st.subsetMap,
          strAttrs))))
  }

  /** The `ONE ROW PER MATCH` + non-nullary-measures contract shared by
    * every streaming measures operator.
    */
  private def validateStreamingMeasures(st: CepSql.CepSqlStatement,
      spec: SparkCep.CepSpec, opName: String,
      allowClassifier: Boolean = false,
      allowShowEmpty: Boolean = false): Unit = {
    require(st.measures.nonEmpty, s"$opName: empty MEASURES")
    val showEmpty =
      st.rowsPerMatch == CepSql.RowsPerMatch.OneRowShowEmpty
    require((!showEmpty || allowShowEmpty) &&
      st.rowsPerMatch != CepSql.RowsPerMatch.AllRowsShowEmpty,
      s"$opName: this SHOW EMPTY MATCHES form is batch-only — " +
        "empty-match sites are derived from a partition's COMPLETE " +
        "reported match set, which an unbounded stream cannot close " +
        "(the measures operators — single-query and shared, " +
        "arrival-order and event-time — support ONE ROW ... SHOW " +
        "EMPTY MATCHES on WINDOWED queries, where the within window " +
        "makes each site final in bounded feed distance); " +
        "run the batch projection per micro-batch via foreachBatch " +
        "if needed")
    if (showEmpty && allowShowEmpty) {
      require(st.query.within.isDefined || st.query.withinTime.isDefined,
        s"$opName: streaming SHOW EMPTY MATCHES needs a WINDOWED query " +
          "(WITHIN / WITHIN_TIME) — without a window an empty-match " +
          "site's status never becomes final on an unbounded stream")
      require(!st.query.anchorEnd,
        s"$opName: SHOW EMPTY MATCHES with the '$$' partition-end " +
          "anchor is not supported (as in batch — a zero-width match " +
          "at the partition edge has no input row to emit)")
    }
    require(st.rowsPerMatch == CepSql.RowsPerMatch.OneRow ||
      (showEmpty && allowShowEmpty),
      s"$opName: ALL ROWS PER MATCH is batch-only — its " +
        "deterministic per-key match_no sequence needs a total order " +
        "over a key's matches, which an unbounded stream cannot close; " +
        "emit ONE ROW PER MATCH and explode downstream, or run the " +
        "ALL ROWS projection per micro-batch via foreachBatch")
    st.measures.flatMap(CepMeasures.MeasureItem.atomsOf)
      .find(_.phys.isDefined).foreach { m =>
      throw new IllegalArgumentException(
        s"$opName: PREV/NEXT(${m.fn.sqlName}(...)) physical navigation " +
          "is batch-only — the navigated row may be an unbound " +
          "neighbor the match state never carried")
    }
    st.measures.flatMap(CepMeasures.MeasureItem.atomsOf)
      .find(m => CepMeasures.Fn.isNullary(m.fn) &&
        !(allowClassifier && m.fn == CepMeasures.Fn.Classifier))
      .foreach { m =>
      val why = m.fn match {
        case CepMeasures.Fn.MatchNo =>
          "MATCH_NUMBER() is batch-only — the deterministic per-key " +
            "sequence needs a total order over a key's matches, which " +
            "an unbounded stream cannot close"
        case _ =>
          // every streaming measures operator now carries CLASSIFIER()
          // (typed single-query rows; the shared shape's `smeasures`
          // string map — round 16); this branch guards any future
          // caller that opts out
          "CLASSIFIER() is not supported by this operator"
      }
      throw new IllegalArgumentException(s"$opName: $why")
    }
    CepMeasures.validate(st.query, spec, st.measures, Set.empty,
      st.subsetMap)
    ()
  }

  /** The event-time single-query core behind [[matchPatternEventTime]]
    * and [[matchPatternMeasuresEventTime]]: per-key reorder buffer under
    * the watermark, `VariantEventTime` state, event-time timeout wakeup;
    * the output row shape is the renderer's.
    */
  private def etSingle(df: DataFrame, query: CepQuery,
      spec: SparkCep.CepSpec, tsCol: String, delay: String,
      maxRunsPerKey: Option[Int], outSchema: StructType,
      trackEmpty: Boolean = false)(
      render: (Any, Map[String, Vector[Event]], String) => Row)
      : DataFrame = {
    // PREV is history-fed AT RELEASE TIME: the NFA consumes events in
    // watermark-released (ts, ord) order, so that is the physical-row
    // order PREV navigates — consistent with the operator's own feed
    // semantics (late arrivals dropped before the buffer never enter
    // the history, exactly as they never reach the NFA).
    //
    // NEXT (round 17, event-time only): the same release order makes
    // FOLLOWING rows knowable — released events all carry ts < the
    // watermark, future arrivals all carry ts >= it, so the (ts, ord)
    // successor of a released event that has k released successors is
    // FINAL. The drain therefore HOLDS BACK the last maxK releasable
    // events per key (they stay in the reorder buffer and feed in a
    // later batch, exactly the feed sequence an uninterrupted stream
    // would produce), and every fed event reads its NEXT values from
    // the in-memory release slice — no extra state, no schema change.
    // A key's tail events feed only when successors arrive; on a
    // stream that simply stops they wait forever, which IS the
    // unbounded-stream reading of "the following row" (batch resolves
    // the partition edge to NULL because it can see the end).
    val navs = streamingNavs(query, spec, allowNext = true)
    val nextNavs = navs.filterNot(_.prev)
    val prevNavs = navs.filter(_.prev)
    val holdBack = nextNavs.map(_.k).maxOption.getOrElse(0)
    val keyName = spec.keyCol.getOrElse("__global")
    SparkCep.checkWithinStateBound(query, maxRunsPerKey, streaming = true)
    val effMaxRuns =
      SparkCep.resolveMaxRuns(df.sparkSession, Seq(query), maxRunsPerKey)
    SparkCep.checkStrTyping(df, query, spec)
    val (prepared, attrNames) = etPrepare(df, None, spec, tsCol, delay)
    val strFlags = SparkCep.strAttrFlags(prepared)
    val orderName = attrNames.head

    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    val stateEnc: Encoder[CepStateCodec.VersionedState] =
      Encoders.product[CepStateCodec.VersionedState]

    val dst = DstCompiler.compile(query)

    groupedFlatMap[CepStateCodec.VersionedState](prepared,
      SparkCep.keyType(df, spec), GroupStateTimeout.EventTimeTimeout(),
      stateEnc, outEnc) {
        (key, rows, state) =>
          val executor = new Executor(dst, query.strategy, effMaxRuns,
            query.within, query.withinTime,
            anchorStart = query.anchorStart)
          val prev = if (state.exists) CepStateCodec.decode(state.get)
            else CepStateEt(0, Nil, Nil)
          // deterministic cross-variant refusal (see matchPattern): an
          // arrival-order checkpoint restored here would re-feed future
          // events in a different order than the state assumes. Unknown
          // (migrated v2) state is accepted — the pre-v3 behavior,
          // documented rather than inferred.
          if (prev.variant == CepStateCodec.VariantArrival)
            throw new IllegalStateException(
              "CEP streaming state was written by the arrival-order " +
                "matchPattern operator and cannot be restored by " +
                "matchPatternEventTime (different feed-order semantics). " +
                "Resume with matchPattern, or discard the checkpoint " +
                "directory.")
          val nf = new NavFeed(prevNavs)
          val tracker = new EmptySiteTracker(trackEmpty,
            query.strategy, query.anchorStart, query.within,
            query.withinTime.map(_.span))
          if (state.exists) {
            nf.restore(prev)
            tracker.restore(prev)
          }
          restoreState(executor,
            CepState(prev.step, prev.runs), prev.clock)

          val wmMs = state.getCurrentWatermarkMs()
          val incoming = rows.map { row =>
            val ev = rowToEvent(row, 2, 3, 4, attrNames, orderName, strFlags)
            // millisecond precision — sub-second out-of-order events must
            // still sort by true event time
            BufEvent(row.getTimestamp(1).getTime, row.getLong(2), ev.tpe,
              ev.attrs.map(_._1), ev.attrs.map(_._2),
              ev.strs.map(_._1), ev.strs.map(_._2))
          }.toVector
          // the watermark guarantees nothing earlier can still arrive —
          // release the prefix up to it, in event-time order
          val (ready, still0) = releaseBuffer(prev.buffer, incoming, wmMs)
          val sortedReady = ready.sortBy(e => (e.ts, e.ord))
          // NEXT hold-back (see the operator doc above): keep the last
          // maxK releasable events buffered so every fed event's NEXT
          // followers sit in this very slice, already final
          val feedCount =
            if (holdBack == 0) sortedReady.length
            else math.max(0, sortedReady.length - holdBack)
          val feedNow = sortedReady.take(feedCount)
          val out = feedNow.zipWithIndex.flatMap { case (e, i) =>
            val ms = executor.feed(nf.augment(withNextFromSlice(
              nextNavs, sortedReady,
              Event(e.tpe, e.names.zip(e.vals).toVector,
                e.sNames.zip(e.sVals).toVector), i)))
            tracker.onFeed(e.ord, executor.clock, prev.step + i + 1)
            ms.map { m =>
              val byName = m.toMap
              tracker.onMatch(byName, orderName)
              render(key, byName, orderName)
            }
          }
          val still = sortedReady.drop(feedCount) ++ still0

          val snap = snapshotState(executor)
          val empties = tracker.flush(snap.step, executor.clock)
            .map(_ => render(key, Map.empty[String, Vector[Event]],
              orderName))
          // idle-key state GC: no live runs AND nothing buffered ==
          // fresh key (see matchPattern)
          if (executor.liveRunCount == 0 && !query.anchorStart &&
              still.isEmpty && tracker.pending.isEmpty &&
              query.withinTime.isEmpty && !nf.active) state.remove()
          else {
            state.update(CepStateCodec.encode(
              CepStateEt(snap.step, snap.runs, still, executor.clock,
                CepStateCodec.VariantEventTime, nf.sig, nf.serHist,
                trackedEmpty = tracker.tracking,
                pending = tracker.pending)))
            // wake when the watermark passes the earliest GENUINELY
            // buffered event (ts >= wm). Held-back events (ts < wm)
            // are waiting for DATA (successors), not for time — a
            // timeout cannot resolve them, and their past-watermark
            // timestamps would be rejected by the state store anyway.
            val wake = still0.map(_.ts).minOption
            wake.foreach(t => state.setTimeoutTimestamp(t + 1))
          }
          (out ++ empties).iterator
      }
      .transform(ds =>
        if (spec.keyCol.isEmpty) ds.drop(keyName) else ds.toDF())
  }

  /** Event-time form of the TIMEOUT side output: out-of-order events
    * reorder under the watermark exactly as in `matchPatternEventTime`
    * (same buffer, same release order, same `VariantEventTime` state —
    * the run-state evolution is identical to the event-time match
    * operator's, only the projection differs, so checkpoints
    * interchange between the two), but the emitted rows are the partial
    * runs whose `within`/`withinTime` window provably closed. With
    * `withinTime` this is the natural pairing: the window clock IS
    * event time, and the watermark's ordering guarantee is what makes
    * "provably closed" sound on an out-of-order stream. No pre-NFA
    * filter, per the timeout rule (`SparkCep.timedOutPartials`).
    */
  def timedOutPartialsEventTime(df: DataFrame, query: CepQuery,
      spec: SparkCep.CepSpec, tsCol: String, delay: String,
      maxRunsPerKey: Option[Int] = None): DataFrame = {
    require(query.within.isDefined || query.withinTime.isDefined,
      "timedOutPartialsEventTime needs a windowed query " +
        "(within/withinTime) — an unwindowed run never times out")
    // PREV is history-fed at watermark-release time, NEXT (round 18)
    // via the same hold-back as matchPatternEventTime — the run-state
    // evolution stays identical to the match operator's (checkpoints
    // keep interchanging), only the projection differs
    val navs = streamingNavs(query, spec, allowNext = true)
    val nextNavs = navs.filterNot(_.prev)
    val prevNavs = navs.filter(_.prev)
    val holdBack = nextNavs.map(_.k).maxOption.getOrElse(0)
    val piNames = SparkCep.patternNames(query.patseq)
    val keyName = spec.keyCol.getOrElse("__global")
    SparkCep.checkWithinStateBound(query, maxRunsPerKey, streaming = true)
    val effMaxRuns =
      SparkCep.resolveMaxRuns(df.sparkSession, Seq(query), maxRunsPerKey)
    SparkCep.checkStrTyping(df, query, spec)
    val (prepared, attrNames) = etPrepare(df, None, spec, tsCol, delay)
    val strFlags = SparkCep.strAttrFlags(prepared)
    val orderName = attrNames.head
    val outSchema = StructType(
      StructField(keyName, SparkCep.keyType(df, spec),
        nullable = false) +:
        piNames.map(n =>
          StructField(n, ArrayType(LongType, containsNull = false),
            nullable = false)))
    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    val stateEnc: Encoder[CepStateCodec.VersionedState] =
      Encoders.product[CepStateCodec.VersionedState]
    val dst = DstCompiler.compile(query)
    groupedFlatMap[CepStateCodec.VersionedState](prepared,
      SparkCep.keyType(df, spec), GroupStateTimeout.EventTimeTimeout(),
      stateEnc, outEnc) {
        (key, rows, state) =>
          val executor = new Executor(dst, query.strategy, effMaxRuns,
            query.within, query.withinTime, captureTimeouts = true,
            anchorStart = query.anchorStart)
          val prev = if (state.exists) CepStateCodec.decode(state.get)
            else CepStateEt(0, Nil, Nil)
          if (prev.variant == CepStateCodec.VariantArrival)
            throw new IllegalStateException(
              "CEP streaming state was written by the arrival-order " +
                "matchPattern operator and cannot be restored by " +
                "timedOutPartialsEventTime (different feed-order " +
                "semantics). Resume with the arrival-order operator, or " +
                "discard the checkpoint directory.")
          val nf = new NavFeed(prevNavs)
          if (state.exists) nf.restore(prev)
          restoreState(executor, CepState(prev.step, prev.runs), prev.clock)
          val wmMs = state.getCurrentWatermarkMs()
          val incoming = rows.map { row =>
            val ev = rowToEvent(row, 2, 3, 4, attrNames, orderName, strFlags)
            BufEvent(row.getTimestamp(1).getTime, row.getLong(2), ev.tpe,
              ev.attrs.map(_._1), ev.attrs.map(_._2),
              ev.strs.map(_._1), ev.strs.map(_._2))
          }.toVector
          val (ready, still0) = releaseBuffer(prev.buffer, incoming, wmMs)
          val sortedReady = ready.sortBy(e => (e.ts, e.ord))
          // NEXT hold-back, exactly matchPatternEventTime's
          val feedCount =
            if (holdBack == 0) sortedReady.length
            else math.max(0, sortedReady.length - holdBack)
          val out = sortedReady.take(feedCount).zipWithIndex.flatMap {
            case (e, i) =>
              executor.feed(nf.augment(withNextFromSlice(
                nextNavs, sortedReady,
                Event(e.tpe, e.names.zip(e.vals).toVector,
                  e.sNames.zip(e.sVals).toVector), i)))
              executor.drainTimedOut().map(c =>
                matchToRow(key, executor.partialOutput(c, piNames),
                  piNames, orderName))
          }
          val still = sortedReady.drop(feedCount) ++ still0
          val snap = snapshotState(executor)
          // idle-key state GC (see matchPattern)
          if (executor.liveRunCount == 0 && !query.anchorStart &&
              still.isEmpty &&
              query.withinTime.isEmpty && !nf.active) state.remove()
          else {
            state.update(CepStateCodec.encode(
              CepStateEt(snap.step, snap.runs, still, executor.clock,
                CepStateCodec.VariantEventTime, nf.sig, nf.serHist)))
            // held-back events (ts < wm) wait for DATA, not time
            val wake = still0.map(_.ts).minOption
            wake.foreach(t => state.setTimeoutTimestamp(t + 1))
          }
          out.iterator
      }
      .transform(ds =>
        if (spec.keyCol.isEmpty) ds.drop(keyName) else ds.toDF())
  }

  /** Per-key state of the EVENT-TIME multi-query shared stream: the
    * reorder buffer is stored ONCE (the buffered events are common to
    * every member — that sharing is the point), member run-sets once per
    * query in declared order, names validated on restore exactly as in
    * the arrival-order shared operator. Yet another distinct state-store
    * schema, so cross-operator restores are structurally refused.
    *
    * The buffer rides as a codec-versioned BINARY payload (an empty-run
    * `CepStateEt` carrying only the buffer), NOT as a raw `Seq[BufEvent]`
    * column: a raw product would freeze `BufEvent`'s shape into the
    * Spark state-store schema, and the next field added to it would kill
    * every checkpoint with an opaque schema error — the exact failure
    * mode `CepStateCodec` exists to prevent (its version bump gives an
    * actionable message instead).
    */
  final case class SharedMultiStateEt(
      names: Seq[String],
      bufferPayload: CepStateCodec.VersionedState,
      members: Seq[CepStateCodec.VersionedState])

  /** Event-time multi-query shared-scan CEP: k patterns, ONE source
    * read, ONE union pushdown filter, ONE key shuffle, ONE state store
    * and — the part the per-query formulation cannot share — ONE reorder
    * buffer: out-of-order events are buffered per key once and fed to
    * every member DST in `(ts, order)` order as the watermark releases
    * them. k separate event-time queries would each buffer the same
    * events in their own state store (k× the state bytes, k× the
    * watermark bookkeeping) on top of k source reads.
    *
    * Late-data policy, release rule, timeout wake-up, and (round 18)
    * the NEXT watermark hold-back are exactly
    * `matchPatternEventTime`'s — the reorder buffer is already shared
    * across members, so holding back the last maxK releasable events
    * (maxK over every member's NEXT offsets) finalizes followers for
    * all members at once; member feed gates and the union-filter
    * sandwich are exactly the arrival-order shared operator's
    * (`SparkCep.memberFeedTypes` — dropping a non-alphabet event from a
    * prefiltered member's feed is what its own prefilter would have done
    * before the scan). Output: `(qname, <key>, binding)`.
    *
    * The union filter runs ABOVE the watermark node in a
    * pushdown-blocked form (see `etPrepare`), so the watermark advances
    * on the RAW stream: a member set whose alphabet drops most events
    * cannot stall the reorder-buffer drain, and a heartbeat/flush event
    * needs no special type — any non-null-key, non-null-ts event moves
    * the watermark and is dropped before the shuffle if outside the
    * union alphabet (never fed to a member, so it can never bind or
    * kill runs). The trade: the union filter no longer reaches the
    * parquet scan in this variant — non-alphabet events are read, then
    * dropped pre-shuffle.
    */
  def matchPatternsSharedEventTime(df: DataFrame,
      queries: Seq[(String, CepQuery)], spec: SparkCep.CepSpec,
      tsCol: String, delay: String, maxRunsPerKey: Option[Int] = None)
      : DataFrame = {
    val keyName = spec.keyCol.getOrElse("__global")
    val outSchema = StructType(Seq(
      StructField("qname", StringType, nullable = false),
      StructField(keyName, SparkCep.keyType(df, spec), nullable = false),
      StructField("binding", StringType, nullable = false)))
    sharedEventTime(df, queries, spec, tsCol, delay, maxRunsPerKey,
      outSchema)(bindingRender(queries))
  }

  /** Event-time MEASURED shared scan: k measured statements, ONE source
    * read / union filter / key exchange / state store / reorder buffer —
    * [[matchPatternsSharedMeasures]]' semantics on the watermark-ordered
    * feed. Output `(qname, <key>, measures map<alias, value>)`; same
    * member rules (ONE ROW PER MATCH, no nullary measures); state is
    * `matchPatternsSharedEventTime`'s (`SharedMultiStateEt`) — the two
    * event-time shared shapes interchange checkpoints.
    */
  def matchPatternsSharedMeasuresEventTime(df: DataFrame,
      stmts: Seq[(String, CepSql.CepSqlStatement)], spec: SparkCep.CepSpec,
      tsCol: String, delay: String, maxRunsPerKey: Option[Int] = None)
      : DataFrame = {
    require(stmts.nonEmpty,
      "matchPatternsSharedMeasuresEventTime needs >= 1 member")
    val strAttrs = CepMeasures.strAttrsOf(df, spec)
    stmts.foreach { case (n, st) =>
      require(st.measures.nonEmpty,
        s"matchPatternsSharedMeasuresEventTime: member '$n' has no " +
          "MEASURES — use matchPatternsSharedEventTime for the plain " +
          "binding shape")
      validateStreamingMeasures(st, spec,
        s"matchPatternsSharedMeasuresEventTime: member '$n'",
        allowClassifier = true, allowShowEmpty = true)
      CepMeasures.requireStrMeasuresSupported(st.measures, strAttrs)
    }
    val keyName = spec.keyCol.getOrElse("__global")
    sharedEventTime(df, stmts.map { case (n, st) => n -> st.query }, spec,
      tsCol, delay, maxRunsPerKey,
      sharedMeasuresSchema(df, spec, keyName),
      trackFlags = stmts.toVector.map { case (_, st) =>
        st.rowsPerMatch == CepSql.RowsPerMatch.OneRowShowEmpty &&
          Pattern.canMatchEmpty(st.query.patseq) })(
      measuresRender(stmts, strAttrs))
  }

  /** The event-time shared-scan core behind
    * [[matchPatternsSharedEventTime]] and
    * [[matchPatternsSharedMeasuresEventTime]].
    */
  private def sharedEventTime(df: DataFrame,
      queries: Seq[(String, CepQuery)], spec: SparkCep.CepSpec,
      tsCol: String, delay: String, maxRunsPerKey: Option[Int],
      outSchema: StructType, trackFlags: Vector[Boolean] = Vector.empty)(
      render: SharedRender): DataFrame = {
    require(queries.nonEmpty, "matchPatternsSharedEventTime needs >= 1 query")
    val keyName = spec.keyCol.getOrElse("__global")
    queries.foreach { case (_, q) =>
      SparkCep.checkWithinStateBound(q, maxRunsPerKey, streaming = true)
    }
    val anyTrack = trackFlags.exists(identity)
    val effMaxRuns =
      SparkCep.resolveMaxRuns(df.sparkSession, queries.map(_._2), maxRunsPerKey)
    // shared navigation rides in the buffer payload (a CepStateEt
    // already carries the nav fields), so this operator's state schema
    // is untouched; the union filter is disabled under nav — and under
    // SHOW EMPTY members (sites are the full feed) — as in the
    // arrival-order shared operator. NEXT (round 18): the single-query
    // event-time hold-back applies to the SHARED reorder buffer
    // PER MEMBER — the shared scan must stay a transparent fusion of k
    // independent operators, and a member WITHOUT NEXT run standalone
    // would feed every watermark-released event immediately, so here
    // it must too. Members WITH NEXT feed only the first
    // `len - holdBack` of each release slice (holdBack = max offset
    // over every member's NEXT navs — a smaller-k member rides the
    // larger hold, trading a bounded extra delay for one shared
    // frontier); the withheld tail stays in the buffer ALREADY FED to
    // the non-NEXT members, so the count of such events persists in
    // the buffer payload's otherwise-unused `step` field (zero codec
    // change: a pre-NEXT checkpoint decodes step 0 = nothing pre-fed,
    // which is exactly its truth). PREV augmentation happens ONCE per
    // event at FIRST release — the held tail is stored in augmented
    // form so its re-release cannot re-advance the nav history.
    val navs = sharedNavs(queries, spec, allowNext = true)
    val nextNavs = navs.filterNot(_.prev)
    val prevNavs = navs.filter(_.prev)
    val holdBack = nextNavs.map(_.k).maxOption.getOrElse(0)
    val memberHolds: Vector[Boolean] = queries.toVector.map { case (_, q) =>
      streamingNavs(q, spec, allowNext = true).exists(!_.prev)
    }
    queries.foreach { case (_, q) =>
      SparkCep.checkStrTyping(df, q, spec) }
    val (prepared, attrNames) = etPrepare(df,
      if (navs.isEmpty && !anyTrack)
        SparkCep.unionPrefilter(queries, spec)
      else None,
      spec, tsCol, delay)
    val strFlags = SparkCep.strAttrFlags(prepared)
    val orderName = attrNames.head

    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    val stateEnc: Encoder[SharedMultiStateEt] =
      Encoders.product[SharedMultiStateEt]

    val qVec = queries.toVector
    val names = qVec.map(_._1)
    val dsts = qVec.map { case (_, q) => DstCompiler.compile(q) }
    // SHOW EMPTY members run gate-less (see sharedArrival)
    val gates: Array[Set[String]] =
      qVec.zipWithIndex.map { case ((_, q), i) =>
        if (i < trackFlags.length && trackFlags(i)) null
        else SparkCep.memberFeedTypes(q, spec).orNull
      }.toArray
    val flags =
      if (trackFlags.nonEmpty) trackFlags
      else Vector.fill(qVec.length)(false)

    groupedFlatMap[SharedMultiStateEt](prepared,
      SparkCep.keyType(df, spec), GroupStateTimeout.EventTimeTimeout(),
      stateEnc, outEnc) {
        (key, rows, state) =>
          val executors = qVec.zipWithIndex.map { case ((_, q), i) =>
            new Executor(dsts(i), q.strategy, effMaxRuns,
              q.within, q.withinTime,
              anchorStart = q.anchorStart)
          }
          val nf = new NavFeed(prevNavs)
          val trackers = qVec.indices.toVector.map { i =>
            new EmptySiteTracker(flags(i), qVec(i)._2.strategy,
              qVec(i)._2.anchorStart, qVec(i)._2.within,
              qVec(i)._2.withinTime.map(_.span))
          }
          val memberSteps = new Array[Int](qVec.length)
          val (prevBuffer: Vector[BufEvent], heldPrev: Int) =
            if (state.exists) {
              val stored = state.get
              validateMemberNames(stored.names, names)
              val decoded = restoreMembers(stored.members, executors)
              decoded.zipWithIndex.foreach { case (st, i) =>
                trackers(i).restore(st)
                memberSteps(i) = st.step
              }
              val bufEt = CepStateCodec.decode(stored.bufferPayload)
              nf.restore(bufEt)
              (bufEt.buffer.toVector, bufEt.step)
            } else (Vector.empty[BufEvent], 0)

          val wmMs = state.getCurrentWatermarkMs()
          val incoming = rows.map { row =>
            val ev = rowToEvent(row, 2, 3, 4, attrNames, orderName, strFlags)
            BufEvent(row.getTimestamp(1).getTime, row.getLong(2), ev.tpe,
              ev.attrs.map(_._1), ev.attrs.map(_._2),
              ev.strs.map(_._1), ev.strs.map(_._2))
          }.toVector
          val (ready, still0) = releaseBuffer(prevBuffer, incoming, wmMs)
          val sortedReady = ready.sortBy(e => (e.ts, e.ord))
          // Per-member NEXT hold-back (see the nav comment above).
          // heldPrev = events at the FRONT of this slice that an earlier
          // batch already fed to the non-NEXT members (they re-release
          // every batch until the NEXT members catch up, and they are
          // the globally smallest (ts, ord) by the watermark's
          // monotonicity, so a count suffices to identify them).
          val len = sortedReady.length
          val feedCount = if (holdBack == 0) len else math.max(0, len - holdBack)
          // PREV augmentation: once per event, at first release, in
          // global order; indices < heldPrev were augmented when first
          // released and carry their nav attrs in the stored payload
          val augmented: Vector[Event] = sortedReady.zipWithIndex.map {
            case (e, i) =>
              val raw = Event(e.tpe, e.names.zip(e.vals).toVector,
                e.sNames.zip(e.sVals).toVector)
              if (i < heldPrev) raw else nf.augment(raw)
          }
          val out = sortedReady.indices.flatMap { i =>
            val toNext = i < feedCount          // NEXT members' frontier
            val toPlain = i >= heldPrev         // non-NEXT members' frontier
            if (!toNext && !toPlain) Vector.empty
            else {
              // followers at i + k exist and are final for i < feedCount
              val ev =
                if (toNext)
                  withNextFromSlice(nextNavs, sortedReady, augmented(i), i)
                else augmented(i)
              feedShared(executors, gates, key, orderName, ev, trackers,
                memberSteps,
                only = m => if (memberHolds(m)) toNext else toPlain)(render)
            }
          }
          // the withheld tail stays buffered in AUGMENTED form (its nav
          // attrs are final; re-augmenting on re-release would corrupt
          // the history) — `still0` events are raw, they have not fed
          val heldTail = (feedCount until len).map { i =>
            val e = sortedReady(i); val a = augmented(i)
            BufEvent(e.ts, e.ord, a.tpe, a.attrs.map(_._1),
              a.attrs.map(_._2), a.strs.map(_._1), a.strs.map(_._2))
          }.toVector
          val still = heldTail ++ still0
          val empties = qVec.indices.flatMap { i =>
            trackers(i).flush(memberSteps(i), executors(i).clock)
              .map(_ => render(i, key,
                Map.empty[String, Vector[Event]], orderName))
          }

          // idle-key state GC: all members empty AND nothing buffered
          if (executors.forall(_.liveRunCount == 0) &&
              qVec.forall(!_._2.anchorStart) && still.isEmpty &&
              qVec.forall(_._2.withinTime.isEmpty) && !nf.active &&
              trackers.forall(_.pending.isEmpty))
            state.remove()
          else {
            // the buffer payload's step field carries the held-tail
            // count (events already fed to the non-NEXT members)
            state.update(SharedMultiStateEt(names,
              CepStateCodec.encode(CepStateEt(heldTail.length, Nil, still,
                variant = CepStateCodec.VariantEventTime,
                navSig = nf.sig, navHist = nf.serHist)),
              encodeMembers(executors, CepStateCodec.VariantEventTime,
                trackers)))
            // wake only for GENUINELY buffered events (ts >= wm, see
            // etSingle): held-back events wait for DATA, not time, and
            // their past-watermark timestamps would be rejected anyway
            val wake = still0.map(_.ts).minOption
            wake.foreach(t => state.setTimeoutTimestamp(t + 1))
          }
          (out ++ empties).iterator
      }
      .transform(ds =>
        if (spec.keyCol.isEmpty) ds.drop(keyName) else ds.toDF())
  }
}
