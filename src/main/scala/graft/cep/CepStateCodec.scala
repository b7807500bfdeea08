package graft.cep

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import StreamingCep.{BufEvent, CepStateEt, PendingSite, SerEvent, SerRun}

/** Versioned binary codec for the streaming CEP per-key state.
  *
  * WHY BYTES: `flatMapGroupsWithState` derives its state-store schema
  * from the state class; adding a field (as `firstTake` did in round 4,
  * and `firstTakeTs` does now) changes that schema and invalidates
  * every existing checkpoint with an opaque Spark state-schema error.
  * Storing `(version: Int, payload: Array[Byte])` fixes the store
  * schema FOREVER: future field additions bump `Version` and extend the
  * payload format, old-version payloads either migrate explicitly here
  * or fail with an actionable message naming the version mismatch —
  * never a Spark internals error.
  *
  * The payload layout is a plain `DataOutputStream` walk of the state
  * (counts + UTF strings + longs; reverse-ε sets written sorted so the
  * bytes are deterministic for a given state). Version history:
  *   - 3: prepends a header (operator-variant tag byte + withinTime
  *        clock floor) before the v2 walk. The persisted floor closes
  *        the zero-taken-runs gap where the derived floor silently
  *        reset across a checkpoint boundary; the variant tag makes
  *        cross-variant checkpoint refusal deterministic instead of
  *        inferred from reorder-buffer contents.
  *   - 2: first binary version — step, runs (incl. `firstTake` and
  *        `firstTakeTs`), reorder buffer. Migrated on read: clock floor
  *        restores via the weaker derived fallback (documented in
  *        `Executor.restore`), variant restores as `VariantUnknown`
  *        (callers fall back to buffer-contents inference).
  *        (Version 1 was the product-encoded `CepState` of rounds 3–4;
  *        it lived in the Spark state schema, not in this codec, so it
  *        cannot be read here — restoring such a checkpoint fails in
  *        Spark's schema check before this code runs. Discard and
  *        restart.)
  *   - 4: appends per-run `anchorFirst`/`anchorLast` (the
  *        SkipToFirst/SkipToLast prune stamps) after `firstTakeTs`.
  *        v3/v2 migrate with both = 0 — EXACT, because no v3 build
  *        could run an anchor strategy (the strategies did not exist)
  *        and the three reference strategies never read the stamps.
  *   - 5: appends the navigation signature (the sorted `__nav_*` value
  *        names the writer maintained history for) and the per-key
  *        physical-row history (streaming `PREV` — the last maxK fed
  *        rows, projected to the navigated base attributes). v4 and
  *        below migrate with both empty — EXACT, because no earlier
  *        build accepted a navigation query on streaming input (they
  *        were rejected at prepare), so no old checkpoint can belong to
  *        a nav query; a nav query restoring a sig-less checkpoint is
  *        refused loudly by the operator (`StreamingCep.checkNavSig`),
  *        never silently treated as a partition start.
  *   - 6: every serialized event (run ctx, reorder buffer, nav history)
  *        appends its STRING-attribute section (round 16 typed values —
  *        `Event.strs`). v5 and below migrate with empty strings —
  *        EXACT, because no earlier build projected string attributes
  *        (they were cast to long, all-NULL, and never entered an
  *        event), so no old checkpoint can carry one.
  *   - 7: appends the streaming SHOW EMPTY MATCHES section (round 17) —
  *        a tracked-flag byte plus the pending empty-match sites
  *        (`ord`, `ts`, `step` each). v6 and below migrate with
  *        tracked = false and no sites — EXACT, because no earlier
  *        build accepted SHOW EMPTY on streaming input; a SHOW EMPTY
  *        query restoring an untracked mid-key payload is refused
  *        loudly (`EmptySiteTracker.restore`), never silently treated
  *        as site-free.
  *
  * EXACT KEYS (round 16) need NO version: the key never enters this
  * payload — it is the state STORE's key, whose schema is now the key
  * column's own type (`SparkCep.keyType`: long for numeric keys, so
  * every pre-existing checkpoint restores unchanged; string/struct for
  * the newly-exact key types). Switching a checkpoint's key TYPE is
  * refused by Spark's state-store schema check before any payload is
  * read — pinned in `CepExactKeySpec`.
  */
object CepStateCodec {

  val Version = 7

  /** Which streaming operator wrote the checkpoint. The two variants feed
    * events in different orders (arrival vs watermark-released event
    * time), so restoring one's state into the other changes match
    * multisets — refusal must not depend on whether the reorder buffer
    * happened to be empty at checkpoint time.
    */
  val VariantUnknown: Byte = 0   // migrated v2 state — writer unknown
  val VariantArrival: Byte = 1   // matchPattern (arrival-order)
  val VariantEventTime: Byte = 2 // matchPatternEventTime

  /** The stored shape — this case class must NEVER change. */
  final case class VersionedState(ver: Int, payload: Array[Byte])

  def encode(s: CepStateEt): VersionedState = {
    val bos = new ByteArrayOutputStream(256)
    val out = new DataOutputStream(bos)
    // v3 header
    out.writeByte(s.variant)
    out.writeLong(s.clock)
    out.writeInt(s.step)
    out.writeInt(s.runs.size)
    s.runs.foreach { r =>
      out.writeInt(r.start)
      out.writeUTF(r.q)
      out.writeBoolean(r.lastTake)
      val eps = r.revEps.sorted
      out.writeInt(eps.size); eps.foreach(out.writeUTF)
      out.writeInt(r.etaKeys.size)
      r.etaKeys.zip(r.etaVals).foreach { case (k, v) =>
        out.writeUTF(k); out.writeLong(v)
      }
      out.writeInt(r.ctxKeys.size)
      r.ctxKeys.zip(r.ctxVals).foreach { case (k, evs) =>
        out.writeUTF(k)
        out.writeInt(evs.size)
        evs.foreach(writeEvent(out, _))
      }
      out.writeInt(r.firstTake)
      out.writeLong(r.firstTakeTs)
      out.writeInt(r.anchorFirst)
      out.writeInt(r.anchorLast)
    }
    out.writeInt(s.buffer.size)
    s.buffer.foreach { b =>
      out.writeLong(b.ts); out.writeLong(b.ord); out.writeUTF(b.tpe)
      out.writeInt(b.names.size)
      b.names.zip(b.vals).foreach { case (n, v) =>
        out.writeUTF(n); out.writeLong(v)
      }
      // v6 string-attribute section
      out.writeInt(b.sNames.size)
      b.sNames.zip(b.sVals).foreach { case (n, v) =>
        out.writeUTF(n); out.writeUTF(v)
      }
    }
    // v5 navigation section
    out.writeInt(s.navSig.size); s.navSig.foreach(out.writeUTF)
    out.writeInt(s.navHist.size); s.navHist.foreach(writeEvent(out, _))
    // v7 SHOW EMPTY section
    out.writeBoolean(s.trackedEmpty)
    out.writeInt(s.pending.size)
    s.pending.foreach { ps =>
      out.writeLong(ps.ord); out.writeLong(ps.ts); out.writeInt(ps.step)
    }
    out.flush()
    VersionedState(Version, bos.toByteArray)
  }

  def decode(v: VersionedState): CepStateEt = {
    if (v.ver > Version || v.ver < 2)
      throw new IllegalStateException(
        s"CEP streaming state version ${v.ver} is not supported by this " +
          s"build (supports $Version, migrates 6, 5, 4, 3 and 2). The checkpoint was " +
          "written by a different engine version: either run that " +
          "version, or discard the checkpoint directory and restart the " +
          "query from fresh input (matches already emitted are not " +
          "replayed).")
    val in = new DataInputStream(new ByteArrayInputStream(v.payload))
    // v2 migration: no header — derived clock floor, unknown variant
    val (variant, clock) =
      if (v.ver == 2) (VariantUnknown, Long.MinValue)
      else (in.readByte(), in.readLong())
    val step = in.readInt()
    val runs = Vector.fill(in.readInt()) {
      val start = in.readInt()
      val q = in.readUTF()
      val lastTake = in.readBoolean()
      val revEps = Vector.fill(in.readInt())(in.readUTF())
      val eta = Vector.fill(in.readInt())((in.readUTF(), in.readLong()))
      val ctx = Vector.fill(in.readInt()) {
        val k = in.readUTF()
        (k, Vector.fill(in.readInt())(readEvent(in, v.ver)))
      }
      val firstTake = in.readInt()
      val firstTakeTs = in.readLong()
      // v3/v2 migration: anchor stamps = 0 (exact — see version history)
      val (anchorFirst, anchorLast) =
        if (v.ver >= 4) (in.readInt(), in.readInt()) else (0, 0)
      SerRun(start, q, lastTake, revEps, eta.map(_._1), eta.map(_._2),
        ctx.map(_._1), ctx.map(_._2), firstTake, firstTakeTs,
        anchorFirst, anchorLast)
    }
    val buffer = Vector.fill(in.readInt()) {
      val ts = in.readLong(); val ord = in.readLong(); val tpe = in.readUTF()
      val attrs = Vector.fill(in.readInt())((in.readUTF(), in.readLong()))
      val strs =
        if (v.ver >= 6)
          Vector.fill(in.readInt())((in.readUTF(), in.readUTF()))
        else Vector.empty[(String, String)]
      BufEvent(ts, ord, tpe, attrs.map(_._1), attrs.map(_._2),
        strs.map(_._1), strs.map(_._2))
    }
    // v4/v3/v2 migration: no navigation section (exact — see version
    // history; the operator refuses a nav query over a sig-less payload)
    val (navSig, navHist) =
      if (v.ver >= 5)
        (Vector.fill(in.readInt())(in.readUTF()),
          Vector.fill(in.readInt())(readEvent(in, v.ver)))
      else (Vector.empty[String], Vector.empty[SerEvent])
    // v6-and-below migration: no SHOW EMPTY section (exact — see
    // history; the tracker refuses an untracked mid-key payload)
    val (trackedEmpty, pending) =
      if (v.ver >= 7)
        (in.readBoolean(), Vector.fill(in.readInt()) {
          PendingSite(in.readLong(), in.readLong(), in.readInt())
        })
      else (false, Vector.empty[PendingSite])
    CepStateEt(step, runs, buffer, clock, variant, navSig, navHist,
      trackedEmpty, pending)
  }

  private def writeEvent(out: DataOutputStream, e: SerEvent): Unit = {
    out.writeUTF(e.tpe)
    out.writeInt(e.names.size)
    e.names.zip(e.vals).foreach { case (n, v) =>
      out.writeUTF(n); out.writeLong(v)
    }
    // v6 string-attribute section
    out.writeInt(e.sNames.size)
    e.sNames.zip(e.sVals).foreach { case (n, v) =>
      out.writeUTF(n); out.writeUTF(v)
    }
  }

  private def readEvent(in: DataInputStream, ver: Int): SerEvent = {
    val tpe = in.readUTF()
    val attrs = Vector.fill(in.readInt())((in.readUTF(), in.readLong()))
    // v5-and-below migration: no string section (exact — see history)
    val strs =
      if (ver >= 6) Vector.fill(in.readInt())((in.readUTF(), in.readUTF()))
      else Vector.empty[(String, String)]
    SerEvent(tpe, attrs.map(_._1), attrs.map(_._2),
      strs.map(_._1), strs.map(_._2))
  }
}
