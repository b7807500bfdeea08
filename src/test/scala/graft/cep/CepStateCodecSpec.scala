package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import StreamingCep.{BufEvent, CepStateEt, SerEvent, SerRun}

/** The versioned binary state codec: exact round trip and the
  * actionable version-mismatch failure (the state-schema-evolution
  * story — the Spark state schema is pinned to (int, binary) forever).
  */
class CepStateCodecSpec extends AnyFunSuite {

  private val run = SerRun(3, "q2", lastTake = true,
    revEps = Seq("q2", "q0"), etaKeys = Seq("n", "sum"),
    etaVals = Seq(4L, -9L), ctxKeys = Seq("x", "y"),
    ctxVals = Seq(
      Seq(SerEvent("a", Seq("event_id", "ts"), Seq(1L, 100L))),
      Seq(SerEvent("b", Seq("event_id"), Seq(2L)),
        SerEvent("b", Seq("event_id"), Seq(5L)))),
    firstTake = 2, firstTakeTs = 100L)

  private val state = CepStateEt(7, Seq(run, run.copy(start = 9)),
    Seq(BufEvent(123L, 45L, "c", Seq("event_id", "v"), Seq(6L, -1L))))

  test("encode/decode round-trips the full state exactly") {
    val decoded = CepStateCodec.decode(CepStateCodec.encode(state))
    // revEps is serialized sorted (deterministic bytes) — compare as sets
    assert(decoded.step == state.step)
    assert(decoded.buffer == state.buffer)
    assert(decoded.runs.size == 2)
    decoded.runs.zip(state.runs).foreach { case (d, o) =>
      assert(d.copy(revEps = d.revEps.sorted) ==
        o.copy(revEps = o.revEps.sorted))
    }
  }

  test("empty state round-trips") {
    val empty = CepStateEt(0, Nil, Nil)
    assert(CepStateCodec.decode(CepStateCodec.encode(empty)) == empty)
  }

  test("unknown version fails with an actionable message, not a Spark " +
    "internals error") {
    val v = CepStateCodec.encode(state)
    val e = intercept[IllegalStateException] {
      CepStateCodec.decode(v.copy(ver = 99))
    }
    assert(e.getMessage.contains("version 99"))
    assert(e.getMessage.contains("discard the checkpoint"))
  }

  test("deterministic bytes for equal states") {
    val a = CepStateCodec.encode(state).payload
    val b = CepStateCodec.encode(state).payload
    assert(java.util.Arrays.equals(a, b))
  }

  test("v3 header round-trips the clock floor and variant tag") {
    val tagged = state.copy(clock = 98765L,
      variant = CepStateCodec.VariantEventTime)
    val decoded = CepStateCodec.decode(CepStateCodec.encode(tagged))
    assert(decoded.clock == 98765L)
    assert(decoded.variant == CepStateCodec.VariantEventTime)
  }

  test("v2 payloads migrate: derived clock sentinel + unknown variant") {
    // a v2 payload is exactly the v3 payload minus the 9-byte header
    // (variant byte + clock long) — the walk after the header is the
    // unchanged v2 layout
    val v3 = CepStateCodec.encode(state.copy(clock = 42L,
      variant = CepStateCodec.VariantArrival))
    val v2 = CepStateCodec.VersionedState(2, v3.payload.drop(9))
    val decoded = CepStateCodec.decode(v2)
    assert(decoded.clock == Long.MinValue)
    assert(decoded.variant == CepStateCodec.VariantUnknown)
    assert(decoded.step == state.step)
    assert(decoded.buffer == state.buffer)
  }
}
