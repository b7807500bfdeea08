package graft.tools

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.ops.MultiModal

/** Generates the committed audio fixture artifacts in `data/audio/` —
  * fully deterministic (seeded LCG, integer sample math, lossless PCM
  * WAV), so re-running this tool reproduces the committed parquet values.
  *
  *   Test/runMain graft.tools.GenAudioFixtures
  *
  * Artifacts:
  *  - `audio.parquet` — 500 real 16-bit PCM WAV clips (8 kHz, mono or
  *    stereo, 4000–12000 frames) as binary payloads in the multimodal
  *    asset schema: 400 unique synthetic clips (sine / square /
  *    sawtooth / noise waveforms, LCG-seeded frequency, phase, and a
  *    per-window gain envelope), 60 half-gain near-dups (samples >> 1 —
  *    energy-order-invariant, so `ehash` matches while means/RMS
  *    differ), 25 patch-edited near-dups (one energy window overwritten
  *    with a fixed mid-level tone — a few `ehash` bits flip), and 15
  *    exact byte-level duplicates.
  *  - `expected_features.parquet` — per-clip channels/sample-rate/frame
  *    count/channel mean + RMS micros/ehash computed HERE from the raw
  *    sample arrays *before* WAV encoding via the same shared integer
  *    math the engine uses (`MultiModal.featuresFromPcm`). The engine
  *    decodes the WAVs at query time; matching the committed
  *    expectation therefore verifies the `javax.sound.sampled`
  *    encode→decode round trip end-to-end, not just the arithmetic.
  */
object GenAudioFixtures {

  val Rate = 8000

  /** Deterministic 64-bit LCG stream (MMIX constants), seeded per clip —
    * same generator as the image fixture tool.
    */
  private final class Lcg(seed: Long) {
    private var s = seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(n: Int): Int = (((next() >>> 16) % n + n) % n).toInt
  }

  /** Integer sine via a 1024-entry quarter-symmetric table (values
    * floor(4096*sin(2πi/1024)) precomputed with integer-safe math) —
    * keeps the whole sample synthesis in integers so re-running the
    * tool on any JVM/architecture reproduces identical samples.
    */
  private val SineTable: Array[Int] = {
    // CORDIC-free: use the JVM's StrictMath.sin, which IS specified
    // bit-for-bit across platforms (fdlibm), then floor to int once.
    Array.tabulate(1024)(i =>
      math.floor(4096.0 * StrictMath.sin(2.0 * StrictMath.PI * i / 1024.0))
        .toInt)
  }

  /** One waveform sample in [-4096, 4096] at frame f: family by id%4. */
  private def wave(family: Long, freqStep: Int, phase: Int, f: Int,
      r: Lcg): Int = {
    // fixed-point phase accumulator: table index advances freqStep/16
    // entries per frame (freqStep 100..900 ≈ 49..440 Hz at 8 kHz)
    val idx = ((phase + f.toLong * freqStep / 16) % 1024).toInt
    family match {
      case 0 => SineTable(idx)                            // sine
      case 1 => if (SineTable(idx) >= 0) 4096 else -4096  // square
      case 2 => (idx * 8) - 4096                          // sawtooth
      case _ => r.nextInt(8193) - 4096                    // white noise
    }
  }

  /** Deterministic synthetic clip for `assetId`: interleaved signed
    * 16-bit samples plus (channels, nFrames). The per-65-window gain
    * envelope (×16..×47 in /16 fixed point) is what makes each clip's
    * windowed-energy profile a seeded random walk — without it, pure
    * tones give near-tie window energies and `ehash` degenerates into
    * accidental-collision buckets (same reasoning as the image tool's
    * per-cell luminance jitter).
    */
  def renderBase(assetId: Long): (Int, Array[Short]) = {
    val r = new Lcg(assetId)
    val channels = 1 + (assetId % 3 match { case 2 => 1; case _ => 0 })
    val nFrames = 4000 + r.nextInt(8001)
    val family = assetId % 4
    val freqStep = 100 + r.nextInt(801)
    val phase = r.nextInt(1024)
    // per-window gain envelope, one gain per ehash window
    val win = 65
    val gains = Array.fill(win)(16 + r.nextInt(32))
    // stereo: right channel is the same waveform at a seeded offset and
    // its own envelope — correlated but not identical
    val phase2 = r.nextInt(1024)
    val gains2 = Array.fill(win)(16 + r.nextInt(32))
    val out = new Array[Short](nFrames * channels)
    var f = 0
    while (f < nFrames) {
      val w = math.min(win - 1, f * win / nFrames)
      val s0 = wave(family, freqStep, phase, f, r) * gains(w) / 16
      out(f * channels) = s0.toShort
      if (channels == 2) {
        val s1 = wave(family, freqStep, phase2, f, r) * gains2(w) / 16
        out(f * channels + 1) = s1.toShort
      }
      f += 1
    }
    (channels, out)
  }

  /** Exact half gain (arithmetic shift, sign-correct): window energies
    * scale by ~1/4 uniformly, preserving their strict ordering, so the
    * twin's `ehash` equals the base's while mean/RMS differ.
    */
  def halfGain(samples: Array[Short]): Array[Short] =
    samples.map(s => (s >> 1).toShort)

  /** Overwrite one energy window with a fixed ±1024 square tone: flips
    * the handful of `ehash` comparisons that touch the window — the
    * audio analogue of the image tool's grid-cell patch.
    */
  def patch(channels: Int, samples: Array[Short], window: Int)
      : Array[Short] = {
    val out = samples.clone()
    val nFrames = samples.length / channels
    val f0 = window * nFrames / 65; val f1 = (window + 1) * nFrames / 65
    var f = f0
    while (f < f1) {
      val v: Short = if ((f / 8) % 2 == 0) 1024 else -1024
      var c = 0
      while (c < channels) { out(f * channels + c) = v; c += 1 }
      f += 1
    }
    out
  }

  /** Lossless 16-bit little-endian PCM WAV bytes. */
  def wavBytes(channels: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new AudioFormat(Rate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
      fmt, samples.length / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** (asset_id, source tag, channels, samples). ids 0–399 unique bases;
    * 400–459 half-gain twins of base id-400; 460–484 patch twins of
    * base id-460; 485–499 exact duplicates of base id-485.
    */
  def allClips(): Seq[(Long, String, Int, Array[Short])] = {
    val bases = (0L until 400L).map { id =>
      val (ch, s) = renderBase(id); (id, "base", ch, s)
    }
    val gain = (400L until 460L).map { id =>
      val (ch, s) = renderBase(id - 400)
      (id, s"gain_of_${id - 400}", ch, halfGain(s))
    }
    val patched = (460L until 485L).map { id =>
      val (ch, s) = renderBase(id - 460)
      val r = new Lcg(id)
      (id, s"patch_of_${id - 460}", ch, patch(ch, s, r.nextInt(65)))
    }
    val dups = (485L until 500L).map { id =>
      val (ch, s) = renderBase(id - 485)
      (id, s"dup_of_${id - 485}", ch, s)
    }
    bases ++ gain ++ patched ++ dups
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val clips = allClips()
    val assetRows = clips.map { case (id, src, ch, samples) =>
      val wav = wavBytes(ch, samples)
      Row(id, "audio", wav, Row(wav.length.toLong, src))
    }
    val featRows = clips.map { case (id, _, ch, samples) =>
      val f = MultiModal.featuresFromPcm(ch, Rate, samples)
      Row(id, f.channels.toLong, f.sampleRate.toLong, f.nFrames,
        f.meanC0Micro, f.meanC1Micro, f.rmsC0Micro, f.rmsC1Micro, f.ehash)
    }
    val featSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("mean_c0_micro", LongType, nullable = false),
      StructField("mean_c1_micro", LongType, nullable = false),
      StructField("rms_c0_micro", LongType, nullable = false),
      StructField("rms_c1_micro", LongType, nullable = false),
      StructField("ehash", LongType, nullable = false)))

    spark.createDataFrame(
        spark.sparkContext.parallelize(assetRows, 1),
        MultiModal.assetSchema)
      .write.mode("overwrite").parquet(MultiModal.audioPath)
    spark.createDataFrame(
        spark.sparkContext.parallelize(featRows, 1), featSchema)
      .write.mode("overwrite").parquet(MultiModal.expectedAudioFeaturesPath)

    // sanity probes: planted twins must land at the intended distances
    val byId = featRows.map(r => r.getLong(0) -> r.getLong(8)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val gainExact = (400L until 460L).count(id =>
      byId(id) == byId(id - 400))
    val patchClose = (460L until 485L).count(id =>
      ham(byId(id), byId(id - 460)) <= 6 && byId(id) != byId(id - 460))
    val distinct = featRows.map(_.getLong(8)).distinct.size
    println(s"GENERATED ${clips.size} clips -> ${MultiModal.audioPath} " +
      s"(distinct ehash=$distinct, gain twins ehash-exact=$gainExact/60, " +
      s"patch twins 1<=ham<=6=$patchClose/25)")
    spark.stop()
  }
}
