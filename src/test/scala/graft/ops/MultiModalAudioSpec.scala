package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.tools.GenAudioFixtures

/** Pins for the REAL audio path: javax.sound.sampled decode, exact PCM
  * statistics (hand-computed case), ehash semantics (gain invariance,
  * locality of edits), WAV round-trip fidelity, poison-pill safety, and
  * the Hamming-band audio near-dup join.
  */
class MultiModalAudioSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** 130 mono frames with sample value = frame index: every one of the
    * 65 two-frame windows has strictly larger mean energy than its
    * predecessor → all 64 comparison bits set. Mean and RMS micros are
    * hand-computed: sum 0..129 = 8385 → floor(8385e6/130) = 64_500_000;
    * sumsq = 723905 → floor(sqrt(723905e12/130)) = 74_622_382.
    */
  test("featuresFromPcm: hand-computed ehash/mean/rms on a ramp") {
    val samples = Array.tabulate(130)(f => f.toShort)
    val f = MultiModal.featuresFromPcm(1, 8000, samples)
    assert(f.ehash == -1L)
    assert(f.meanC0Micro == 64500000L)
    assert(f.rmsC0Micro == 74622382L)
    assert(f.nFrames == 130L && f.channels == 1 && f.sampleRate == 8000)
    assert(f.meanC1Micro == 0L && f.rmsC1Micro == 0L)
  }

  test("featuresFromPcm: descending ramp hashes to 0; clips under 65 " +
    "frames hash to 0; negative DC uses floor division") {
    val desc = Array.tabulate(130)(f => (129 - f).toShort)
    assert(MultiModal.featuresFromPcm(1, 8000, desc).ehash == 0L)
    val tiny = Array.fill(64)(5.toShort)
    val ft = MultiModal.featuresFromPcm(1, 8000, tiny)
    assert(ft.ehash == 0L && ft.meanC0Micro == 5000000L)
    // sum = -1 over 2 frames: floorDiv(-1e6, 2) = -500000 (not -499999)
    val neg = Array[Short](0, -1)
    assert(MultiModal.featuresFromPcm(1, 8000, neg).meanC0Micro == -500000L)
  }

  test("ehash is invariant under uniform gain; stereo channels get " +
    "independent mean/RMS") {
    val (ch, samples) = GenAudioFixtures.renderBase(2L) // id%3==2 -> stereo
    assert(ch == 2)
    val a = MultiModal.featuresFromPcm(ch, 8000, samples)
    val b = MultiModal.featuresFromPcm(ch, 8000,
      GenAudioFixtures.halfGain(samples))
    assert(a.ehash == b.ehash)
    assert(a.rmsC0Micro != a.rmsC1Micro) // per-channel envelopes differ
    assert(b.rmsC0Micro < a.rmsC0Micro)
  }

  test("patching one energy window flips few ehash bits (locality)") {
    val (ch, samples) = GenAudioFixtures.renderBase(7L)
    val a = MultiModal.featuresFromPcm(ch, 8000, samples)
    val b = MultiModal.featuresFromPcm(ch, 8000,
      GenAudioFixtures.patch(ch, samples, 30))
    val ham = java.lang.Long.bitCount(a.ehash ^ b.ehash)
    assert(ham >= 0 && ham <= 4, s"patch moved $ham bits")
  }

  test("decodeAudio: WAV encode->decode reproduces pre-encode features " +
    "exactly (lossless round trip, mono and stereo)") {
    for (id <- Seq(1L, 2L, 5L)) {
      val (ch, samples) = GenAudioFixtures.renderBase(id)
      val expected = MultiModal.featuresFromPcm(ch, GenAudioFixtures.Rate,
        samples)
      val got = MultiModal.decodeAudio(GenAudioFixtures.wavBytes(ch, samples))
      assert(got.contains(expected), s"clip $id: $got != $expected")
    }
  }

  test("decodeAudio: AIFF round trip exercises the big-endian 16-bit " +
    "branch and matches pre-encode features exactly") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    for (id <- Seq(1L, 2L)) { // mono and stereo
      val (ch, samples) = GenAudioFixtures.renderBase(id)
      val expected = MultiModal.featuresFromPcm(ch, GenAudioFixtures.Rate,
        samples)
      // AIFF carries big-endian signed PCM: pack high byte first
      val fmt = new AudioFormat(GenAudioFixtures.Rate.toFloat, 16, ch,
        true, true)
      val pcm = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        pcm(2 * i) = ((samples(i) >> 8) & 0xFF).toByte
        pcm(2 * i + 1) = (samples(i) & 0xFF).toByte
      }
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length / ch)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.AIFF, bos)
      val got = MultiModal.decodeAudio(bos.toByteArray)
      assert(got.contains(expected), s"AIFF clip $id: $got != $expected")
    }
  }

  test("decodeAudio: null, empty, and undecodable payloads yield None") {
    assert(MultiModal.decodeAudio(null).isEmpty)
    assert(MultiModal.decodeAudio(Array.emptyByteArray).isEmpty)
    assert(MultiModal.decodeAudio("not a wav".getBytes("UTF-8")).isEmpty)
    // truncated/corrupt payloads that pass format sniffing must drop the
    // row, not poison the job (same NonFatal stance as decodeImage)
    val (ch, samples) = GenAudioFixtures.renderBase(3L)
    val realWav = GenAudioFixtures.wavBytes(ch, samples)
    assert(MultiModal.decodeAudio(realWav.take(30)).isEmpty)
    val corruptRiff =
      "RIFF".getBytes("UTF-8") ++ Array.fill(40)(0xFF.toByte)
    assert(MultiModal.decodeAudio(corruptRiff).isEmpty)
  }

  private def assets(rows: (Long, Array[Byte])*) = {
    val data = rows.map { case (id, payload) =>
      Row(id, "audio", payload,
        Row(Option(payload).map(_.length.toLong).getOrElse(0L), "test"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), MultiModal.assetSchema)
  }

  test("audioFeatures decodes per partition and drops undecodable rows") {
    val (ch, samples) = GenAudioFixtures.renderBase(4L)
    val df = assets(1L -> GenAudioFixtures.wavBytes(ch, samples),
      2L -> "junk".getBytes("UTF-8"), 3L -> null)
    val out = MultiModal.audioFeatures(df).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    val exp = MultiModal.featuresFromPcm(ch, GenAudioFixtures.Rate, samples)
    assert(out(0).getLong(8) == exp.ehash &&
      out(0).getLong(3) == exp.nFrames)
  }

  test("audioNearDupPairs finds the gain twin and the local edit, not " +
    "the unrelated clip") {
    val (ch, base) = GenAudioFixtures.renderBase(8L)
    val twin = GenAudioFixtures.halfGain(base)
    val edited = GenAudioFixtures.patch(ch, base, 20)
    val (chO, other) = GenAudioFixtures.renderBase(9L)
    val df = assets(1L -> GenAudioFixtures.wavBytes(ch, base),
      2L -> GenAudioFixtures.wavBytes(ch, twin),
      3L -> GenAudioFixtures.wavBytes(ch, edited),
      4L -> GenAudioFixtures.wavBytes(chO, other))
    val pairs = MultiModal.audioNearDupPairs(df, maxHamming = 6)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"gain twin missing from $pairs")
    assert(pairs.contains((1L, 3L)), s"local edit missing from $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated clip paired: $pairs")
  }

  test("committed fixtures: engine decode of audio.parquet matches the " +
    "committed pre-encode expected features row-for-row") {
    val wavs = new java.io.File(MultiModal.audioPath)
    assume(wavs.exists, "committed audio fixtures not present")
    def key(r0: Row) = r0.getLong(0) ->
      (1 until 9).map(r0.getLong).toVector
    val got = MultiModal.audioFeatures(
        spark.read.parquet(MultiModal.audioPath))
      .collect().map(key).toMap
    val exp = spark.read.parquet(MultiModal.expectedAudioFeaturesPath)
      .select("asset_id", "channels", "sample_rate", "n_frames",
        "mean_c0_micro", "mean_c1_micro", "rms_c0_micro", "rms_c1_micro",
        "ehash")
      .collect().map(key).toMap
    assert(got.size == 500 && got == exp)
  }
}
