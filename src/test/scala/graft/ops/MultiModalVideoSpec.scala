package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.tools.GenVideoFixtures

/** Pins for the REAL video path: AVI RIFF demux, exact frame statistics
  * (hand-computed case), thash semantics (brightness invariance,
  * locality of edits), DIB round-trip fidelity (bottom-up AND top-down),
  * the MJPEG frame codec path, `rec ` grouping and dropped-frame chunks,
  * poison-pill safety, and the Hamming-band video near-dup join.
  */
class MultiModalVideoSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val W = GenVideoFixtures.W
  private val H = GenVideoFixtures.H

  /** Flat gray frame: every channel = v (so per-pixel luminance = v). */
  private def flat(v: Int): Array[Int] =
    Array.fill(W * H)(0xFF000000 | (v << 16) | (v << 8) | v)

  /** 130 flat frames with luminance = frameIndex: every one of the 65
    * two-frame windows has strictly larger mean luminance than its
    * predecessor → all 64 comparison bits set. Channel means are exact:
    * mean value = (0+1+…+129)/130 = 64.5 → 64_500_000 micros.
    */
  test("featuresFromFrames: hand-computed thash/means on a ramp") {
    val frames = Vector.tabulate(130)(f => flat(f))
    val f = MultiModal.featuresFromFrames(W, H, 12000000L,
      frames.iterator).get
    assert(f.thash == -1L)
    assert(f.meanRMicro == 64500000L && f.meanGMicro == 64500000L &&
      f.meanBMicro == 64500000L)
    assert(f.nFrames == 130L && f.width == W && f.height == H &&
      f.fpsMicro == 12000000L)
  }

  test("featuresFromFrames: descending ramp hashes to 0; clips under 65 " +
    "frames hash to 0; zero frames is None") {
    val desc = Vector.tabulate(130)(f => flat(129 - f))
    assert(MultiModal.featuresFromFrames(W, H, 0L, desc.iterator)
      .get.thash == 0L)
    val tiny = Vector.fill(64)(flat(10))
    val ft = MultiModal.featuresFromFrames(W, H, 0L, tiny.iterator).get
    assert(ft.thash == 0L && ft.meanRMicro == 10000000L)
    assert(MultiModal.featuresFromFrames(W, H, 0L, Iterator.empty).isEmpty)
  }

  test("thash is invariant under uniform half-brightness; edits to one " +
    "window are local") {
    val (_, frames) = GenVideoFixtures.renderBase(2L)
    val a = MultiModal.featuresFromFrames(W, H, 0L, frames.iterator).get
    val b = MultiModal.featuresFromFrames(W, H, 0L,
      GenVideoFixtures.halfBright(frames).iterator).get
    assert(a.thash == b.thash)
    assert(b.meanRMicro < a.meanRMicro)
    val c = MultiModal.featuresFromFrames(W, H, 0L,
      GenVideoFixtures.patch(frames, 30).iterator).get
    val ham = java.lang.Long.bitCount(a.thash ^ c.thash)
    assert(ham <= 4, s"patch moved $ham bits")
  }

  test("decodeVideo: DIB AVI encode->demux->decode reproduces pre-encode " +
    "features exactly (lossless round trip)") {
    for (id <- Seq(0L, 1L, 2L, 5L)) {
      val (rate, frames) = GenVideoFixtures.renderBase(id)
      val expected = MultiModal.featuresFromFrames(W, H, rate * 1000000L,
        frames.iterator).get
      val avi = GenVideoFixtures.aviBytes(W, H, rate,
        frames.map(GenVideoFixtures.dibBytes(W, H, _)))
      assert(MultiModal.decodeVideo(avi).contains(expected), s"clip $id")
    }
  }

  test("decodeVideo: top-down DIB (negative biHeight) decodes to the " +
    "same features as bottom-up") {
    val (rate, frames) = GenVideoFixtures.renderBase(3L)
    val expected = MultiModal.featuresFromFrames(W, H, rate * 1000000L,
      frames.iterator).get
    // top-down rows are stored first-row-first: flip each frame's rows
    // before DIB packing (dibBytes writes bottom-up order)
    val flipped = frames.map { argb =>
      val out = new Array[Int](W * H)
      for (y <- 0 until H; x <- 0 until W)
        out(y * W + x) = argb((H - 1 - y) * W + x)
      out
    }
    val avi = GenVideoFixtures.aviBytes(W, H, rate,
      flipped.map(GenVideoFixtures.dibBytes(W, H, _)), topDown = true)
    assert(MultiModal.decodeVideo(avi).contains(expected))
  }

  /** JPEG is lossy, so the MJPEG pin is self-consistency: demuxing the
    * AVI must yield exactly the features of ImageIO-decoding the same
    * JPEG payloads directly — the demux adds nothing and loses nothing.
    */
  test("decodeVideo: MJPEG frames route through the JPEG codec") {
    val (rate, frames) = GenVideoFixtures.renderBase(4L)
    val jpegs = frames.take(70).map { argb =>
      val img = new java.awt.image.BufferedImage(W, H,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, W, H, argb, 0, W)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val decodedFrames = jpegs.map { j =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(j))
      img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
    }
    val expected = MultiModal.featuresFromFrames(W, H, rate * 1000000L,
      decodedFrames.iterator).get
    val avi = GenVideoFixtures.aviBytes(W, H, rate, jpegs, codec = "MJPG")
    assert(MultiModal.decodeVideo(avi).contains(expected))
  }

  test("decodeVideo: null, empty, junk, truncated, and zero-frame " +
    "payloads yield None; dropped-frame chunks are skipped") {
    assert(MultiModal.decodeVideo(null).isEmpty)
    assert(MultiModal.decodeVideo(Array.emptyByteArray).isEmpty)
    assert(MultiModal.decodeVideo("not an avi".getBytes("UTF-8")).isEmpty)
    val (rate, frames) = GenVideoFixtures.renderBase(6L)
    val dibs = frames.map(GenVideoFixtures.dibBytes(W, H, _))
    val avi = GenVideoFixtures.aviBytes(W, H, rate, dibs)
    assert(MultiModal.decodeVideo(avi.take(40)).isEmpty)
    assert(MultiModal.decodeVideo(avi.take(avi.length / 3)).isDefined ||
      MultiModal.decodeVideo(avi.take(avi.length / 3)).isEmpty) // no throw
    val corrupt = "RIFF".getBytes("UTF-8") ++ Array.fill(60)(0xFF.toByte)
    assert(MultiModal.decodeVideo(corrupt).isEmpty)
    // zero-length chunks model dropped frames: features must equal the
    // clip with those frames genuinely absent
    val withDrops = GenVideoFixtures.aviBytes(W, H, rate,
      dibs.take(70) :+ Array.emptyByteArray)
    val expected = MultiModal.featuresFromFrames(W, H, rate * 1000000L,
      frames.take(70).iterator).get
    assert(MultiModal.decodeVideo(withDrops).contains(expected))
  }

  private def assets(rows: (Long, Array[Byte])*) = {
    val data = rows.map { case (id, payload) =>
      Row(id, "video", payload,
        Row(Option(payload).map(_.length.toLong).getOrElse(0L), "test"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), MultiModal.assetSchema)
  }

  test("videoFeatures decodes per partition and drops undecodable rows; " +
    "videoFrameFeatures explodes per frame") {
    val (rate, frames) = GenVideoFixtures.renderBase(7L)
    val avi = GenVideoFixtures.aviBytes(W, H, rate,
      frames.map(GenVideoFixtures.dibBytes(W, H, _)))
    val df = assets(1L -> avi, 2L -> "junk".getBytes("UTF-8"), 3L -> null)
    val out = MultiModal.videoFeatures(df).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    val exp = MultiModal.featuresFromFrames(W, H, rate * 1000000L,
      frames.iterator).get
    assert(out(0).getLong(8) == exp.thash && out(0).getLong(3) == exp.nFrames)
    val fr = MultiModal.videoFrameFeatures(df).collect()
    assert(fr.length == frames.length &&
      fr.map(_.getLong(0)).toSet == Set(1L))
    val f0 = MultiModal.featuresFromArgb(W, H, frames(0))
    val r0 = fr.minBy(_.getLong(1))
    assert(r0.getLong(5) == f0.dhash && r0.getLong(2) == f0.meanRMicro)
  }

  test("videoNearDupPairs finds the brightness twin and the local edit, " +
    "not the unrelated clip") {
    val (rate, base) = GenVideoFixtures.renderBase(8L)
    def avi(fr: Vector[Array[Int]]) = GenVideoFixtures.aviBytes(W, H, rate,
      fr.map(GenVideoFixtures.dibBytes(W, H, _)))
    val df = assets(1L -> avi(base),
      2L -> avi(GenVideoFixtures.halfBright(base)),
      3L -> avi(GenVideoFixtures.patch(base, 20)),
      4L -> avi(GenVideoFixtures.renderBase(9L)._2))
    val pairs = MultiModal.videoNearDupPairs(df, maxHamming = 6)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"brightness twin missing from $pairs")
    assert(pairs.contains((1L, 3L)), s"local edit missing from $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated clip paired: $pairs")
  }

  test("committed fixtures: engine decode of video.parquet matches the " +
    "committed pre-encode expected features row-for-row") {
    val avis = new java.io.File(MultiModal.videoPath)
    assume(avis.exists, "committed video fixtures not present")
    def key(r0: Row) = r0.getLong(0) ->
      (1 until 9).map(r0.getLong).toVector
    val got = MultiModal.videoFeatures(
        spark.read.parquet(MultiModal.videoPath))
      .collect().map(key).toMap
    val exp = spark.read.parquet(MultiModal.expectedVideoFeaturesPath)
      .select("asset_id", "width", "height", "n_frames", "fps_micro",
        "mean_r_micro", "mean_g_micro", "mean_b_micro", "thash")
      .collect().map(key).toMap
    assert(got.size == 500 && got == exp)
  }
}
