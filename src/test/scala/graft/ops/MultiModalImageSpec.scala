package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins for the REAL image path: javax.imageio decode, exact pixel
  * statistics, dHash semantics (hand-computed case, brightness
  * invariance, locality of edits), PNG round-trip fidelity, and the
  * Hamming-band image near-dup join.
  */
class MultiModalImageSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def gray(v: Int): Int = (v << 16) | (v << 8) | v

  /** 9×8 image, one pixel per dHash grid cell, luminance strictly
    * increasing left-to-right: every comparison cell(c) < cell(c+1) holds
    * → all 64 bits set.
    */
  test("featuresFromArgb: hand-computed dHash on a 9x8 ramp") {
    val px = Array.tabulate(9 * 8)(i => gray(10 + 20 * (i % 9)))
    val f = MultiModal.featuresFromArgb(9, 8, px)
    assert(f.dhash == -1L) // all 64 comparison bits set
    // mean of 10,30,...,170 = 90 exactly, all channels
    assert(f.meanRMicro == 90000000L && f.meanGMicro == 90000000L &&
      f.meanBMicro == 90000000L)
    assert(f.width == 9 && f.height == 8)
  }

  test("featuresFromArgb: descending ramp has zero dHash, images below " +
    "the 9x8 grid hash to 0") {
    val desc = Array.tabulate(9 * 8)(i => gray(200 - 20 * (i % 9)))
    assert(MultiModal.featuresFromArgb(9, 8, desc).dhash == 0L)
    val tiny = Array.fill(4 * 4)(gray(7))
    val f = MultiModal.featuresFromArgb(4, 4, tiny)
    assert(f.dhash == 0L && f.meanRMicro == 7000000L)
  }

  test("dHash is invariant under uniform brightness shift") {
    val r = new scala.util.Random(7)
    val px = Array.fill(32 * 24)(gray(20 + r.nextInt(180)))
    val shifted = px.map { p =>
      (((p >> 16 & 0xFF) + 30) << 16) | (((p >> 8 & 0xFF) + 30) << 8) |
        ((p & 0xFF) + 30)
    }
    val a = MultiModal.featuresFromArgb(32, 24, px)
    val b = MultiModal.featuresFromArgb(32, 24, shifted)
    assert(a.dhash == b.dhash)
    assert(b.meanRMicro == a.meanRMicro + 30000000L)
  }

  private def png(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage: PNG encode->decode reproduces pre-encode features " +
    "exactly (lossless round trip)") {
    val r = new scala.util.Random(11)
    val px = Array.fill(64 * 48)(
      (r.nextInt(256) << 16) | (r.nextInt(256) << 8) | r.nextInt(256))
    val expected = MultiModal.featuresFromArgb(64, 48, px)
    assert(MultiModal.decodeImage(png(64, 48, px)).contains(expected))
  }

  test("decodeImage: null, empty, and undecodable payloads yield None") {
    assert(MultiModal.decodeImage(null).isEmpty)
    assert(MultiModal.decodeImage(Array.emptyByteArray).isEmpty)
    assert(MultiModal.decodeImage("not a png".getBytes("UTF-8")).isEmpty)
    // truncated/corrupt payloads that pass format sniffing: JDK readers
    // throw RuntimeExceptions on these, which must also drop the row,
    // not poison the job (review fix: NonFatal, not just IOException)
    val realPng = png(16, 16, Array.fill(256)(gray(9)))
    assert(MultiModal.decodeImage(realPng.take(30)).isEmpty)
    val corruptGif = "GIF89a".getBytes("UTF-8") ++ Array.fill(20)(0xFF.toByte)
    assert(MultiModal.decodeImage(corruptGif).isEmpty)
    val corruptBmp = "BM".getBytes("UTF-8") ++ Array.fill(30)(0x7F.toByte)
    assert(MultiModal.decodeImage(corruptBmp).isEmpty)
  }

  private def assets(rows: (Long, Array[Byte])*) = {
    val data = rows.map { case (id, payload) =>
      Row(id, "image", payload,
        Row(Option(payload).map(_.length.toLong).getOrElse(0L), "test"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), MultiModal.assetSchema)
  }

  test("imageFeatures decodes per partition and drops undecodable rows") {
    val r = new scala.util.Random(13)
    val px = Array.fill(16 * 16)(gray(r.nextInt(256)))
    val df = assets(1L -> png(16, 16, px), 2L -> "junk".getBytes("UTF-8"),
      3L -> null)
    val out = MultiModal.imageFeatures(df).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    val exp = MultiModal.featuresFromArgb(16, 16, px)
    assert(out(0).getLong(1) == 16 && out(0).getLong(6) == exp.dhash)
  }

  test("imageNearDupPairs finds the brightness twin and the local edit, " +
    "not the unrelated image") {
    val r = new scala.util.Random(17)
    val base = Array.fill(36 * 24)(gray(20 + r.nextInt(160)))
    val twin = base.map { p =>
      (((p >> 16 & 0xFF) + 12) << 16) | (((p >> 8 & 0xFF) + 12) << 8) |
        ((p & 0xFF) + 12)
    }
    // local edit: blank one dHash grid cell (<=2 comparison bits move)
    val edited = base.clone()
    for (y <- 9 until 12; x <- 8 until 12) edited(y * 36 + x) = gray(127)
    // unrelated: an independent random field — expected hamming ~32
    val other = Array.fill(36 * 24)(gray(20 + r.nextInt(160)))
    val df = assets(1L -> png(36, 24, base), 2L -> png(36, 24, twin),
      3L -> png(36, 24, edited), 4L -> png(36, 24, other))
    val pairs = MultiModal.imageNearDupPairs(df, maxHamming = 6)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"brightness twin missing from $pairs")
    assert(pairs.contains((1L, 3L)), s"local edit missing from $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated image paired: $pairs")
  }

  test("committed fixtures: engine decode of images.parquet matches the " +
    "committed pre-encode expected features row-for-row") {
    val imgs = new java.io.File(MultiModal.imagesPath)
    assume(imgs.exists, "committed image fixtures not present")
    val got = MultiModal.imageFeatures(
        spark.read.parquet(MultiModal.imagesPath))
      .collect().map(r0 => r0.getLong(0) ->
        (r0.getLong(1), r0.getLong(2), r0.getLong(3), r0.getLong(4),
          r0.getLong(5), r0.getLong(6))).toMap
    val exp = spark.read.parquet(MultiModal.expectedFeaturesPath)
      .collect().map(r0 => r0.getLong(0) ->
        (r0.getLong(1), r0.getLong(2), r0.getLong(3), r0.getLong(4),
          r0.getLong(5), r0.getLong(6))).toMap
    assert(got.size == 500 && got == exp)
  }
}
