package graft.tools

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.ops.MultiModal

/** Generates the committed image fixture artifacts in `data/images/` —
  * fully deterministic (seeded LCG, integer pixel math, lossless PNG),
  * so re-running this tool reproduces the committed parquet values.
  *
  *   Test/runMain graft.tools.GenImageFixtures
  *
  * Artifacts:
  *  - `images.parquet` — 500 real 64×48 PNG images as binary payloads in
  *    the multimodal asset schema: 400 unique synthetic patterns
  *    (checkerboards / horizontal / vertical gradients / diagonal
  *    stripes, LCG-colored), 60 brightness-shifted near-dups (+6 per
  *    channel — dHash-invariant, means differ), 25 patch-edited
  *    near-dups (one grid cell overwritten — a few dHash bits flip),
  *    and 15 exact byte-level duplicates.
  *  - `expected_features.parquet` — per-image width/height/channel-mean
  *    micros/dHash computed HERE from the raw ARGB arrays *before* PNG
  *    encoding via the same shared integer math the engine uses
  *    (`MultiModal.featuresFromArgb`). The engine decodes the PNGs at
  *    query time; matching the committed expectation therefore verifies
  *    the ImageIO encode→decode round trip end-to-end, not just the
  *    arithmetic.
  */
object GenImageFixtures {

  val W = 64; val H = 48

  /** Deterministic 64-bit LCG stream (MMIX constants), seeded per image. */
  private final class Lcg(seed: Long) {
    private var s = seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    /** uniform in [0, n) from the high bits (low LCG bits are weak) */
    def nextInt(n: Int): Int = (((next() >>> 16) % n + n) % n).toInt
  }

  /** Base colors capped at 180 so block offset (≤31) + texture noise
    * (≤15) + the +6 brightness twin never clip (≤232) — clipping would
    * break luminance-order invariance and make the twin's dHash drift
    * unpredictably.
    */
  private def color(r: Lcg): Int =
    (r.nextInt(181) << 16) | (r.nextInt(181) << 8) | r.nextInt(181)

  /** Deterministic synthetic pattern for `assetId`: pattern family by
    * id%4, parameters from the id-seeded LCG.
    */
  def renderBase(assetId: Long): Array[Int] = {
    val r = new Lcg(assetId)
    val c0 = color(r); val c1 = color(r)
    val px = new Array[Int](W * H)
    (assetId % 4) match {
      case 0 => // checkerboard, cell size 4/8/12/16
        val cs = 4 * (1 + r.nextInt(4))
        var y = 0
        while (y < H) {
          var x = 0
          while (x < W) {
            px(y * W + x) = if (((x / cs) + (y / cs)) % 2 == 0) c0 else c1
            x += 1
          }
          y += 1
        }
      case 1 => // horizontal gradient c0 → c1
        var y = 0
        while (y < H) {
          var x = 0
          while (x < W) {
            px(y * W + x) = lerp(c0, c1, x, W - 1)
            x += 1
          }
          y += 1
        }
      case 2 => // vertical gradient c0 → c1
        var y = 0
        while (y < H) {
          val c = lerp(c0, c1, y, H - 1)
          var x = 0
          while (x < W) { px(y * W + x) = c; x += 1 }
          y += 1
        }
      case _ => // diagonal stripes, width 3..10
        val sw = 3 + r.nextInt(8)
        var y = 0
        while (y < H) {
          var x = 0
          while (x < W) {
            px(y * W + x) = if (((x + y) / sw) % 2 == 0) c0 else c1
            x += 1
          }
          y += 1
        }
    }
    // per-dHash-grid-cell random luminance offset (+0..31, all channels):
    // without it, smooth gradients collapse to slope-sign dHashes shared
    // by ~half the images of a family (2,235 accidental hamming-0 pairs
    // measured) and the dedup query degenerates into giant
    // accidental-collision buckets. A ±16 per-cell jitter dominates the
    // per-cell gradient step, making each base's dHash effectively a
    // unique random 64-bit word while planted twins stay at distance 0–2.
    var cy = 0
    while (cy < 8) {
      val y0 = cy * H / 8; val y1 = (cy + 1) * H / 8
      var cx = 0
      while (cx < 9) {
        val x0 = cx * W / 9; val x1 = (cx + 1) * W / 9
        val o = r.nextInt(32)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = px(y * W + x)
            px(y * W + x) = (((p >> 16 & 0xFF) + o) << 16) |
              (((p >> 8 & 0xFF) + o) << 8) | ((p & 0xFF) + o)
            x += 1
          }
          y += 1
        }
        cx += 1
      }
      cy += 1
    }
    // per-pixel texture noise (+0..15 per channel) on top, so PNG bytes
    // differ everywhere and channel means are image-specific
    var i = 0
    while (i < px.length) {
      val p = px(i)
      px(i) = (((p >> 16 & 0xFF) + r.nextInt(16)) << 16) |
        (((p >> 8 & 0xFF) + r.nextInt(16)) << 8) | ((p & 0xFF) + r.nextInt(16))
      i += 1
    }
    px
  }

  private def lerp(c0: Int, c1: Int, i: Int, n: Int): Int = {
    def ch(c: Int, s: Int) = (c >> s) & 0xFF
    def m(s: Int) = ch(c0, s) + (ch(c1, s) - ch(c0, s)) * i / n
    (m(16) << 16) | (m(8) << 8) | m(0)
  }

  /** Uniform +delta per channel (inputs capped ≤200, so no clipping):
    * luminance ordering is preserved → identical dHash, shifted means.
    */
  def brighten(px: Array[Int], delta: Int): Array[Int] =
    px.map { p =>
      (((p >> 16 & 0xFF) + delta) << 16) |
        (((p >> 8 & 0xFF) + delta) << 8) | ((p & 0xFF) + delta)
    }

  /** Overwrite one 9×8-grid cell with a fixed mid-gray block: flips the
    * handful of dHash comparisons that touch the cell, leaving the rest —
    * a small local edit, hamming ≈ 1–4.
    */
  def patch(px: Array[Int], cellX: Int, cellY: Int): Array[Int] = {
    val out = px.clone()
    val x0 = cellX * W / 9; val x1 = (cellX + 1) * W / 9
    val y0 = cellY * H / 8; val y1 = (cellY + 1) * H / 8
    var y = y0
    while (y < y1) {
      var x = x0
      while (x < x1) { out(y * W + x) = 0x7F7F7F; x += 1 }
      y += 1
    }
    out
  }

  def pngBytes(px: Array[Int]): Array[Byte] = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, W, H, px, 0, W)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (asset_id, source tag, pixels). ids 0–399 unique bases; 400–459
    * brightness twins of base id-400; 460–484 patch twins of base
    * id-460; 485–499 exact duplicates of base id-485.
    */
  def allImages(): Seq[(Long, String, Array[Int])] = {
    val bases = (0L until 400L).map(id => (id, "base", renderBase(id)))
    val bright = (400L until 460L).map { id =>
      (id, s"bright_of_${id - 400}", brighten(renderBase(id - 400), 6))
    }
    val patched = (460L until 485L).map { id =>
      val r = new Lcg(id)
      (id, s"patch_of_${id - 460}",
        patch(renderBase(id - 460), r.nextInt(8), r.nextInt(8)))
    }
    val dups = (485L until 500L).map { id =>
      (id, s"dup_of_${id - 485}", renderBase(id - 485))
    }
    bases ++ bright ++ patched ++ dups
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val imgs = allImages()
    val assetRows = imgs.map { case (id, src, px) =>
      val png = pngBytes(px)
      Row(id, "image", png, Row(png.length.toLong, src))
    }
    val featRows = imgs.map { case (id, _, px) =>
      val f = MultiModal.featuresFromArgb(W, H, px)
      Row(id, f.width.toLong, f.height.toLong,
        f.meanRMicro, f.meanGMicro, f.meanBMicro, f.dhash)
    }
    val featSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("mean_r_micro", LongType, nullable = false),
      StructField("mean_g_micro", LongType, nullable = false),
      StructField("mean_b_micro", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))

    spark.createDataFrame(
        spark.sparkContext.parallelize(assetRows, 1),
        MultiModal.assetSchema)
      .write.mode("overwrite").parquet(MultiModal.imagesPath)
    spark.createDataFrame(
        spark.sparkContext.parallelize(featRows, 1), featSchema)
      .write.mode("overwrite").parquet(MultiModal.expectedFeaturesPath)

    val distinctHashes = featRows.map(_.getLong(6)).distinct.size
    println(s"GENERATED ${imgs.size} images -> ${MultiModal.imagesPath} " +
      s"(distinct dhash=$distinctHashes)")
    spark.stop()
  }
}
