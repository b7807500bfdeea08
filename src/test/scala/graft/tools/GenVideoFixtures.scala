package graft.tools

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.ops.MultiModal

/** Generates the committed video fixture artifacts in `data/video/` —
  * fully deterministic (seeded LCG, integer pixel math, lossless
  * uncompressed-DIB AVI), so re-running this tool reproduces the
  * committed parquet values.
  *
  *   Test/runMain graft.tools.GenVideoFixtures
  *
  * Artifacts:
  *  - `video.parquet` — 500 real AVI clips (12×9 BI_RGB 24-bit DIB
  *    frames, 8–30 fps, 65–120 frames) as binary payloads in the
  *    multimodal asset schema: 400 unique synthetic clips, 60
  *    half-brightness near-dups (every channel >> 1 — `thash`-exact by
  *    construction, see below), 25 patch-edited near-dups (one temporal
  *    window's frames overwritten with a flat gray frame — a couple of
  *    `thash` bits flip), and 15 exact byte-level duplicates.
  *  - `expected_features.parquet` — per-clip geometry/timing/channel
  *    means/`thash` computed HERE from the raw ARGB frames *before* AVI
  *    encoding via the same shared integer math the engine uses
  *    (`MultiModal.featuresFromFrames`). DIB is lossless, so the engine
  *    matching the committed expectation verifies the whole
  *    encode→demux→decode→feature chain.
  *  - `expected_frames.parquet` — per-frame channel means + dHash
  *    (`MultiModal.featuresFromArgb`), the oracle for the real
  *    video-to-frames explosion.
  *
  * Clip construction: each clip is one seeded 12×9 base frame (even
  * channel values ≤ 128) cyclically shifted by a seeded (dx, dy) per
  * frame — cyclic shifts permute the pixel multiset, so every frame's
  * total luminance is IDENTICAL — plus a per-temporal-window even DC
  * offset d(w) ∈ {0, 2, …, 120} with adjacent offsets forced ≥ 8
  * apart. Adding d to all channels adds exactly d to the integer ITU
  * luminance of every pixel (the /1000 floor commutes because
  * 299+587+114 = 1000), so window w's mean frame luminance is
  * patternTotal + 108·d(w) exactly and `thash` bit w is just
  * d(w) < d(w+1). Halving even channels maps per-pixel luminance to
  * floor(N/2000) + d/2 (d even), preserving every strict window
  * comparison — which is why the half-brightness twins are
  * `thash`-exact by construction, not by measurement (the sanity probe
  * still checks).
  */
object GenVideoFixtures {

  val W = 12
  val H = 9
  val Win = 65

  /** Deterministic 64-bit LCG stream (MMIX constants), seeded per clip —
    * same generator as the image/audio fixture tools.
    */
  private final class Lcg(seed: Long) {
    private var s = seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(n: Int): Int = (((next() >>> 16) % n + n) % n).toInt
  }

  /** One seeded base frame: even channel values in 0..128, family by
    * id%3 (horizontal gradient / bright blob on dark / vertical bars)
    * with seeded per-pixel jitter so dHashes differ across clips.
    */
  private def baseFrame(assetId: Long, r: Lcg): Array[Int] = {
    val out = new Array[Int](W * H)
    val family = assetId % 3
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        val (br, bg, bb) = family match {
          case 0 => // horizontal gradient, per-channel slopes
            (x * 10, (W - 1 - x) * 10, y * 12)
          case 1 => // bright blob on dark background
            val in = x >= 3 && x < 8 && y >= 2 && y < 6
            if (in) (110, 90, 70) else (20, 26, 32)
          case _ => // vertical bars
            if (x % 4 < 2) (96, 48, 24) else (24, 48, 96)
        }
        def ch(v: Int): Int = math.min(128, v + 2 * r.nextInt(11)) & ~1
        out(y * W + x) = 0xFF000000 | (ch(br) << 16) | (ch(bg) << 8) | ch(bb)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-window even DC offsets in {0,2,…,120}, adjacent ≥ 8 apart
    * (rejection-sampled) — the clip's luminance envelope and therefore
    * its `thash`.
    */
  private def offsets(r: Lcg): Array[Int] = {
    val d = new Array[Int](Win)
    d(0) = 2 * r.nextInt(61)
    var w = 1
    while (w < Win) {
      var v = 2 * r.nextInt(61)
      while (math.abs(v - d(w - 1)) < 8) v = 2 * r.nextInt(61)
      d(w) = v
      w += 1
    }
    d
  }

  /** Deterministic synthetic clip for `assetId`: per-frame ARGB arrays
    * plus the AVI frame rate (fps as dwRate with dwScale=1).
    */
  def renderBase(assetId: Long): (Int, Vector[Array[Int]]) = {
    val r = new Lcg(assetId)
    val nFrames = 65 + r.nextInt(56)
    val rate = 8 + r.nextInt(23)
    val base = baseFrame(assetId, r)
    val d = offsets(r)
    val dx = 1 + r.nextInt(W - 1)
    val dy = r.nextInt(H)
    val frames = Vector.tabulate(nFrames) { f =>
      val w = math.min(Win - 1, f * Win / nFrames)
      val off = d(w)
      val sx = (f * dx) % W; val sy = (f * dy) % H
      val out = new Array[Int](W * H)
      var y = 0
      while (y < H) {
        val srcY = (y - sy + H) % H
        var x = 0
        while (x < W) {
          val p = base(srcY * W + ((x - sx + W) % W))
          out(y * W + x) = 0xFF000000 |
            ((((p >> 16) & 0xFF) + off) << 16) |
            ((((p >> 8) & 0xFF) + off) << 8) | ((p & 0xFF) + off)
          x += 1
        }
        y += 1
      }
      out
    }
    (rate, frames)
  }

  /** Exact half brightness: every channel >> 1 (channels are even by
    * construction, so this is exact division) — window luminance
    * ordering is preserved exactly and the twin's `thash` equals the
    * base's (see the object doc for the proof sketch).
    */
  def halfBright(frames: Vector[Array[Int]]): Vector[Array[Int]] =
    frames.map(_.map(p => 0xFF000000 | ((((p >> 16) & 0xFF) >> 1) << 16) |
      ((((p >> 8) & 0xFF) >> 1) << 8) | ((p & 0xFF) >> 1)))

  /** Overwrite one temporal window's frames with a flat gray frame
    * (all channels 200): spikes that window's luminance above the
    * envelope's range, flipping the `thash` comparisons that touch it —
    * the video analogue of the audio tool's window patch.
    */
  def patch(frames: Vector[Array[Int]], window: Int): Vector[Array[Int]] = {
    val n = frames.length
    val f0 = window * n / Win; val f1 = (window + 1) * n / Win
    val gray = Array.fill(W * H)(0xFF000000 | (200 << 16) | (200 << 8) | 200)
    frames.zipWithIndex.map { case (fr, i) =>
      if (i >= f0 && i < f1) gray.clone() else fr
    }
  }

  private def putU16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
  }
  private def putU32(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xFF).toInt); o.write(((v >> 8) & 0xFF).toInt)
    o.write(((v >> 16) & 0xFF).toInt); o.write(((v >> 24) & 0xFF).toInt)
  }
  private def putFcc(o: ByteArrayOutputStream, s: String): Unit =
    o.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  /** BI_RGB 24-bit DIB frame bytes: bottom-up rows, BGR byte order,
    * rows padded to 4-byte boundaries (W=12 → stride 36, no padding).
    */
  def dibBytes(width: Int, height: Int, argb: Array[Int]): Array[Byte] = {
    val stride = ((width * 3 + 3) / 4) * 4
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val srcRow = (height - 1 - y) * width
      var x = 0
      while (x < width) {
        val p = argb(srcRow + x)
        val o = y * stride + 3 * x
        out(o) = (p & 0xFF).toByte
        out(o + 1) = ((p >> 8) & 0xFF).toByte
        out(o + 2) = ((p >> 16) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** A complete RIFF AVI file: `hdrl` (avih + one `vids` strl), `movi`
    * with one chunk per frame, and an `idx1` index (offsets relative to
    * the `movi` list type fourcc, the common writer convention). The
    * frame payloads are supplied pre-encoded so tests can feed either
    * DIB (`codec="DIB "`, chunk id `00db`) or MJPEG (`codec="MJPG"`,
    * chunk id `00dc`) frames; `topDown` writes a negative biHeight.
    */
  def aviBytes(width: Int, height: Int, rate: Int,
      framePayloads: Seq[Array[Byte]], codec: String = "DIB ",
      topDown: Boolean = false): Array[Byte] = {
    val mjpg = codec == "MJPG"
    val chunkId = if (mjpg) "00dc" else "00db"
    val maxFrame = if (framePayloads.isEmpty) 0
      else framePayloads.map(_.length).max

    val movi = new ByteArrayOutputStream()
    putFcc(movi, "movi")
    val frameOffsets = framePayloads.map { p =>
      val off = movi.size() - 4 // relative to the 'movi' fourcc
      putFcc(movi, chunkId); putU32(movi, p.length.toLong)
      movi.write(p)
      if ((p.length & 1) == 1) movi.write(0)
      off
    }
    val moviBytes = movi.toByteArray

    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
    putU32(strf, 40); putU32(strf, width.toLong)
    putU32(strf, (if (topDown) -height else height).toLong & 0xFFFFFFFFL)
    putU16(strf, 1); putU16(strf, 24)
    if (mjpg) putFcc(strf, "MJPG") else putU32(strf, 0)
    putU32(strf, (((width * 3 + 3) / 4) * 4 * height).toLong)
    putU32(strf, 0); putU32(strf, 0); putU32(strf, 0); putU32(strf, 0)

    val strh = new ByteArrayOutputStream()
    putFcc(strh, "vids"); putFcc(strh, codec)
    putU32(strh, 0); putU16(strh, 0); putU16(strh, 0) // flags, prio, lang
    putU32(strh, 0) // initial frames
    putU32(strh, 1); putU32(strh, rate.toLong) // dwScale, dwRate
    putU32(strh, 0); putU32(strh, framePayloads.length.toLong)
    putU32(strh, maxFrame.toLong); putU32(strh, 0xFFFFFFFFL) // buf, quality
    putU32(strh, 0) // sample size
    putU16(strh, 0); putU16(strh, 0); putU16(strh, width); putU16(strh, height)

    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      putFcc(o, id); putU32(o, data.length.toLong); o.write(data)
      if ((data.length & 1) == 1) o.write(0)
      o.toByteArray
    }
    def list(tpe: String, data: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      putFcc(o, "LIST"); putU32(o, (data.length + 4).toLong)
      putFcc(o, tpe); o.write(data)
      if (((data.length + 4) & 1) == 1) o.write(0)
      o.toByteArray
    }

    val avih = new ByteArrayOutputStream()
    putU32(avih, if (rate > 0) 1000000L / rate else 0L)
    putU32(avih, 0); putU32(avih, 0)
    putU32(avih, 0x10) // AVIF_HASINDEX
    putU32(avih, framePayloads.length.toLong)
    putU32(avih, 0); putU32(avih, 1) // initial frames, streams
    putU32(avih, maxFrame.toLong)
    putU32(avih, width.toLong); putU32(avih, height.toLong)
    putU32(avih, 0); putU32(avih, 0); putU32(avih, 0); putU32(avih, 0)

    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)

    val idx = new ByteArrayOutputStream()
    frameOffsets.zip(framePayloads).foreach { case (off, p) =>
      putFcc(idx, chunkId); putU32(idx, 0x10) // AVIIF_KEYFRAME
      putU32(idx, off.toLong); putU32(idx, p.length.toLong)
    }

    val body = hdrl ++
      locally {
        val o = new ByteArrayOutputStream()
        putFcc(o, "LIST"); putU32(o, moviBytes.length.toLong)
        o.write(moviBytes)
        if ((moviBytes.length & 1) == 1) o.write(0)
        o.toByteArray
      } ++ chunk("idx1", idx.toByteArray)

    val out = new ByteArrayOutputStream()
    putFcc(out, "RIFF"); putU32(out, (body.length + 4).toLong)
    putFcc(out, "AVI "); out.write(body)
    out.toByteArray
  }

  /** (asset_id, source tag, fps rate, frames). ids 0–399 unique bases;
    * 400–459 half-brightness twins of base id-400; 460–484 patch twins
    * of base id-460; 485–499 exact duplicates of base id-485.
    */
  def allClips(): Seq[(Long, String, Int, Vector[Array[Int]])] = {
    val bases = (0L until 400L).map { id =>
      val (rate, fr) = renderBase(id); (id, "base", rate, fr)
    }
    val bright = (400L until 460L).map { id =>
      val (rate, fr) = renderBase(id - 400)
      (id, s"bright_of_${id - 400}", rate, halfBright(fr))
    }
    val patched = (460L until 485L).map { id =>
      val (rate, fr) = renderBase(id - 460)
      val r = new Lcg(id)
      (id, s"patch_of_${id - 460}", rate, patch(fr, r.nextInt(Win)))
    }
    val dups = (485L until 500L).map { id =>
      val (rate, fr) = renderBase(id - 485)
      (id, s"dup_of_${id - 485}", rate, fr)
    }
    bases ++ bright ++ patched ++ dups
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val clips = allClips()
    val assetRows = clips.map { case (id, src, rate, frames) =>
      val avi = aviBytes(W, H, rate, frames.map(dibBytes(W, H, _)))
      Row(id, "video", avi, Row(avi.length.toLong, src))
    }
    val featRows = clips.map { case (id, _, rate, frames) =>
      val f = MultiModal.featuresFromFrames(W, H, rate * 1000000L,
        frames.iterator).get
      Row(id, f.width.toLong, f.height.toLong, f.nFrames, f.fpsMicro,
        f.meanRMicro, f.meanGMicro, f.meanBMicro, f.thash)
    }
    val frameRows = clips.flatMap { case (id, _, _, frames) =>
      frames.zipWithIndex.map { case (argb, i) =>
        val f = MultiModal.featuresFromArgb(W, H, argb)
        Row(id, i.toLong, f.meanRMicro, f.meanGMicro, f.meanBMicro, f.dhash)
      }
    }
    val featSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("fps_micro", LongType, nullable = false),
      StructField("mean_r_micro", LongType, nullable = false),
      StructField("mean_g_micro", LongType, nullable = false),
      StructField("mean_b_micro", LongType, nullable = false),
      StructField("thash", LongType, nullable = false)))
    val frameSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("mean_r_micro", LongType, nullable = false),
      StructField("mean_g_micro", LongType, nullable = false),
      StructField("mean_b_micro", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))

    spark.createDataFrame(
        spark.sparkContext.parallelize(assetRows, 1),
        MultiModal.assetSchema)
      .write.mode("overwrite").parquet(MultiModal.videoPath)
    spark.createDataFrame(
        spark.sparkContext.parallelize(featRows, 1), featSchema)
      .write.mode("overwrite").parquet(MultiModal.expectedVideoFeaturesPath)
    spark.createDataFrame(
        spark.sparkContext.parallelize(frameRows, 1), frameSchema)
      .write.mode("overwrite").parquet(MultiModal.expectedVideoFramesPath)

    // sanity probes: planted twins must land at the intended distances
    val byId = featRows.map(r => r.getLong(0) -> r.getLong(8)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val brightExact = (400L until 460L).count(id =>
      byId(id) == byId(id - 400))
    val patchClose = (460L until 485L).count(id =>
      ham(byId(id), byId(id - 460)) <= 6 && byId(id) != byId(id - 460))
    val distinct = featRows.map(_.getLong(8)).distinct.size
    val bytes = assetRows.map(_.getAs[Array[Byte]](2).length.toLong).sum
    println(s"GENERATED ${clips.size} clips (${bytes / 1024} KiB raw) -> " +
      s"${MultiModal.videoPath} (distinct thash=$distinct, bright twins " +
      s"thash-exact=$brightExact/60, patch twins 1<=ham<=6=$patchClose/25, " +
      s"frame rows=${frameRows.size})")
    spark.stop()
  }
}
