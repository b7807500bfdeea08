package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the pipeline
  * as opaque `binary` columns with typed metadata; decode / feature-extract
  * run as batched per-partition operators.
  *
  * The media codec layer is STUBBED (this environment ships no image/audio
  * libraries): `decodeStub` produces deterministic fake features from the
  * raw bytes. Everything Spark-side — schema, partitioning, batch iteration,
  * output shape — is real and tested; swapping in a real decoder only
  * replaces the stub body.
  */
object MultiModal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = true))), nullable = false)
  ))

  /** Wrap any (id, string-payload, source) table as a multimodal asset
    * table — used to exercise the binary plumbing with the `documents`
    * fixture standing in for real media blobs.
    */
  def ingestFromText(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, modality: String = "blob"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("asset_id"),
      lit(modality).as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(col(textCol)).cast(LongType).as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** DECODE STUB — deterministic fake "decoder": derives an 8-dim feature
    * vector from the payload bytes (windowed byte sums, scaled). A real
    * implementation would decode the media and run a feature extractor
    * here; the signature and batch shape are what matter.
    */
  def decodeStub(payload: Array[Byte]): Array[Long] = {
    val dim = 8
    val out = new Array[Long](dim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xFF).toLong
        i += 1
      }
    }
    out
  }

  private val featureSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** Batched per-partition feature extraction over the binary column —
    * the Scala analogue of a `mapInPandas` decode UDF: one decoder init per
    * partition (amortized), rows streamed through it.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    assets.select("asset_id", "modality", "payload", "meta.n_bytes")
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec handles, model…)
        rows.map { r =>
          val payload =
            if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getString(1), r.getLong(3),
            decodeStub(payload).toSeq)
        }
      }(Encoders.row(featureSchema))
  }

  /** RESIZE STUB — deterministic fake "resize": rescale the payload to
    * exactly `targetBytes` by averaging fixed-width source windows (the
    * byte-level analogue of box-filter image downscaling). Real media
    * resize replaces the window math; the narrow per-partition batch shape
    * and binary-in/binary-out schema are the real plumbing.
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    val out = new Array[Byte](targetBytes)
    if (payload != null && payload.length > 0) {
      var j = 0
      while (j < targetBytes) {
        val from = (j.toLong * payload.length / targetBytes).toInt
        val until0 = ((j + 1).toLong * payload.length / targetBytes).toInt
        val until = if (until0 > from) until0 else from + 1
        var sum = 0L
        var i = from
        while (i < until && i < payload.length) {
          sum += (payload(i) & 0xFF); i += 1
        }
        out(j) = (sum / (until - from)).toByte
        j += 1
      }
    }
    out
  }

  /** Resize every asset's payload to `targetBytes` (metadata updated). */
  def resize(assets: DataFrame, targetBytes: Int): DataFrame = {
    val outSchema = assetSchema
    assets.select("asset_id", "modality", "payload", "meta.n_bytes",
        "meta.source")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val resized = resizeStub(payload, targetBytes)
          Row(r.getLong(0), r.getString(1), resized,
            Row(resized.length.toLong, if (r.isNullAt(4)) null
              else r.getString(4)))
        }
      }(Encoders.row(outSchema))
  }

  /** FRAME-SAMPLE STUB — deterministic fake "frame sampling": treat the
    * payload as `frameBytes`-sized frames and emit every `stride`-th frame
    * as its own asset row (`asset_id`, `frame_no`, frame payload) — the
    * video-to-frames explosion shape, one output row per sampled frame.
    */
  def frameSample(assets: DataFrame, frameBytes: Int,
      stride: Int = 2): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    assets.select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.emptyByteArray
            else r.getAs[Array[Byte]](1)
          val nFrames = payload.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            Row(id, f.toLong,
              java.util.Arrays.copyOfRange(payload, f * frameBytes,
                (f + 1) * frameBytes))
          }
        }
      }(Encoders.row(outSchema))
  }
}
