package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.MultiModal

/** Video-pipeline throughput probe: generate N synthetic AVI clips
  * DISTRIBUTED (each task renders and encodes its own partition's clips
  * with the `GenVideoFixtures` generator — 12×9 DIB frames, 65–120 per
  * clip), then measure the real decode path — `videoFeatures` (RIFF
  * demux + per-frame DIB decode + temporal hash per clip),
  * `videoFrameFeatures` (the per-frame explosion), and
  * `videoNearDupPairs` (decode + banded Hamming join). The questions
  * this answers for SCALE.md: does the pure-JVM demuxer keep the
  * narrow-plan design viable at corpus scale, and what are the per-box
  * clip and frame rates?
  *
  * Usage: DriveVideoScale [threads] [nClips]
  */
object DriveVideoScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"VIDEO_SCALE n=$n threads=$threads " +
      s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")

    // distributed render+encode: 10% of clips are half-brightness twins
    // of id-7 (thash-identical pairs for the near-dup join to find)
    val assets = spark.range(n).toDF("id").repartition(threads.toInt * 4)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (rate, fr0) = GenVideoFixtures.renderBase(id % 50000)
          val fr = if (id % 10 == 3 && id >= 7) {
            val (_, base) = GenVideoFixtures.renderBase((id - 7) % 50000)
            GenVideoFixtures.halfBright(base)
          } else fr0
          val avi = GenVideoFixtures.aviBytes(GenVideoFixtures.W,
            GenVideoFixtures.H, rate,
            fr.map(GenVideoFixtures.dibBytes(GenVideoFixtures.W,
              GenVideoFixtures.H, _)))
          Row(id, "video", avi, Row(avi.length.toLong, "synth"))
        }
      }(org.apache.spark.sql.Encoders.row(MultiModal.assetSchema))
      .cache()
    assets.count() // materialize render+encode outside the timings
    val nFrames = MultiModal.videoFeatures(assets)
      .agg(sum("n_frames")).head().getLong(0)
    println(s"VIDEO_CORPUS rows=$n frames=$nFrames")

    def timed(name: String, unit: String, items: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"VID_$name rows=$rows sec=$sec%.1f " +
        f"${unit}_per_sec=${(items / sec).toLong}")
    }

    timed("FEATURES", "clips", n) {
      val df = MultiModal.videoFeatures(assets)
      df.select(count(lit(1)).as("n"),
        sum(hash(df.columns.map(col): _*).cast("long")).as("ck"))
        .head().getLong(0)
    }
    timed("FRAME_EXPLODE", "frames", nFrames) {
      val df = MultiModal.videoFrameFeatures(assets)
      df.select(count(lit(1)).as("n"),
        sum(hash(df.columns.map(col): _*).cast("long")).as("ck"))
        .head().getLong(0)
    }
    timed("NEAR_DUP_PAIRS", "clips", n) {
      MultiModal.videoNearDupPairs(assets, maxHamming = 6,
        maxBucketSize = 4096).count()
    }
    spark.stop()
  }
}
