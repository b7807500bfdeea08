package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.MultiModal

/** Audio-pipeline throughput probe: generate N synthetic PCM WAV clips
  * DISTRIBUTED (each task renders and encodes its own partition's clips
  * with the `GenAudioFixtures` waveform generator), then measure the
  * real decode path — `audioFeatures` (javax.sound.sampled decode + PCM
  * stats + ehash per clip) and `audioNearDupPairs` (decode + banded
  * Hamming join). The question this answers for SCALE.md: is the JDK
  * decode fast enough that the narrow-plan design (decode distributes
  * with the scan) holds at corpus scale, and what is the per-core clip
  * rate?
  *
  * Usage: DriveAudioScale [threads] [nClips]
  */
object DriveAudioScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"AUDIO_SCALE n=$n threads=$threads " +
      s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")

    // distributed render+encode: 10% of clips are half-gain twins of
    // id-7 (ehash-identical pairs for the near-dup join to find)
    val assets = spark.range(n).toDF("id").repartition(
        threads.toInt * 4)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (ch, samples) =
            if (id % 10 == 3 && id >= 7) {
              val (c, s) = GenAudioFixtures.renderBase((id - 7) % 50000)
              (c, GenAudioFixtures.halfGain(s))
            } else GenAudioFixtures.renderBase(id % 50000)
          Row(id, "audio", GenAudioFixtures.wavBytes(ch, samples),
            Row(0L, "synth"))
        }
      }(org.apache.spark.sql.Encoders.row(MultiModal.assetSchema))
      .cache()
    assets.count() // materialize render+encode outside the timings
    println(s"AUDIO_CORPUS rows=$n")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"AUD_$name rows=$rows sec=$sec%.1f " +
        f"clips_per_sec=${(n / sec).toLong}")
    }

    timed("FEATURES") {
      val df = MultiModal.audioFeatures(assets)
      df.select(count(lit(1)).as("n"),
        sum(hash(df.columns.map(col): _*).cast("long")).as("ck"))
        .head().getLong(0)
    }
    timed("NEAR_DUP_PAIRS") {
      MultiModal.audioNearDupPairs(assets, maxHamming = 6,
        maxBucketSize = 4096).count()
    }
    spark.stop()
  }
}
