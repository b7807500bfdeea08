package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.MultiModal

/** Image-pipeline throughput probe: generate N synthetic PNGs
  * DISTRIBUTED (each task renders and encodes its own partition's
  * images with the `GenImageFixtures` pattern generator), then measure
  * the real decode path — `imageFeatures` (ImageIO decode + pixel
  * stats + dHash per image) and `imageNearDupPairs` (decode + banded
  * Hamming join). The question this answers for SCALE.md: is the
  * JDK decode fast enough that the narrow-plan design (decode
  * distributes with the scan) holds at corpus scale, and what is the
  * per-core image rate?
  *
  * Usage: DriveImageScale [threads] [nImages]
  */
object DriveImageScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"IMAGE_SCALE n=$n threads=$threads " +
      s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")

    // distributed render+encode: 10% of images are brightness twins of
    // id-7 (dHash-identical pairs for the near-dup join to find)
    val assets = spark.range(n).toDF("id").repartition(
        threads.toInt * 4)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val px0 = GenImageFixtures.renderBase(id % 50000)
          val px = if (id % 10 == 3 && id >= 7)
            GenImageFixtures.brighten(GenImageFixtures.renderBase((id - 7) % 50000), 6)
          else px0
          Row(id, "image", GenImageFixtures.pngBytes(px),
            Row(0L, "synth"))
        }
      }(org.apache.spark.sql.Encoders.row(MultiModal.assetSchema))
      .cache()
    assets.count() // materialize render+encode outside the timings
    println(s"IMAGE_CORPUS rows=$n")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"IMG_$name rows=$rows sec=$sec%.1f " +
        f"images_per_sec=${(n / sec).toLong}")
    }

    timed("FEATURES") {
      val df = MultiModal.imageFeatures(assets)
      df.select(count(lit(1)).as("n"),
        sum(hash(df.columns.map(col): _*).cast("long")).as("ck"))
        .head().getLong(0)
    }
    timed("NEAR_DUP_PAIRS") {
      MultiModal.imageNearDupPairs(assets, maxHamming = 6,
        maxBucketSize = 4096).count()
    }
    spark.stop()
  }
}
