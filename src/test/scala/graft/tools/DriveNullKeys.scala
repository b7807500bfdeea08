package graft.tools

import org.apache.spark.sql.SparkSession
import graft.cep._

/** Null-key events must be dropped, not collapsed onto key 0. */
object DriveNullKeys {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(
      (Some(0L), 1L, "a"), (None: Option[Long], 2L, "b"),
      (Some(0L), 3L, "b"), (None: Option[Long], 4L, "a"))
      .toDF("user_id", "event_id", "event_type")
    val q = CepQuery(
      Pattern.Combine(Contiguity.Strict, Pattern.spat("x", "a", "True"),
        Pattern.spat("y", "b", "True")),
      Vector("a" -> Vector("event_id"), "b" -> Vector("event_id")))
    val spec = SparkCep.CepSpec(Some("user_id"), "event_id", "event_type",
      Seq())
    val rows = SparkCep.matchPattern(df, q, spec).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    // key 0's real sequence is events 1 (a), 3 (b) — NOT consecutive, so
    // with null rows correctly dropped there is exactly one strict pair
    // only if 1 and 3 become adjacent after the drop... they do (event 2
    // belonged to the null key). The null key's own events 2,4 must never
    // pair with anything.
    println("NULLKEY_ROWS=" + rows.mkString(" | "))
    spark.stop()
  }
}
