package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations for Structured Streaming — the §2.2
  * "watermarks / event-time windows / session windows" extension row
  * (absent in the reference, which is processing-time only: SURVEY.md
  * §1.1). Built entirely on Spark's native windowing so state eviction,
  * late-data handling, and incremental aggregation come from the engine:
  *
  *  - `sessionStats`: gap-based session windows per key (the streaming
  *    form of the batch `rel_session_stats` oracle query);
  *  - `tumblingCounts`: fixed-width event-time windows per key.
  *
  * Both run identically in batch mode (session_window/window work on
  * static frames), which is how the semantics are unit-tested; in
  * streaming mode the watermark bounds state: sessions close and emit
  * once the watermark passes their end.
  */
object StreamingSessions {

  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      gap: String = "4 hours", watermark: String = "1 hour"): DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    wm.groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
  }

  def tumblingCounts(df: DataFrame, keyCol: String, tsCol: String,
      width: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    wm.groupBy(col(keyCol), window(col(tsCol), width).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("w.start").as("window_start"), col("n_events"))
  }

  /** Event-time windowed QUANTILE SKETCH: the log-bucket histogram
    * (`ops.Quantiles`) per tumbling window — per-window latency/size
    * percentiles on an unbounded stream, which the exact forms cannot
    * do at all (a percentile needs the window's whole value set; the
    * sketch's per-window state is ≤ ~2k counters, evicted by the
    * watermark once the window closes). Cells emit on window close
    * (append mode); quantiles read off them with `Quantiles.rankPick`
    * exactly as in batch — `StreamingSketchSpec` pins batch ==
    * stream per window.
    */
  def windowedQuantileSketch(df: DataFrame, tsCol: String,
      valueCol: String, width: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    val v = col(valueCol).cast("long")
    wm.filter(v.isNotNull && v >= 0L)
      .select(col(tsCol), graft.ops.Quantiles.bucketCol(valueCol).as("qb"))
      .groupBy(window(col(tsCol), width).as("w"), col("qb"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("qb"), col("cnt"))
  }
}
