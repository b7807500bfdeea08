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
}
