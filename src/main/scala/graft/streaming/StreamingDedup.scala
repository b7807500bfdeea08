package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingestion-time form of
  * `DedupOps.exactDedup`: keep the first-arriving document per content
  * digest, maintaining the seen-digest set as streaming state across
  * micro-batches.
  *
  * The state key is `sha2(text, 256)` — 32 bytes per distinct document,
  * never the text itself — the same digest trick as the batch
  * `exactDedup(byDigest = true)` path, so a corpus-scale stream holds
  * gigabytes of state per billion distinct docs, not terabytes.
  *
  * Two variants:
  *  - `exactDedupStream`: unbounded state (every digest ever seen) — the
  *    semantics of global dedup; state grows with distinct docs.
  *  - `exactDedupStreamWithinWatermark`: bounds state with an event-time
  *    watermark (`dropDuplicatesWithinWatermark`) — duplicates are only
  *    suppressed while their digest is inside the watermark window, the
  *    standard trade at 100 TB/day ingest where exact global dedup moves
  *    to a periodic batch job and the stream handles the near-in-time
  *    duplicates (retries, double-sends).
  *
  * Batch equivalence: with arrival order = id order, the kept set equals
  * the batch operator's `doc_id == keep_id` winners (first arrival = min
  * id) — gated by `StreamingDedupSpec`.
  */
object StreamingDedup {

  def exactDedupStream(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__digest", sha2(col(textCol), 256))
      .dropDuplicates("__digest")
      .drop("__digest")

  def exactDedupStreamWithinWatermark(df: DataFrame, textCol: String,
      tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .withColumn("__digest", sha2(col(textCol), 256))
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming NEAR-dup gate against a persisted MinHash band index
    * (`ops.IncrementalDedup.writeIndex`): each arriving doc is shingled,
    * its band keys stream-static-joined against the index, and every
    * (new doc, corpus doc) bucket collision is emitted with the
    * signature-agreement estimate — `(new_id, dup_of, est_milli)` in
    * append mode. The corpus index is read-only here (file-sourced
    * static side, refreshed by restarting the query after a batch
    * `appendBatch`/`writeIndex` re-run); matches the batch
    * `matchBatch` output exactly on the same inputs
    * (`StreamingIncrementalDedupSpec`). State: the emitted-pair set
    * only (see `IncrementalDedup.matchBatch`).
    */
  def nearDupStream(df: DataFrame, idCol: String, textCol: String,
      indexPath: String): DataFrame =
    graft.ops.IncrementalDedup.matchBatch(df, idCol, textCol, indexPath)
}
