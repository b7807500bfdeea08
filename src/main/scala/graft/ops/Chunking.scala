package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document chunking: fixed-size sliding token windows — the
  * training-prep / retrieval primitive that turns a document table into
  * a chunk table (context windows, embedding inputs, packing units).
  *
  * Pure narrow transformation built entirely from codegen'd built-ins
  * (`split`/`filter`/`sequence`/`posexplode`/`slice`/`array_join`) — no
  * UDF, no shuffle, no state: at 100 TB this runs at scan speed and
  * parallelizes per input split with zero exchange; the output inherits
  * the input's partitioning. Chunk identity is the composite
  * (doc id, chunk_id) with chunk_id = window ordinal, so chunking is
  * deterministic and re-runnable shard by shard.
  */
object Chunking {

  /** One row per sliding window: `(idCol, chunk_id, tok_off, n_tok,
    * chunk_text)`. Windows start every `stride = chunkTokens -
    * overlapTokens` tokens (`tok_off` 0-based) and take up to
    * `chunkTokens` tokens; the final windows are partial by design (a
    * start is emitted for every `tok_off < n_tokens`). Tokens are
    * whitespace-split, consistent with every other text op here.
    * Zero-token docs produce no chunks.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = TextOps.tokens(col(textCol)) // codegen array_remove form
    df.select(col(idCol).cast(LongType).as(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("__pos", "__off")))
      .select(col(idCol),
        col("__pos").cast(LongType).as("chunk_id"),
        col("__off").cast(LongType).as("tok_off"),
        slice(col("__toks"), col("__off") + 1, lit(chunkTokens))
          .as("__ctoks"))
      .select(col(idCol), col("chunk_id"), col("tok_off"),
        size(col("__ctoks")).cast(LongType).as("n_tok"),
        array_join(col("__ctoks"), " ").as("chunk_text"))
  }
}
