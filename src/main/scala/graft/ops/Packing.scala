package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Context packing / shard assignment — the last step of a training-data
  * pipeline before the tokenizer: lay documents end-to-end in a stable
  * order and cut the stream into fixed token-budget shards (training
  * contexts / batch files). Every document gets a deterministic
  * (shard, offset) address, so downstream loaders can fetch any shard
  * without replaying the pipeline.
  *
  * Semantics: within each stratum, documents are concatenated in id
  * order; a document's shard is `floor(start_offset / budget)` — the
  * "concatenate then chunk" rule (a doc whose tokens straddle a budget
  * boundary belongs to the shard where it STARTS; loaders that must not
  * split docs treat the tail as the overflow into the next context,
  * exactly how GPT-style packing handles boundary docs).
  *
  * Scale: the running sum is a window partitioned by the stratum
  * columns, so each stratum packs independently — one shuffle on the
  * stratum key, then a single ordered pass per stratum. Real corpora
  * stratify by (source, language, dump-date, ...), giving thousands of
  * independent strata; packing is embarrassingly parallel across them.
  * An UNSTRATIFIED call would funnel the corpus into one task (Spark's
  * empty-partition window) — `packByBudget` requires at least one
  * stratum column; `packGlobalByBudget` handles the global case with a
  * distributed prefix-sum instead, same result as the naive window.
  */
object Packing {

  /** Per-document shard assignment. Output: the stratum columns, the id,
    * `n_tok` (whitespace tokens), `start_off` (tokens before this doc in
    * its stratum stream) and `shard_id` (budget-sized chunk index within
    * the stratum).
    */
  def packByBudget(df: DataFrame, idCol: String, textCol: String,
      strataCols: Seq[String], budgetTokens: Long): DataFrame = {
    require(strataCols.nonEmpty,
      "packByBudget needs >= 1 stratum column: an unstratified running " +
        "sum is a single-task window (see scaladoc); stratify or " +
        "pre-chunk the corpus")
    val nTok = size(TextOps.tokens(col(textCol))).cast(LongType)
    // null id/text rows drop, matching packGlobalByBudget and the SQL
    // oracles (a null doc has no place in a token stream)
    packByWeight(
      df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
        .select(strataCols.map(col) :+ col(idCol) :+ nTok.as("n_tok"): _*),
      idCol, "n_tok", strataCols, budgetTokens)
  }

  /** The packing core on an ARBITRARY precomputed weight column —
    * whitespace tokens (`packByBudget`), trained-BPE token counts
    * (`pipeline_dsir_pack`), byte sizes, anything additive. Same
    * stratum-partitioned running-sum window, same concatenate-then-
    * chunk shard rule.
    */
  def packByWeight(df: DataFrame, idCol: String, weightCol: String,
      strataCols: Seq[String], budget: Long): DataFrame = {
    require(strataCols.nonEmpty,
      "packByWeight needs >= 1 stratum column (see packByBudget)")
    require(budget > 0, s"budget $budget")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(idCol).isNotNull)
      .withColumn("start_off",
        sum(col(weightCol)).over(w) - col(weightCol))
      // integral division (exact at any magnitude, same as the global
      // variant's `start / budget` and DuckDB's `//`)
      .withColumn("shard_id", expr(s"start_off DIV $budget").cast(LongType))
  }

  /** GLOBAL packing without the single-task window: the classic
    * distributed prefix-sum. Documents are range-partitioned and sorted
    * by id, pass 1 collects one token-sum per partition (bounded: one
    * long per partition, never data-sized), and pass 2 adds the
    * broadcast partition-prefix to each doc's local running sum. The
    * result is bit-identical to the naive global running-sum window —
    * a doc's `start_off` is a pure function of the data, independent of
    * partition boundaries — so the same DuckDB window oracle applies,
    * but every stage runs wide: the only driver traffic is the
    * per-partition sum array.
    *
    * The range exchange is recomputed by both passes unless persisted —
    * boundaries are deterministic either way (RangePartitioner's sample
    * is seeded per partition), but the intermediate is cached so the
    * corpus is scanned once; caller releases via `CacheScope` like the
    * other multi-consumer ops.
    */
  def packGlobalByBudget(df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget $budgetTokens")
    // Cache the NARROW (id, n_tok) projection BEFORE the range exchange:
    // RangePartitioner first runs a boundary-SAMPLING job over its child,
    // so an uncached child executes the whole upstream pipeline one extra
    // time (measured round 18: the sample pass re-ran the dedup+chunk
    // chain of pipeline_ingest_day). Two longs per doc — the §8
    // "decide with small rows" metadata frame, bounded at any corpus
    // size; released by the caller via CacheScope like the range cache.
    val meta = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast(LongType).as(idCol),
        size(TextOps.tokens(col(textCol))).cast(LongType).as("n_tok"))
      .cache()
    val counted = meta
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .cache()
    // pass 1: one (partition, tokenSum) row per partition
    val partSums = counted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(1))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val prefixes = partSums.scanLeft(0L)(_ + _) // prefixes(p) = tokens before partition p
    val bc = counted.sparkSession.sparkContext.broadcast(prefixes)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_tok", LongType, nullable = false),
      StructField("start_off", LongType, nullable = false),
      StructField("shard_id", LongType, nullable = false)))
    // pass 2: local running sum + the partition's global prefix
    val packedRdd = counted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var off = bc.value(pid)
      it.map { r =>
        val n = r.getLong(1)
        val start = off
        off += n
        Row(r.getLong(0), n, start, start / budgetTokens)
      }
    }
    counted.sparkSession.createDataFrame(packedRdd, outSchema)
  }

  /** Seeded deterministic shuffle/interleave of a packing — the
    * "shuffle the shards" step every pretraining pipeline runs between
    * shard assignment and the training loader. Two permutation keys,
    * both pure functions of (seed, data) via the engine-portable
    * polynomial hash, so the order is reproducible across runs, engines
    * and partitionings and re-seedable per epoch:
    *
    *  - `shard_key`: hash(seed : strata : shard_id) — the order in which
    *    the loader visits shards (the global interleave);
    *  - `shuffled_pos`: the doc's rank within its shard under
    *    hash(seed : doc_id) order (id tie-break) — the within-shard
    *    shuffle.
    *
    * Reading shards by `shard_key` and docs by `shuffled_pos` yields the
    * full deterministic shuffled stream. Scale: the ranking window is
    * partitioned by (strata, shard) — thousands of independent
    * shard-sized tasks, no global sort, no single-task window; the
    * global visit order is carried by the key column, not by an
    * exchange.
    */
  def packShuffled(df: DataFrame, idCol: String, textCol: String,
      strataCols: Seq[String], budgetTokens: Long, seed: Long): DataFrame = {
    // null stratum values are excluded: the engine's concat_ws would skip
    // a NULL component (keying the row as if the stratum didn't exist and
    // aliasing it with other strata) while a SQL mirror's `||`
    // null-propagates — engine-portability demands one pinned behavior,
    // and "a null stratum has no place in a keyed interleave" follows the
    // null-id convention of the other ops
    val nonNull = strataCols.foldLeft(df)((d, c) => d.filter(col(c).isNotNull))
    val packed = packByBudget(nonNull, idCol, textCol, strataCols,
      budgetTokens)
    // the single-base polynomial is AFFINE in a prefix: for same-length
    // ids, changing the seed shifts every key by the same constant mod p
    // and the order never moves. The two-base product (same mix as the
    // KMV sketch hash) makes the seed enter the coefficients of a
    // quadratic form — orderings genuinely re-randomize per seed.
    def mixed(s: org.apache.spark.sql.Column) =
      (graft.functions.PolyHash.polyHash(s, 131L) *
        graft.functions.PolyHash.polyHash(s, 257L)) % 1000000007L
    val docKey = mixed(
      concat_ws(":", lit(seed.toString), col(idCol).cast(StringType)))
    val shardKey = mixed(
      concat_ws(":", lit(seed.toString) +:
        strataCols.map(c => col(c).cast(StringType)) :+
        col("shard_id").cast(StringType): _*))
    val w = Window
      .partitionBy((strataCols :+ "shard_id").map(col): _*)
      .orderBy(docKey, col(idCol))
    packed
      .withColumn("shard_key", shardKey)
      .withColumn("shuffled_pos", row_number().over(w).cast(LongType))
  }

  /** Shard-level summary of a packing: docs and tokens per shard, plus
    * `overflow = max(0, stream end − shard budget boundary)` — the
    * boundary doc's spill past the shard, i.e. the padding-vs-truncation
    * cost the loader pays.
    */
  def shardStats(packed: DataFrame, strataCols: Seq[String],
      budgetTokens: Long): DataFrame =
    packed.groupBy((strataCols :+ "shard_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok"),
        max(col("start_off") + col("n_tok")).as("__end"))
      .withColumn("overflow",
        greatest(lit(0L),
          col("__end") - (col("shard_id") + 1L) * budgetTokens))
      .drop("__end")
}
