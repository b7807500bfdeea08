package graft.ops

import org.apache.spark.sql.SparkSession

/** Scoped release for op-level caches.
  *
  * Several ops persist intermediates for their own multi-consumer plans
  * (`DedupOps.shingleIndex`, `minHashLshPairs`, `Similarity
  * .lshNearNeighbors`, the connected-components checkpoints): the blocks
  * must outlive plan construction because the returned frame is lazy, so
  * the ops cannot unpersist them themselves. `withCaches` makes the
  * caller's obligation structural instead of documentary: materialize the
  * result inside the block, and on exit (success or failure) every
  * Dataset cache is dropped through the CacheManager AND every
  * `localCheckpoint` RDD persisted during the block (which
  * `catalog.clearCache()` does not touch) is swept.
  *
  * This is a HARNESS-BOUNDARY scope, not a nesting-preserving one:
  * releasing a `cache()`d plan must go through the CacheManager so the
  * entry and its buffers go together — unpersisting the underlying RDD
  * alone leaves a dead entry that later identical plans latch onto and
  * recompute through on every consumer (measured: a post-release re-run
  * re-persists nothing and pays recompute amplification). The
  * CacheManager has no public per-entry enumeration, so the scope clears
  * ALL Dataset caches at exit — including ones created before entry.
  * Manually persisted RDDs and pre-existing `localCheckpoint`s survive.
  *
  * {{{
  * val pairs = CacheScope.withCaches(spark) {
  *   DedupOps.minHashLshPairs(docs, "doc_id", "text").collect()
  * }
  * }}}
  */
object CacheScope {
  def withCaches[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try body
    finally {
      // Dataset caches: entry + buffers together, via the CacheManager
      spark.catalog.clearCache()
      // localCheckpoint blocks are plain persisted RDDs, not CacheManager
      // entries — sweep the ones this scope created
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = true)
      }
    }
  }
}

/** Explicit per-op cache lease, for long-lived drivers that cannot use
  * the harness-boundary `CacheScope.withCaches` (which clears ALL
  * Dataset caches in the session — too blunt for a shared driver
  * matching daily batches next to unrelated cached work). Ops that
  * persist plan-level intermediates accept an optional lease and
  * register exactly those frames on it; `close()` (or use in a
  * try-with-resources / `Using`) unpersists exactly them once the
  * returned frame has been consumed.
  */
final class CacheLease extends AutoCloseable {
  private val frames =
    scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
  private[graft] def track(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = synchronized { frames += df; df }
  override def close(): Unit = synchronized {
    frames.foreach(_.unpersist())
    frames.clear()
  }
}
