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
  * result inside the block, and every block persisted *during* the block
  * — `cache()`d datasets AND `localCheckpoint` RDDs, which
  * `spark.catalog.clearCache()` does NOT touch — is released on exit,
  * success or failure. Blocks persisted before entry are left alone, so
  * scopes nest and long-lived session caches survive.
  *
  * {{{
  * val pairs = CacheScope.withCaches(spark) {
  *   DedupOps.minHashLshPairs(docs, "doc_id", "text").collect()
  * }
  * }}}
  */
object CacheScope {
  /** Release is block-level (`RDD.unpersist`): the executor/driver memory
    * is freed synchronously. A `cache()`d plan keeps its CacheManager
    * *metadata* entry, so re-running the same query lazily rebuilds its
    * cache (inside that run's own scope — the rebuilt blocks are released
    * again at its exit); metadata is a few plan trees, not storage.
    */
  def withCaches[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try body
    finally {
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = true)
      }
    }
  }
}
