package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** `CacheScope.withCaches` releases every block a query persisted —
  * including `localCheckpoint` RDDs, which `catalog.clearCache()` misses.
  */
class CacheScopeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("caching registry queries leave no persisted blocks behind") {
    // the heaviest cache users in the registry: LSH signature caches,
    // the shingle-index cache, connected-components checkpoints, and the
    // multi-consumer curation pipeline caches
    val caching = Seq("dedup_minhash_lsh", "dedup_ngram_jaccard",
      "dedup_cluster_keep", "emb_near_dup_lsh", "pipeline_curate_full")
    for (name <- caching) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      graft.ops.CacheScope.withCaches(spark) {
        val n = graft.Queries.all(name)(spark, "/root/testdata/sf0.001")
          .count()
        // the ops really did persist something inside the scope — the
        // release assertion below must not pass vacuously
        assert(n >= 0)
        assert(spark.sparkContext.getPersistentRDDs.keySet.size
          > before.size, s"$name persisted nothing — vacuous test")
      }
      val after = spark.sparkContext.getPersistentRDDs.keySet
      assert(after == before,
        s"$name left persisted blocks: ${after.diff(before)}")
    }
  }

  test("failures still release; re-runs re-cache through a live entry") {
    val s = spark
    import s.implicits._
    // pre-existing manually-checkpointed frame survives the scope
    val outer = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    outer.count()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(before.nonEmpty)
    intercept[RuntimeException] {
      CacheScope.withCaches(spark) {
        val inner = Seq(4, 5).toDF("y").localCheckpoint(true)
        inner.count()
        throw new RuntimeException("boom")
      }
    }
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "failure path leaked the inner checkpoint or swept the outer one")
    // a localCheckpoint isn't a CacheManager entry: Dataset.unpersist is
    // a no-op on it — release through the bridge, as the CC loop does
    org.apache.spark.sql.graftbridge.GraftColumnBridge
      .unpersistLocalCheckpoint(outer)

    // the dead-entry hazard the CacheManager-level release exists for: a
    // cache()d plan re-run after a scope must RE-PERSIST (a raw
    // rdd.unpersist would leave a dead entry that re-runs latch onto
    // without ever re-caching)
    def cachedRun(): Unit = CacheScope.withCaches(spark) {
      val df = spark.range(1000).toDF("id").cache()
      df.count()
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        "cache() did not persist inside the scope — dead-entry regression")
    }
    cachedRun()
    cachedRun()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
