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

  test("pre-existing caches survive a scope; failures still release") {
    val s = spark
    import s.implicits._
    val outer = Seq(1, 2, 3).toDF("x").cache()
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
      "failure path leaked the inner checkpoint or dropped the outer cache")
    outer.unpersist(true)
  }
}
