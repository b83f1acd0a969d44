package graft

import org.apache.spark.sql.functions._

/** The cache-ownership contract (Caching.scala): operators persist
  * intermediates through Caching.persist; a caller that opts into
  * `Caching.scoped { ... }` gets every one of those frames unpersisted
  * at scope exit, so composing operators in a long-lived session does
  * not silently accumulate cached frames.
  */
class CachingSpec extends SparkSpec {

  private def cachedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("scoped: operator intermediates are unpersisted at scope exit") {
    spark.catalog.clearCache()
    val before = cachedCount
    val (rows, during) = Caching.scoped {
      // d2 persists its signature/bucket intermediates via persistTracked
      val n = graft.ops.Dedup.d2_dedup_minhash(spark, sfDir).count()
      (n, cachedCount)
    }
    assert(rows > 0)
    assert(during > before, "operator should have persisted intermediates inside the scope")
    // unpersist(blocking=false) is async at the block level but removes
    // the RDD from the persistent registry synchronously
    assert(cachedCount == before,
      s"scope exit must unpersist operator intermediates ($cachedCount cached, expected $before)")
  }

  test("scoped: unpersists on failure, and scopes nest") {
    spark.catalog.clearCache()
    intercept[RuntimeException] {
      Caching.scoped {
        Caching.persist(graft.Tables(spark, sfDir).nation).count()
        throw new RuntimeException("boom")
      }
    }
    assert(cachedCount == 0, "failure path must still unpersist")

    Caching.scoped {
      val outer = Caching.persist(graft.Tables(spark, sfDir).region)
      outer.count()
      Caching.scoped {
        Caching.persist(graft.Tables(spark, sfDir).nation).count()
        assert(cachedCount == 2)
      }
      assert(cachedCount == 1, "inner scope exit must drop only its own frames")
    }
    assert(cachedCount == 0)
  }

  test("no scope: caller owns the cache (frames stay warm until clearCache)") {
    spark.catalog.clearCache()
    Caching.persist(graft.Tables(spark, sfDir).nation.filter(col("n_nationkey") >= 0)).count()
    assert(cachedCount == 1, "without a scope, persist must not be auto-dropped")
    spark.catalog.clearCache()
    assert(cachedCount == 0)
  }
}
