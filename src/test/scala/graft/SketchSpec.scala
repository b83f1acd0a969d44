package graft

import org.apache.spark.sql.functions._

/** Probabilistic-sketch surface (SURVEY §2 misc): Spark's built-in
  * distributed sketches — each is built with one pass + mergeable partial
  * states, the only shapes that work at 100 TB (bloom filter for join
  * pruning / membership, count-min for heavy-hitter frequency, HLL via
  * approx_count_distinct in q17b).
  */
class SketchSpec extends SparkSpec {

  test("bloom filter over join keys: no false negatives, bounded false positives") {
    val li = Tables(spark, sfDir).lineitem
    val bf = li.stat.bloomFilter("l_orderkey", expectedNumItems = 10000, fpp = 0.01)
    val keys = li.select("l_orderkey").distinct().collect().map(_.getLong(0))
    assert(keys.forall(bf.mightContain), "bloom filters never false-negative")
    // keys far outside the domain: false-positive rate must stay near fpp
    val fps = (1000000L until 1010000L).count(bf.mightContain)
    assert(fps < 500, s"false-positive rate blew past fpp: $fps/10000")
  }

  test("count-min sketch estimates heavy-hitter frequencies within epsilon") {
    val li = Tables(spark, sfDir).lineitem
    val cms = li.stat.countMinSketch("l_returnflag", eps = 0.001, confidence = 0.99, seed = 42)
    val exact = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n && est <= n + (0.001 * li.count()).toLong + 1,
        s"count-min estimate $est out of band for $k (exact $n)")
    }
  }
}
