package graft

import org.apache.spark.sql.functions._

/** Pins the identity of the driver-generated testdata at sf0.001 (the
  * SF every spec reads). Several driver entries carry INVARIANT oracles
  * whose literals assume exactly this data — s3/s6's recall contracts
  * (`recall_ok = TRUE`), q17b's HLL error bound, q63's reachable set —
  * so a regenerated testdata directory with a different seed must fail
  * HERE, loudly and attributably, not as a plausible-looking downstream
  * hash mismatch. Expected values are documented in TESTDATA.md
  * (§ fingerprint); all are integer-exact (counts, key sums, string
  * lengths — no float folds), so they are partitioning- and
  * engine-independent.
  */
class TestdataFingerprintSpec extends SparkSpec {

  private def fp(df: org.apache.spark.sql.DataFrame, keyExpr: String): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(expr(keyExpr)).cast("long")).collect().head
    (r.getLong(0), r.getLong(1))
  }

  test("sf0.001 tables match the pinned fingerprint") {
    val t = Tables(spark, sfDir)
    assert(fp(t.documents, "doc_id") == ((500L, 124750L)))
    assert(fp(t.embeddings, "vec_id") == ((500L, 124750L)))
    assert(fp(t.orders, "o_orderkey") == ((1500L, 1124250L)))
    assert(fp(t.lineitem, "l_orderkey * 10 + l_linenumber") == ((6000L, 44919507L)))
    assert(fp(t.events, "event_id") == ((1000L, 499500L)))
    // content-sensitive (not just shape): total text length and the
    // fixed embedding width
    assert(t.documents.agg(sum(length(col("text")))).collect().head.getLong(0) == 153156L)
    assert(t.embeddings.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(64))
  }
}
