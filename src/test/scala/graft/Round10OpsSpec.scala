package graft

import graft.ops.PipelineOps
import org.apache.spark.sql.functions._

/** Semantic specs for the round-10 additions: p10_token_budget (budget
  * prefix under the banded total order, two-phase distributed prefix
  * sum) and t32_domain_cap (per-source K cap on the native bounded
  * heap).
  */
class Round10OpsSpec extends SparkSpec {

  test("p10: the kept set is exactly the maximal budget prefix of the defined total order") {
    import spark.implicits._
    // recompute the expected report IN MEMORY from the raw corpus with a
    // flat single-threaded prefix sum — the strongest possible check of
    // the distributed two-phase decomposition
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        expr("CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)").as("ntok"),
        expr("aggregate(filter(split(text, ' '), x -> x != ''), 0L, (a, x) -> a + length(x))").as("nchar"),
        pmod(graft.functions.HashExpressions.sha256PrefixLong(
          col("doc_id").cast("string"), 15), lit(32L)).as("shard"),
        graft.functions.HashExpressions.sha256PrefixLong(
          concat(lit("budget"), col("doc_id").cast("string")), 12).as("tick"))
      .as[(Long, String, Long, Long, Long, Long)].collect()
    val budget = docs.map(_._3).sum * 2 / 5
    val ordered = docs.map { case (id, src, ntok, nchar, shard, tick) =>
      val band = math.min((if (ntok == 0) 0L else nchar * 1000L / ntok) / 250L, 400L)
      (id, src, ntok, band, shard, tick)
    }.sortBy { case (id, _, _, band, shard, tick) => (-band, shard, tick, id) }
    var cum = 0L
    val expected = ordered.map { case (id, src, ntok, _, _, _) =>
      cum += ntok
      (id, src, ntok, cum <= budget)
    }
    val expBySource = expected.groupBy(_._2).map { case (src, rows) =>
      src -> (rows.length.toLong, rows.map(_._3).sum,
        rows.count(_._4).toLong, rows.filter(_._4).map(_._3).sum,
        rows.filter(_._4).map(_._1).sum)
    }
    val got = PipelineOps.p10_token_budget(spark, sfDir).collect()
    assert(got.map(_.getAs[String]("source")).toSet == expBySource.keySet)
    got.foreach { r =>
      val (nDocs, nTokens, nKept, keptTokens, keptIdSum) =
        expBySource(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == nDocs, s"n_docs $r")
      assert(r.getAs[Long]("n_tokens") == nTokens, s"n_tokens $r")
      assert(r.getAs[Long]("n_kept") == nKept, s"n_kept $r")
      assert(r.getAs[Long]("kept_tokens") == keptTokens, s"kept_tokens $r")
      assert(r.getAs[Long]("kept_id_sum") == keptIdSum, s"kept_id_sum $r")
    }
    // global budget invariant + maximality (the next doc would overflow)
    val keptTotal = got.map(_.getAs[Long]("kept_tokens")).sum
    assert(keptTotal <= budget)
    val firstDropped = expected.find(!_._4)
    firstDropped.foreach { case (_, _, ntok, _) =>
      assert(keptTotal + ntok > budget, "prefix must be maximal")
    }
  }

  test("t32: every source keeps exactly min(n_docs, 25) by sha-ticket priority") {
    import org.apache.spark.sql.expressions.Window
    val got = PipelineOps.t32_domain_cap(spark, sfDir).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("n_kept") == math.min(r.getAs[Long]("n_docs"), 25L), s"$r")
      assert(r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_kept"), s"$r")
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens"), s"$r")
    }
    // the bounded heap picks the same K rows as the window formulation
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        expr("CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)").as("ntok"))
      .withColumn("tick", graft.functions.HashExpressions.sha256PrefixLong(
        concat(lit("cap"), col("doc_id").cast("string")), 12))
    val viaWindow = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("tick").asc, col("doc_id").asc)))
      .filter(col("rn") <= 25)
      .groupBy("source").agg(sum("doc_id").cast("long").as("kept_id_sum"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("kept_id_sum")).toMap
    got.foreach { r =>
      assert(r.getAs[Long]("kept_id_sum") == viaWindow(r.getAs[String]("source")),
        s"heap/window disagree: $r")
    }
  }

  test("t32: results are identical across two independent runs (determinism)") {
    val a = PipelineOps.t32_domain_cap(spark, sfDir).collect().map(_.toString).toSeq
    val b = PipelineOps.t32_domain_cap(spark, sfDir).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
