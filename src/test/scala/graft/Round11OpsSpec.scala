package graft

import org.apache.spark.sql.functions._

/** Semantic specs for the round-11 changes: the native BigramCounts
  * expression (t16's narrow LM front end), p10's band saturation (the
  * bounded-by-construction guarantee for the offset-ladder cell table),
  * and the default-on window-top-k rewrite.
  */
class Round11OpsSpec extends SparkSpec {

  test("bigram_counts: matches the explode+groupBy reference on real docs") {
    import graft.functions.HashExpressions.bigramCounts
    val toks = expr("filter(split(text, ' '), x -> x != '')")
    val docs = Tables(spark, sfDir).documents
    val native = docs
      .select(col("doc_id"), explode(bigramCounts(toks)).as("p"))
      .select(col("doc_id"), col("p.bigram").as("bigram"), col("p.cnt").as("cnt"))
    val reference = docs
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))")).as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("cnt"))
    assert(native.exceptAll(reference).isEmpty && reference.exceptAll(native).isEmpty,
      "BigramCounts must agree with the higher-order formulation row-for-row")
  }

  test("bigram_counts: degenerate inputs — empty, single-token, repeated, null elements") {
    import spark.implicits._
    import graft.functions.HashExpressions.bigramCounts
    val df = Seq(
      (0L, Seq.empty[String]),
      (1L, Seq("only")),
      (2L, Seq("a", "b", "a", "b", "a")), // "a b" x2, "b a" x2
      (3L, Seq("x", "x", "x"))            // "x x" x2
    ).toDF("id", "toks")
      .select(col("id"), explode_outer(bigramCounts(col("toks"))).as("p"))
      .select(col("id"), col("p.bigram"), col("p.cnt"))
    val got = df.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), Option(r.get(2)))).toSet
    assert(got == Set(
      (0L, None, None), (1L, None, None),
      (2L, Some("a b"), Some(2L)), (2L, Some("b a"), Some(2L)),
      (3L, Some("x x"), Some(2L))))
    // null tokens are skipped: neither pair they touch is emitted
    val withNull = Seq((0L, Seq[String]("a", null, "b", "c"))).toDF("id", "toks")
      .select(explode(bigramCounts(col("toks"))).as("p"))
      .select(col("p.bigram")).as[String].collect().toSet
    assert(withNull == Set("b c"))
  }

  test("p10: bands saturate — a degenerate long-token corpus cannot grow the cell table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_p10band").toString
    // avg token length spread over decades: would be bands ~4, ~400, ~4000
    // unclamped; the clamp pins the top band at 400 so the offset ladder's
    // input stays <= (MaxBand+1) x shards rows for ANY data distribution
    val docs = Seq(
      (0L, "src_a", "a" * 1000 + " " + "b" * 1000),
      (1L, "src_a", ("w" * 100 + " ") * 20),
      (2L, "src_b", "x y z w v u t s r q")
    ).toDF("doc_id", "source", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.PipelineOps.p10_token_budget(spark, dir).collect()
    // flat reference with the SAME saturating band
    val ref = Seq(
      (0L, "src_a", 2L, 1000L * 2 * 1000L / 2),
      (1L, "src_a", 20L, (100L * 20) * 1000L / 20),
      (2L, "src_b", 10L, 10L * 1000L / 10)
    ).map { case (id, src, ntok, mlp) => (id, src, ntok, math.min(mlp / 250L, 400L)) }
    assert(ref.map(_._4).max == 400L, "test corpus must actually hit the clamp")
    val budget = ref.map(_._3).sum * 2 / 5 // 12 tokens
    // order: band desc, then shard/tick (sha) — bands here are distinct
    // enough that band alone decides: doc0+doc1 are band 400, doc2 band 4
    val n = out.map(r => r.getAs[Long]("n_docs")).sum
    assert(n == 3)
    val keptTokens = out.map(r => r.getAs[Long]("kept_tokens")).sum
    assert(keptTokens <= budget,
      s"kept tokens $keptTokens must fit the budget $budget")
    assert(out.forall(r => r.getAs[Long]("kept_permille") <= 1000L))
  }

  test("window top-k rewrite is DEFAULT-ON for graft sessions") {
    // SparkSpec's session comes from GraftSession — a user writing the
    // familiar row_number()<=k idiom (rank projected away) must get the
    // bounded-heap operator without opting in
    Tables(spark, sfDir).registerAll()
    val df = spark.sql(
      """SELECT l_orderkey, l_extendedprice FROM (
        |  SELECT l_orderkey, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_extendedprice DESC, l_orderkey) AS rn
        |  FROM lineitem) WHERE rn <= 3""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"),
      s"default session must plan the bounded heap:\n$plan")
  }
}
