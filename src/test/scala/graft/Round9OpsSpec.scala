package graft

import graft.ops.{Dedup, PipelineOps, Similarity}
import graft.queries.ModelQueries
import org.apache.spark.sql.functions._

/** Semantic contracts for the round-9 operators (d10/t27/s11/p3/a11)
  * beyond their DuckDB-oracle exactness: scale-independent properties a
  * one-SF hash compare cannot pin by itself.
  */
class Round9OpsSpec extends SparkSpec {

  private def writeEmbeddings(dir: String, rows: Seq[(Long, Seq[Float])]): Unit = {
    spark.createDataFrame(rows.map { case (id, v) => (id, v, 0) })
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def basis(i: Int, scale: Float = 1.0f): Seq[Float] =
    Seq.tabulate(64)(d => if (d == i) scale else 0.0f)

  test("d10: keep/drop partitions the corpus and the threshold separates") {
    val out = Dedup.d10_semdedup(spark, sfDir).collect()
    assert(out.length == Tables(spark, sfDir).embeddings.count())
    val (kept, dropped) = out.partition(_.getAs[Boolean]("keep"))
    assert(dropped.nonEmpty, "semdedup must drop something on the driver data")
    assert(kept.nonEmpty)
    assert(dropped.forall(_.getAs[Double]("max_prior_cosine") >= 0.35))
    assert(kept.forall(_.getAs[Double]("max_prior_cosine") < 0.35))
    // the first vector of every cell has no earlier cellmate -> sentinel, kept
    val firstPerCell = out.groupBy(_.getAs[Long]("cell"))
      .map { case (_, rs) => rs.minBy(_.getAs[Long]("vec_id")) }
    assert(firstPerCell.forall(r =>
      r.getAs[Double]("max_prior_cosine") == -2.0 && r.getAs[Boolean]("keep")))
  }

  test("d10: an exact duplicate vector is dropped, its earlier copy kept") {
    val dir = java.nio.file.Files.createTempDirectory("graft_d10_").toString
    writeEmbeddings(dir, Seq(
      1L -> basis(0), 2L -> basis(0, 3.0f), // same direction = cosine 1.0
      3L -> basis(1)))                      // orthogonal
    val out = Dedup.d10_semdedup(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(out(1L), "earlier copy must be kept")
    assert(!out(2L), "later duplicate direction must be dropped")
    assert(out(3L), "orthogonal vector must be kept")
  }

  test("t27: an edited eval copy is flagged, an unrelated train doc is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_t27_").toString
    val evalText = (1 to 30).map(i => s"w$i").mkString(" ")
    val edited = (1 to 30).map(i => if (i == 15) "EDIT" else s"w$i").mkString(" ")
    val unrelated = (100 to 130).map(i => s"z$i").mkString(" ")
    spark.createDataFrame(Seq((0L, edited), (1L, unrelated), (90L, evalText)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.t27_fuzzy_decontam(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("contaminated"), r.getAs[Double]("best_jaccard"))).toMap
    assert(rows(0L)._1 && rows(0L)._2 >= 0.5,
      s"one-token edit of an eval doc must flag: ${rows(0L)}")
    assert(!rows(1L)._1 && rows(1L)._2 == 0.0,
      s"unrelated doc must not flag: ${rows(1L)}")
  }

  test("t27: exact cross-split duplicates on the driver data are caught") {
    val out = Dedup.t27_fuzzy_decontam(spark, sfDir).collect()
    val flagged = out.filter(_.getAs[Boolean]("contaminated"))
    assert(flagged.nonEmpty, "driver corpus plants cross-split exact dups")
    assert(flagged.forall(_.getAs[Double]("best_jaccard") >= 0.5))
  }

  test("s11: step 1 is the pure-relevance top-1; selections never repeat") {
    val out = Similarity.s11_mmr(spark, sfDir).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    val top1 = Similarity.s1_ann_topk(spark, sfDir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    for ((q, rows) <- byQuery) {
      val steps = rows.sortBy(_.getAs[Long]("step"))
      assert(steps.map(_.getAs[Long]("step")).toSeq == (1L to 5L),
        s"query $q must emit steps 1..5")
      val cands = steps.map(_.getAs[Long]("cand_id"))
      assert(cands.distinct.length == cands.length, s"query $q repeats a pick")
      assert(cands.head == top1(q),
        s"query $q step 1 must equal the relevance top-1")
    }
  }

  test("s11: diversity beats a marginally-more-relevant near-duplicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_s11_").toString
    def mix(c0: Double, i: Int): Seq[Float] = {
      val s = math.sqrt(1 - c0 * c0).toFloat
      Seq.tabulate(64)(d => if (d == 0) c0.toFloat else if (d == i) s else 0f)
    }
    // query 0 = e1; A (id 10) rel .95 in plane (e1,e2); A' (id 11) rel .94
    // in the SAME plane (sim(A,A') ~ .9998); B (id 12) rel .93 in plane
    // (e1,e5) (sim(A,B) ~ .88). Pure relevance ranks A, A', B; MMR must
    // pick A, then B (diverse), then A'. Vectors 1..9 are far-off
    // queries/candidates in their own axes.
    val rows = Seq(0L -> basis(0), 10L -> mix(0.95, 1),
      11L -> mix(0.94, 1), 12L -> mix(0.93, 4)) ++
      (1L to 9L).map(i => i -> basis(10 + i.toInt))
    writeEmbeddings(dir, rows)
    val q0 = Similarity.s11_mmr(spark, dir)
      .filter(col("query_id") === 0).orderBy("step").collect()
      .map(_.getAs[Long]("cand_id")).toSeq
    assert(q0.take(3) == Seq(10L, 12L, 11L),
      s"MMR order must be A, B(diverse), A': got $q0")
  }

  test("p3: temperature flattens the mix and respects the token budget") {
    val out = PipelineOps.p3_temperature_mix(spark, sfDir).collect()
    assert(out.length > 1)
    val budget = out.map(_.getAs[Long]("n_tokens")).sum
    assert(out.map(_.getAs[Long]("target_tokens")).sum <= budget,
      "integer plan must never overshoot the budget")
    def spread(c: String) =
      out.map(_.getAs[Long](c)).max - out.map(_.getAs[Long](c)).min
    assert(spread("target_pm") < spread("natural_pm"),
      "alpha=1/2 must compress the share spread")
    val smallest = out.minBy(_.getAs[Long]("n_tokens"))
    val largest = out.maxBy(_.getAs[Long]("n_tokens"))
    assert(smallest.getAs[Long]("epochs_bp") > largest.getAs[Long]("epochs_bp"),
      "low-resource sources must be upweighted relative to high-resource ones")
  }

  test("d11: a planted 20-token shared span is recovered exactly; unrelated docs stay unpaired") {
    val dir = java.nio.file.Files.createTempDirectory("graft_d11_").toString
    val span = (1 to 20).map(i => s"s$i").mkString(" ")
    val a = s"aleft1 aleft2 aleft3 $span aright1 aright2"
    val b = s"bpre1 bpre2 bpre3 bpre4 bpre5 $span btail1"
    val c = (1 to 40).map(i => s"c$i").mkString(" ")
    spark.createDataFrame(Seq((1L, a), (2L, b), (3L, c)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.d11_span_dedup(spark, dir).collect()
    assert(out.length == 1, s"exactly the (1,2) pair: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("longest_span") == 20L,
      s"span length must be exact: $r")
    // 20 tokens = 16 five-grams, all on one diagonal
    assert(r.getAs[Long]("n_shared_grams") == 16L)
  }

  test("d11: driver-corpus pairs all clear the span threshold and are ordered pairs") {
    val out = Dedup.d11_span_dedup(spark, sfDir).collect()
    assert(out.nonEmpty, "driver corpus plants near-dup docs sharing long spans")
    assert(out.forall(r => r.getAs[Long]("longest_span") >= 12))
    assert(out.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(out.forall(r =>
      r.getAs[Long]("n_shared_grams") >= r.getAs[Long]("longest_span") - 4))
  }

  test("s12: the radius set is exactly the tau-superlevel set of the exact scan") {
    val out = Similarity.s12_range_search(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("cosine") >= 0.25))
    // s1's exact top-5 rows at/above tau must all be members
    val members = out.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val top = Similarity.s1_ann_topk(spark, sfDir).collect()
      .filter(_.getAs[Double]("cosine") >= 0.25)
    assert(top.nonEmpty, "fixture queries have neighbors above tau")
    assert(top.forall(r => members(
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))),
      "range search must contain every exact top-k row above tau")
  }

  test("s12: threshold separates on a constructed neighborhood") {
    val dir = java.nio.file.Files.createTempDirectory("graft_s12_").toString
    def mix(c0: Double, i: Int): Seq[Float] = {
      val s = math.sqrt(1 - c0 * c0).toFloat
      Seq.tabulate(64)(d => if (d == 0) c0.toFloat else if (d == i) s else 0f)
    }
    writeEmbeddings(dir, Seq(0L -> basis(0),
      10L -> mix(0.30, 1), 11L -> mix(0.20, 2), 12L -> mix(0.25, 3)))
    val got = Similarity.s12_range_search(spark, dir)
      .filter(col("query_id") === 0).collect()
      .map(_.getAs[Long]("neighbor_id")).toSet
    assert(got == Set(10L, 12L), s"cos .30/.25 in, .20 out: got $got")
  }

  test("g5: labels form a partition of the nations and propagation coarsens it") {
    val out = graft.ops.GraphOps.g5_communities(spark, sfDir).collect()
    val nations = out.map(_.getAs[Long]("nation")).toSeq
    assert(nations == nations.sorted && nations.length == 25)
    val comms = out.map(_.getAs[Long]("community")).toSet
    assert(comms.subsetOf(nations.toSet), "labels are nation ids")
    assert(comms.size < 25, "heavy-lane trade graph must merge some blocs")
    // deterministic: a second run yields identical labels
    val again = graft.ops.GraphOps.g5_communities(spark, sfDir).collect()
      .map(r => r.getAs[Long]("nation") -> r.getAs[Long]("community")).toMap
    assert(out.forall(r =>
      again(r.getAs[Long]("nation")) == r.getAs[Long]("community")))
  }

  test("p4: phase budgets are conserved and the anneal phase upweights clean sources") {
    val out = PipelineOps.p4_anneal_mix(spark, sfDir).collect()
    assert(out.length > 1)
    val tot = out.map(_.getAs[Long]("n_tokens")).sum
    assert(out.map(_.getAs[Long]("pretrain_tokens")).sum <= tot * 9 / 10)
    assert(out.map(_.getAs[Long]("anneal_tokens")).sum <= tot / 10)
    assert(out.forall(r =>
      r.getAs[Long]("n_hq_tokens") <= r.getAs[Long]("n_tokens")))
    // anneal shares follow hq mass: a source with zero clean tokens gets zero
    out.filter(_.getAs[Long]("n_hq_tokens") == 0).foreach { r =>
      assert(r.getAs[Long]("anneal_tokens") == 0 &&
        r.getAs[Long]("anneal_epochs_bp") == 0)
    }
    // epoch bookkeeping: bp > 10000 exactly when the clean slice repeats
    out.filter(_.getAs[Long]("n_hq_tokens") > 0).foreach { r =>
      val repeats = r.getAs[Long]("anneal_tokens") > r.getAs[Long]("n_hq_tokens")
      assert((r.getAs[Long]("anneal_epochs_bp") > 10000) == repeats, s"$r")
    }
  }

  test("a11: the agreeing unit test passes, the seeded defect fails with a 1/1 diff") {
    val out = ModelQueries.a11_unit_tests(spark, sfDir).collect()
      .map(r => r.getAs[String]("test") -> r).toMap
    val ok = out("accepts_status_rollup")
    assert(ok.getAs[Boolean]("passed") &&
      ok.getAs[Long]("n_missing") == 0 && ok.getAs[Long]("n_unexpected") == 0)
    val bad = out("rejects_seeded_defect")
    assert(!bad.getAs[Boolean]("passed"))
    assert(bad.getAs[Long]("n_missing") == 1 && bad.getAs[Long]("n_unexpected") == 1,
      s"the off-by-one defect is exactly one row each way: $bad")
    assert(bad.getAs[Long]("n_expected") == bad.getAs[Long]("n_actual"))
  }
}
