package graft

import graft.ops.{PipelineOps, Similarity}
import org.apache.spark.sql.functions._

/** Semantic contracts for the round-8 corpus operators (s8/t20/t21/t22)
  * beyond their DuckDB-oracle exactness: the properties that must hold
  * at ANY scale and that a hash compare on one SF cannot pin by itself.
  */
class CorpusOpsSpec extends SparkSpec {

  test("s8: BM25 ranks a rare-term doc above a common-term doc, idf drives it") {
    // synthetic corpus written to parquet so the entry runs end-to-end:
    // doc 0 is the query ("rareterm commonterm"); doc 10 carries the rare
    // term (df=2: query+itself), docs 11..29 all carry the common term
    val dir = java.nio.file.Files.createTempDirectory("graft_s8_").toString
    val rows = Seq((0L, "rareterm commonterm")) ++
      Seq((10L, "rareterm filler words here")) ++
      (11L to 29L).map(i => (i, "commonterm filler words here"))
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings table unused by s8 but Tables reads lazily — not needed
    val out = Similarity.s8_bm25(spark, dir)
      .filter(col("query_id") === 0).collect()
    assert(out.nonEmpty)
    val best = out.minBy(_.getAs[Long]("rank"))
    assert(best.getAs[Long]("doc_id") == 10L,
      s"rare-term doc must outrank the 19 common-term docs: ${out.toSeq}")
    // every common-term doc scores identically (same tf/dl/df) — ties
    // break by doc_id so ranks 2..10 are 11..19 in order
    val tail = out.filter(_.getAs[Long]("rank") > 1).sortBy(_.getAs[Long]("rank"))
    assert(tail.map(_.getAs[Long]("doc_id")).toSeq == (11L to 19L).toSeq)
  }

  test("t20: chunks cover every token, overlap by CHUNK-STRIDE, ids stable") {
    val chunks = PipelineOps.t20_chunk(spark, sfDir)
      .select("doc_id", "chunk_idx", "start_tok", "n_tokens").collect()
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    for ((_, cs) <- byDoc) {
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      // starts advance by exactly the stride
      assert(sorted.zipWithIndex.forall { case (r, i) =>
        r.getAs[Long]("start_tok") == i * 48L + 1 })
      // all chunks but the last are full; coverage: last chunk reaches
      // the end (start + len - 1 >= doc token count follows from the
      // ceil-count arithmetic, proven by the full chunks before it)
      assert(sorted.dropRight(1).forall(_.getAs[Long]("n_tokens") == 64L))
      val last = sorted.last
      assert(last.getAs[Long]("n_tokens") >= 1L || sorted.length == 1)
    }
    // re-running produces the identical chunk set (stable ids)
    val again = PipelineOps.t20_chunk(spark, sfDir)
      .select("doc_id", "chunk_idx", "start_tok", "n_tokens").collect()
    assert(chunks.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("t21: score is content-determined and the keep cut is non-trivial") {
    val scores = PipelineOps.t21_classifier_score(spark, sfDir).collect()
    assert(scores.nonEmpty)
    val kept = scores.count(_.getAs[Boolean]("keep"))
    // sha-derived weights center at 1000 => roughly half kept; the cut
    // must separate, not rubber-stamp (all-keep/all-drop = broken score)
    assert(kept > 0 && kept < scores.length,
      s"keep cut must separate: $kept of ${scores.length}")
    // identical text => identical score (pure function of content)
    val dir = java.nio.file.Files.createTempDirectory("graft_t21_").toString
    spark.createDataFrame(Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pair = PipelineOps.t21_classifier_score(spark, dir).collect()
    assert(pair.length == 2 &&
      pair.map(_.getAs[Long]("score_fp")).distinct.length == 1)
  }

  test("t23: span length separates a leaked passage from one-gram noise") {
    val dir = java.nio.file.Files.createTempDirectory("graft_t23_").toString
    val evalText = (1 to 20).map(i => s"w$i").mkString(" ")
    val leaked = (1 to 15).map(i => s"w$i").mkString(" ") + " unrelated tail here"
    val oneGram = (1 to 5).map(i => s"w$i").mkString(" ") +
      " completely different continuation of text body"
    spark.createDataFrame(Seq(
        (0L, leaked), (1L, oneGram), (90L, evalText)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineOps.t23_substring_decontam(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("longest_span"), r.getAs[Boolean]("contaminated_span"))).toMap
    assert(out(0L) == (15L, true),
      s"15-token leaked span must flag strict: ${out(0L)}")
    assert(out(1L) == (5L, false),
      s"one shared 5-gram must NOT flag strict: ${out(1L)}")
  }

  test("m6: payload dedup accounts every asset; a known dup reclaims its bytes") {
    val m = graft.ops.Multimodal.m6_media_dedup(spark, sfDir).collect()
    val docs = Tables(spark, sfDir).documents
    assert(m.map(_.getAs[Long]("n_assets")).sum == docs.count())
    m.foreach { r =>
      assert(r.getAs[Long]("n_unique_payloads") +
        r.getAs[Long]("n_dup_assets") == r.getAs[Long]("n_assets"))
    }
    // constructed: doc 0 and 3 share a payload (same modality: both id%3=0)
    val dir = java.nio.file.Files.createTempDirectory("graft_m6_").toString
    spark.createDataFrame(Seq(
        (0L, "same bytes"), (3L, "same bytes"), (1L, "other bytes")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.Multimodal.m6_media_dedup(spark, dir).collect()
      .map(r => r.getAs[String]("modality") ->
        (r.getAs[Long]("n_dup_assets"), r.getAs[Long]("bytes_reclaimable"))).toMap
    assert(out("image") == (1L, "same bytes".getBytes("UTF-8").length.toLong),
      s"one duplicate image payload must reclaim its byte length: $out")
    assert(out("audio") == (0L, 0L))
  }

  test("t22: manifest is partitioning-invariant and accounts every doc") {
    val m = PipelineOps.t22_shard_manifest(spark, sfDir).collect()
    val docs = Tables(spark, sfDir).documents
    assert(m.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // same manifest from a differently-partitioned read of the same data
    val repart = java.nio.file.Files.createTempDirectory("graft_t22_").toString
    docs.repartition(7).write.mode("overwrite")
      .parquet(s"$repart/documents.parquet")
    val m2 = PipelineOps.t22_shard_manifest(spark, repart).collect()
    assert(m.map(_.toSeq).toSet == m2.map(_.toSeq).toSet,
      "shard assignment and checksums must not depend on partitioning")
  }

  test("s10: int8 codes keep recall vs the exact baseline; reruns identical") {
    val sq = Similarity.s10_ann_sq(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = Similarity.s1_ann_topk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(exact.nonEmpty)
    // 64 dims × int8 is a fine quantization of unit vectors — the
    // shortlist+rerank must recover nearly all exact neighbors
    val recall = (sq & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ recall@5 degraded: $recall")
    val again = Similarity.s10_ann_sq(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(sq == again, "SQ path must be fully deterministic")
  }

  test("t25: boilerplate chunks are removed, unique text survives verbatim") {
    val dir = java.nio.file.Files.createTempDirectory("graft_t25_").toString
    // 4-token boilerplate chunk shared by 3 docs (chunk-aligned at the
    // start); doc 3 is pure unique text; doc 4 is ONLY boilerplate
    val boiler = "all rights reserved worldwide"
    spark.createDataFrame(Seq(
        (0L, s"$boiler alpha beta gamma delta"),
        (1L, s"$boiler epsilon zeta eta theta"),
        (2L, s"$boiler iota kappa lambda mu"),
        (3L, "nu xi omicron pi"),
        (4L, boiler)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.TextOps.t25_boilerplate_strip(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("removed_chunks"),
          r.getAs[Long]("removed_tokens"))).toMap
    assert(out(0L) == (("alpha beta gamma delta", 1L, 4L)), s"${out(0L)}")
    assert(out(3L) == (("nu xi omicron pi", 0L, 0L)), s"${out(3L)}")
    assert(out(4L) == (("", 1L, 4L)),
      s"all-boilerplate doc must strip to empty, not vanish: ${out(4L)}")
  }

  test("p2: plan achieves the uniform target within doc-granularity noise") {
    val rows = PipelineOps.p2_mix_apply(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val target = rows.head.getAs[Long]("target_pm")
    rows.foreach { r =>
      assert(r.getAs[Long]("rate_pm") >= 0 && r.getAs[Long]("rate_pm") <= 1000)
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens"))
    }
    // the sha-ticket sample is only doc-granular, but the achieved
    // permille must track the target — a broken plan (rate 0 or 1000
    // everywhere) lands far off
    val maxDev = rows.map(r =>
      math.abs(r.getAs[Long]("achieved_pm") - target)).max
    assert(maxDev <= 100, s"achieved mix drifted from target $target: " +
      rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("achieved_pm"))).toSeq.toString)
    // deterministic across runs
    val again = PipelineOps.p2_mix_apply(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("t26: pieces reassemble every word exactly; rare words split, frequent stay whole") {
    val seg = PipelineOps.t26_wordpiece(spark, sfDir).collect()
    assert(seg.nonEmpty)
    // the defining invariant: greedy pieces concatenate back to the word
    seg.foreach { r =>
      assert(r.getAs[String]("pieces").replace("|", "") == r.getAs[String]("word"),
        s"pieces must cover the word exactly: $r")
      assert(r.getAs[Long]("n_pieces") >= 1)
    }
    // constructed: a word rarer than the corpus-scaled cap must split
    // into sub-word pieces built from the frequent words' substrings
    val dir = java.nio.file.Files.createTempDirectory("graft_t26_").toString
    val common = (0L until 60L).map(i => (i, "alpha beta alpha beta alpha"))
    val rare = Seq((100L, "alphabeta zzz"))
    spark.createDataFrame(common ++ rare).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineOps.t26_wordpiece(spark, dir).collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("n_pieces"), r.getAs[String]("pieces"))).toMap
    assert(out("alpha")._1 == 1L, s"frequent word stays whole: ${out("alpha")}")
    // 'alphabeta' (count 1) is not in vocab; greedy consumes 4-char
    // substrings of the frequent words ('alph','a','beta' etc.)
    assert(out("alphabeta")._1 > 1L,
      s"rare compound must split into sub-pieces: ${out("alphabeta")}")
    assert(out("alphabeta")._2.replace("|", "") == "alphabeta")
    // 'zzz' has no frequent substrings: single-char coverage fallback
    assert(out("zzz") == ((3L, "z|z|z")), s"${out("zzz")}")
  }

  test("t24: buckets partition the scored corpus and order by surprisal") {
    val b = graft.ops.TextOps.t24_ccnet_buckets(spark, sfDir).collect()
      .map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("min_surprisal"),
          r.getAs[Long]("max_surprisal"))).toMap
    assert(b.keySet.subsetOf(Set("head", "middle", "tail")) && b.contains("head"),
      s"buckets: ${b.keySet}")
    val scoredDocs = graft.ops.TextOps.t16_lm_surprisal(spark, sfDir).count()
    assert(b.values.map(_._1).sum == scoredDocs,
      "every scored doc must land in exactly one bucket")
    // quartile cuts: head ≤ 25%-cut < middle ≤ 75%-cut < tail (a bucket
    // can be empty only under extreme value ties — then skip its pair)
    for {
      (lo, hi) <- Seq("head" -> "middle", "middle" -> "tail")
      l <- b.get(lo); h <- b.get(hi)
    } assert(l._3 <= h._2, s"$lo/$hi overlap: $b")
  }
}
