package graft

import graft.ops.{Dedup, PipelineOps, TextOps}
import org.apache.spark.sql.functions._

/** Semantic contracts for the round-9 fifth-wave operators
  * (t31/p8/d14) beyond their DuckDB-oracle exactness: the PII regex
  * classes fire and rewrite on constructed fixtures (the synthetic
  * corpus contains none), split assignment never leaks a duplicate
  * group across splits, and the retention policies rank survivors the
  * way their rules promise.
  */
class Round9eOpsSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    spark.createDataFrame(rows.map { case (id, text) =>
      (id, text, "en", "s", text.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("t31: regex classes detect and redact constructed PII") {
    val dir = tmpDir("graft_t31_")
    writeDocs(dir, Seq(
      1L -> "contact alice.smith+x@example.org or bob@mail.co today",
      2L -> "server 192.168.001.200 and 10.0.0.1 rebooted",
      3L -> "order 123456789 ref 98765432100 ok",
      4L -> "the customer met a supplier and a customer",
      5L -> "nothing sensitive here at all"))
    val out = TextOps.t31_pii_redact(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_email") == 2L)
    assert(out(2L).getAs[Long]("n_ipv4") == 2L)
    assert(out(3L).getAs[Long]("n_longid") == 2L)
    assert(out(4L).getAs[Long]("n_deny") == 3L)
    assert(out(5L).getAs[Boolean]("clean"))
    assert(!out(1L).getAs[Boolean]("clean"))
    // redaction changed the sizes of every dirty doc and no clean one
    (1L to 4L).foreach { id =>
      assert(out(id).getAs[Long]("n_chars_redacted") !=
        out(id).getAs[Long]("n_chars_orig"), s"doc $id must be rewritten")
    }
    assert(out(5L).getAs[Long]("n_chars_redacted") ==
      out(5L).getAs[Long]("n_chars_orig"))
  }

  test("t31: the corpus entry is live through the deny-term class only") {
    val rows = TextOps.t31_pii_redact(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // synthetic corpus: no digits, no @ — regex classes are honestly zero
    assert(rows.forall(r => r.getAs[Long]("n_email") == 0L &&
      r.getAs[Long]("n_ipv4") == 0L && r.getAs[Long]("n_longid") == 0L))
    // the deny-term class fires (corpus vocabulary contains the terms)
    assert(rows.exists(_.getAs[Long]("n_deny") > 0L))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("clean") == (r.getAs[Long]("n_deny") == 0L))
    }
  }

  test("p8: splits are exhaustive, leak-free, and deterministic") {
    val rows = PipelineOps.p8_split_assign(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
    assert(rows.forall(_.getAs[Long]("leaked_groups") == 0L),
      "exact-dup groups must never straddle splits")
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = Tables(spark, sfDir).documents.count()
    assert(totalDocs == corpus, "every document is assigned exactly once")
    // ~90/5/5: train holds the bulk
    val train = rows.find(_.getAs[String]("split") == "train").get
    assert(train.getAs[Long]("docs_pm") >= 800L)
    // rerun = identical manifest (sha determinism)
    val again = PipelineOps.p8_split_assign(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("p8: byte-identical copies land in the same split by construction") {
    val dir = tmpDir("graft_p8_")
    val t1 = (1 to 40).map(i => s"w$i").mkString(" ")
    val t2 = (100 to 150).map(i => s"v$i").mkString(" ")
    // 3 copies of t1, 2 of t2, ids far apart
    writeDocs(dir, Seq(1L -> t1, 500L -> t1, 900L -> t1, 2L -> t2, 700L -> t2))
    val rows = PipelineOps.p8_split_assign(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("leaked_groups") == 0L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 5L)
    assert(rows.map(_.getAs[Long]("n_groups")).sum == 2L)
  }

  test("d14: constructed near-dups rank survivors per policy") {
    val dir = tmpDir("graft_d14_")
    // base ~40 shingles; nearDup = base + tail -> Jaccard >= 0.7, longer,
    // and carries stopwords (higher quality). Unrelated doc untouched.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = base + " the of and extra tail"
    val other = (100 to 140).map(i => s"oth$i").mkString(" ")
    writeDocs(dir, Seq(1L -> base, 2L -> nearDup, 3L -> other))
    val out = Dedup.d14_retention_policies(spark, dir).collect()
      .map(r => r.getAs[String]("policy") -> r).toMap
    assert(out.keySet == Set("keep_first", "keep_longest", "keep_best"))
    // keep_first: doc 1 survives (smaller id) -> drop doc 2 (46 tokens)
    assert(out("keep_first").getAs[Long]("n_dropped") == 1L)
    assert(out("keep_first").getAs[Long]("tokens_dropped") == 45L)
    // keep_longest: doc 2 survives (more tokens) -> drop doc 1 (40 tokens)
    assert(out("keep_longest").getAs[Long]("tokens_dropped") == 40L)
    // keep_best: doc 2 carries stopwords -> doc 1 dropped
    assert(out("keep_best").getAs[Long]("tokens_dropped") == 40L)
    // conservation: kept + dropped = corpus, per policy
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_dropped") + r.getAs[Long]("n_kept") == 3L)
    }
  }

  test("d15: all three verdicts fire on a constructed index/increment overlap") {
    val dir = tmpDir("graft_d15_")
    val a = "alpha beta gamma delta epsilon"
    val b = "zeta eta theta iota kappa"
    val c = "fresh words never indexed here"
    // even ids = standing index {a, b}; odd ids = increment:
    // 1 -> a (dup_of_index), 3 -> c (new, first owner), 5 -> c (dup_in_increment)
    writeDocs(dir, Seq(2L -> a, 4L -> b, 1L -> a, 3L -> c, 5L -> c))
    val out = Dedup.d15_incremental_dedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(out == Map(1L -> "dup_of_index", 3L -> "new", 5L -> "dup_in_increment"))
  }

  test("d15: the corpus increment is fully graded and verdict-partitioned") {
    val rows = Dedup.d15_incremental_dedup(spark, sfDir).collect()
    val inc = Tables(spark, sfDir).documents.filter(col("doc_id") % 2 === 1).count()
    assert(rows.length == inc, "every increment doc gets exactly one verdict")
    assert(rows.forall(r => Set("new", "dup_of_index", "dup_in_increment")
      .contains(r.getAs[String]("verdict"))))
  }

  test("p9: the data card covers every source and is internally consistent") {
    val rows = PipelineOps.p9_dataset_card(spark, sfDir).collect()
    val srcs = Tables(spark, sfDir).documents.select("source").distinct().count()
    assert(rows.length == srcs)
    rows.foreach { r =>
      assert(r.getAs[Long]("mean_doc_tokens") ==
        r.getAs[Long]("n_tokens") / r.getAs[Long]("n_docs"))
      Seq("dup_doc_pm", "quality_pass_pm").foreach { c =>
        val v = r.getAs[Long](c); assert(v >= 0 && v <= 1000, s"$c permille")
      }
      assert(r.getAs[Long]("n_langs") >= 1)
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables(spark, sfDir).documents.count())
  }

  test("p9: a source of copies is charged the corpus-global duplicate rate") {
    val dir = tmpDir("graft_p9_")
    val orig = "one two three four five six the"
    spark.createDataFrame(Seq(
      (1L, orig, "en", "clean", orig.length.toLong),
      (2L, orig, "en", "copies", orig.length.toLong),
      (3L, orig, "en", "copies", orig.length.toLong),
      (4L, "other words entirely the of", "en", "copies", 28L)
    )).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineOps.p9_dataset_card(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("dup_doc_pm")).toMap
    assert(out("clean") == 0L, "the canonical owner is not a duplicate")
    assert(out("copies") == 666L, "2 of 3 docs are non-first occurrences")
  }

  test("s15: every emitted vector gets at most k neighbors, ranked by cosine") {
    val rows = graft.ops.Similarity.s15_knn_join(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byVec = rows.groupBy(_.getAs[Long]("vec_id"))
    byVec.foreach { case (v, ns) =>
      assert(ns.length <= 3, s"vec $v has ${ns.length} neighbors")
      val cos = ns.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b },
        s"vec $v neighbors must be cosine-descending")
      assert(!ns.exists(_.getAs[Long]("neighbor") == v), "no self-loops")
    }
  }

  test("g7: degree report is conservation-exact against the edge aggregate") {
    val t = Tables(spark, sfDir)
    val rows = graft.ops.GraphOps.g7_degree_report(spark, sfDir).collect()
    assert(rows.length == t.nation.count())
    val outW = rows.map(_.getAs[Long]("out_w")).sum
    val inW = rows.map(_.getAs[Long]("in_w")).sum
    assert(outW == inW, "every edge's weight counts once per direction")
    val li = t.lineitem.count()
    assert(outW == li, "trade volume equals the lineitem row count")
    rows.foreach { r =>
      val pm = r.getAs[Long]("volume_pm")
      assert(pm >= 0 && pm <= 1000)
    }
  }

  test("d14: policy audit is conserving and bounded on real data") {
    val total = Tables(spark, sfDir).documents.count()
    val rows = Dedup.d14_retention_policies(spark, sfDir).collect()
    assert(rows.nonEmpty, "the sf corpus contains verified near-dup pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dropped") + r.getAs[Long]("n_kept") == total)
      assert(r.getAs[Long]("n_dropped") > 0L)
      val q = r.getAs[Long]("kept_quality_pm")
      assert(q >= 0L && q <= 1000L)
    }
    // keep_longest retains at least as many tokens as any other policy
    val byPolicy = rows.map(r => r.getAs[String]("policy") -> r.getAs[Long]("tokens_kept")).toMap
    assert(byPolicy("keep_longest") >= byPolicy("keep_first"))
  }
}
