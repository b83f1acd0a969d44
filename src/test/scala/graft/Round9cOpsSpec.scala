package graft

import graft.model.ModelEngine
import graft.ops.{Dedup, PipelineOps}
import org.apache.spark.sql.functions._

/** Semantic contracts for the round-9 third-wave operators
  * (d12/p6/a14) beyond their DuckDB-oracle exactness: keep-first
  * ownership, plan arithmetic closure, and the SCD2 merge verdicts the
  * fixed two-run oracle fixture cannot reach (new keys, hard deletes,
  * no-op re-runs).
  */
class Round9cOpsSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit =
    spark.createDataFrame(rows.map { case (id, text, source) =>
      (id, text, "en", source, text.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  // 10-token segments with distinct vocab per block, so ownership is
  // unambiguous: T1/T2/T3 are three disjoint 10-token segments.
  private val t1 = (1 to 10).map(i => s"alpha$i").mkString(" ")
  private val t2 = (1 to 10).map(i => s"beta$i").mkString(" ")
  private val t3 = (1 to 10).map(i => s"gamma$i").mkString(" ")

  test("d12: global keep-first — later occurrences removed, first kept verbatim") {
    val dir = tmpDir("graft_d12_")
    writeDocs(dir, Seq(
      (1L, s"$t1 $t2", "s"), // owns T1 and T2
      (2L, s"$t2 $t3", "s"), // T2 is a dup; keeps T3
      (3L, t1, "s")))        // fully duplicated — kept_text must be empty
    val out = Dedup.d12_line_dedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"), r.getAs[String]("kept_text")))
      .toMap
    assert(out(1L) == ((2L, 0L, s"$t1 $t2")))
    assert(out(2L) == ((2L, 1L, t3)))
    assert(out(3L) == ((1L, 1L, "")))
  }

  test("d12: conservation on real data — removals = occurrences minus distinct segments") {
    val rows = Dedup.d12_line_dedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val keptToks =
        if (r.getAs[String]("kept_text").isEmpty) 0
        else r.getAs[String]("kept_text").split(" ").length
      val keptSegs = r.getAs[Long]("n_segs") - r.getAs[Long]("n_removed")
      assert(keptToks <= 10 * keptSegs && keptToks >= keptSegs,
        "kept_text token mass must fit the kept segment count")
    }
    // keep-first leaves exactly one survivor per distinct segment, so
    // total removals = total occurrences − distinct segments; recompute
    // the right-hand side through an independent SQL formulation
    Tables(spark, sfDir).documents.createOrReplaceTempView("d12docs")
    val distinctSegs = spark.sql(
      """SELECT COUNT(DISTINCT seg) AS n FROM (
        |  SELECT explode(transform(
        |    sequence(0, CAST(ceil(size(toks) / 10.0) AS INT) - 1),
        |    i -> concat_ws(' ', slice(toks, i * 10 + 1, 10)))) AS seg
        |  FROM (SELECT filter(split(text, ' '), x -> x != '') AS toks FROM d12docs)
        |  WHERE size(toks) >= 1)""".stripMargin).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_removed")).sum ==
      rows.map(_.getAs[Long]("n_segs")).sum - distinctSegs)
  }

  test("p6: plan arithmetic closes — planned + unmet = target, cap respected") {
    val rows = PipelineOps.p6_epoch_plan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("tokens")).sum
    rows.foreach { r =>
      val tokens = r.getAs[Long]("tokens")
      val target = r.getAs[Long]("target_tokens")
      val full = r.getAs[Long]("epochs_full")
      val partial = r.getAs[Long]("partial_tokens")
      val planned = r.getAs[Long]("planned_tokens")
      val unmet = r.getAs[Long]("unmet_tokens")
      assert(target == 37L * total / (10L * rows.length))
      assert(full == math.min(4L, target / tokens))
      assert(planned + unmet == target)
      assert(planned == full * tokens + partial)
      assert(partial >= 0 && partial < tokens || full == 4L)
      assert(unmet == 0L || full == 4L, "shortfall only when the cap binds")
    }
  }

  test("a14: snapshot merge — new key, hard delete stays open, no-op re-run is stable") {
    import spark.implicits._
    val wh = tmpDir("graft_a14_")
    val engine = new ModelEngine(spark)
    def df(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")
    // v1: two keys
    engine.snapshot("s", df(1L -> "a", 2L -> "b"), "k", 1L, wh)
    // v2: key 1 changes, key 2 deleted (stays open), key 3 appears
    engine.snapshot("s", df(1L -> "a2", 3L -> "c"), "k", 2L, wh)
    // v3: identical source — must be a no-op
    val out = engine.snapshot("s", df(1L -> "a2", 3L -> "c"), "k", 3L, wh)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue),
        r.getAs[Boolean]("is_current")))
      .sortBy(t => (t._1, t._3))
    assert(out.toSeq == Seq(
      (1L, "a", 1L, Some(2L), false),  // closed by the v2 change
      (1L, "a2", 2L, None, true),      // reopened at v2, untouched at v3
      (2L, "b", 1L, None, true),       // hard delete: stays open (dbt default)
      (3L, "c", 2L, None, true)))      // appeared at v2
  }
}
