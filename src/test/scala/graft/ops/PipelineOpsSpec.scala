package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {

  /** Corpus with a planted eval-set leak and known token counts. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val leaked = "alpha beta gamma delta epsilon zeta eta theta" // 8 toks → shared 5-grams
    val clean = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (0L, leaked, "en", "s", 1L), // train, copies doc 95's text
      (1L, clean, "en", "s", 1L), // train, clean
      (95L, leaked, "en", "s", 1L), // test split (95 % 100 >= 90)
      (96L, "unrelated eval words entirely distinct here okay", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("pipeops_").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("t9_decontaminate flags train docs sharing 5-grams with the test split") {
    val out = PipelineOps.t9_decontaminate(spark, plantedDir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 1L)) // train docs only
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(0L).getAs[Boolean]("contaminated"))
    assert(byId(0L).getAs[Long]("n_shared_grams") == 4) // 8 toks → 4 distinct 5-grams
    assert(!byId(1L).getAs[Boolean]("contaminated"))
    assert(byId(1L).getAs[Long]("n_shared_grams") == 0)
  }

  test("t10_pack_sequences assigns chunks by exclusive prefix token sum") {
    import spark.implicits._
    // 300 tokens each: prefixes 0, 300, 600 → chunks 0, 0, 1 at budget 512
    val text300 = Seq.fill(300)("w").mkString(" ")
    val docs = Seq(
      (1L, text300, "en", "s", 1L), (2L, text300, "en", "s", 1L), (3L, text300, "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("pack_").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = PipelineOps.t10_pack_sequences(spark, tmp).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("chunk_id") == 0L && out(0).getAs[Long]("n_docs") == 2)
    assert(out(0).getAs[Long]("chunk_tokens") == 600L)
    assert(out(1).getAs[Long]("chunk_id") == 1L && out(1).getAs[Long]("first_doc") == 3L)
  }

  test("t11_repetition measures within-doc n-gram duplication") {
    import spark.implicits._
    // "a b a b a b": 3-grams = [a b a, b a b, a b a, b a b] → 4 total, 2 distinct
    val docs = Seq((1L, "a b a b a b", "en", "s", 1L), (2L, "p q r s", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("rep_").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = PipelineOps.t11_repetition(spark, tmp).collect()
    val r1 = out.find(_.getAs[Long]("doc_id") == 1L).get
    assert(r1.getAs[Long]("n_grams") == 4 && r1.getAs[Long]("n_distinct_grams") == 2)
    assert(r1.getAs[Long]("max_gram_count") == 2 && r1.getAs[Double]("dup_fraction") == 0.5)
    val r2 = out.find(_.getAs[Long]("doc_id") == 2L).get
    assert(r2.getAs[Double]("dup_fraction") == 0.0)
  }

  test("d4_ngram_jaccard finds planted near-dups exactly, d6 clusters them") {
    import spark.implicits._
    val base = "spark group query row data slow small filter customer line the batch value merge extra words here"
    val docs = Seq(
      (10L, base, "en", "s", 1L),
      (11L, base.replace("slow", "fast"), "en", "s", 1L), // 1-token edit
      (12L, "totally disjoint vocabulary zebra yak xylophone quartz jolt mimic", "en", "s", 1L),
      (13L, base, "en", "s", 1L) // exact dup of 10
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("d4_").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.d4_ngram_jaccard(spark, tmp).collect()
    val keys = pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(keys == Set((10L, 11L), (10L, 13L), (11L, 13L)))
    assert(pairs.find(r => r.getAs[Long]("id_a") == 10L && r.getAs[Long]("id_b") == 13L)
      .get.getAs[Double]("jaccard") == 1.0)
    val clusters = Dedup.d6_dedup_clusters(spark, tmp).collect()
    assert(clusters.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap ==
      Map(10L -> 10L, 11L -> 10L, 13L -> 10L))
    assert(clusters.count(_.getAs[Boolean]("keep")) == 1)
  }
}

class RelationalBreadthSpec extends SparkSpec {
  import graft.queries.Relational

  test("q30_cube: grand total row matches table count, margins are consistent") {
    val out = Relational.q30_cube(spark, sfDir).collect()
    val total = graft.Tables(spark, sfDir).orders.count()
    val grand = out.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1 && grand.head.getAs[Long]("n_orders") == total)
    // each margin level re-sums to the grand total
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(out.filter(_.getAs[Long]("gid") == gid).map(_.getAs[Long]("n_orders")).sum == total)
    }
  }

  test("q31_agg_breadth: argmin/argmax match a manual scan") {
    val seg = "BUILDING"
    val c = graft.Tables(spark, sfDir).customer
      .filter(col("c_mktsegment") === seg)
      .select("c_custkey", "c_name", "c_acctbal").collect()
    def key(r: org.apache.spark.sql.Row) =
      math.round(r.getAs[Double]("c_acctbal") * 100) * 1000000L + r.getAs[Long]("c_custkey")
    val poorest = c.minBy(key).getAs[String]("c_name")
    val richest = c.maxBy(key).getAs[String]("c_name")
    val row = Relational.q31_agg_breadth(spark, sfDir)
      .filter(col("c_mktsegment") === seg).collect().head
    assert(row.getAs[String]("poorest_name") == poorest)
    assert(row.getAs[String]("richest_name") == richest)
    assert(row.getAs[Long]("n") == c.length)
  }

  test("q34_window_frames: first/last frame semantics per customer") {
    val rows = Relational.q34_window_frames(spark, sfDir).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey")).filter(_._2.length >= 2)
    val (_, orders) = byCust.head
    // every row in a partition agrees on last_price; first row's first_price is its own
    assert(orders.map(_.getAs[Double]("last_price")).distinct.length == 1)
  }

  test("q35_salted_join equals the unsalted join result") {
    val salted = Relational.q35_salted_join(spark, sfDir).collect()
    val plain = Relational.q4_join_shuffle(spark, sfDir).collect()
    // same group keys and counts (q4 shares the contract: priority × count × money)
    assert(salted.map(r => (r.getString(0), r.getAs[Long]("n_items"))).toSeq ==
      plain.map(r => (r.getString(0), r.getAs[Long]("n_items"))).toSeq)
  }

  test("a5_incremental: skip/rebuild statuses enforced, result matches direct SQL") {
    val out = graft.queries.ModelQueries.a5_incremental(spark, sfDir) // requires() inside
    val direct = graft.Tables(spark, sfDir).orders
      .filter(col("o_totalprice") > 150000)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority").collect()
    assert(out.select("o_orderpriority", "n_orders").collect().toSeq == direct.toSeq)
  }
}
