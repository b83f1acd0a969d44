package graft

import org.apache.spark.sql.functions._

/** Unicode robustness: the text operators must be correct on non-ASCII
  * corpora — multi-byte UTF-8, combining marks, CJK (no spaces),
  * emoji outside the BMP (surrogate pairs in the JVM). The synthetic
  * testdata is ASCII; a real 100 TB crawl is mostly not.
  */
class UnicodeSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private lazy val uniDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_uni_").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(0L, "der schnelle braune Fuchs springt über den faulen Hund", "de", "src0", 0L),
      Row(1L, "der schnelle braune Fuchs springt über den faulen Hund", "de", "src0", 0L), // exact dup
      Row(2L, "élève naïf reçoit le résumé déjà préparé", "fr", "src1", 0L),
      Row(3L, "中文文本没有空格", "zh", "src2", 0L), // CJK, no spaces
      Row(4L, "emoji 😀 test 🎉 with surrogate pairs", "en", "src3", 0L),
      Row(5L, "café vs café", "fr", "src1", 0L)) // combining mark vs precomposed
      .map { r => Row(r.get(0), r.get(1), r.get(2), r.get(3),
        r.getString(1).length.toLong) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup groups multi-byte duplicates; distinct unicode texts stay distinct") {
    val out = graft.ops.Dedup.d1_dedup_exact(spark, uniDir).collect()
    assert(out.length == 5, "6 docs, one exact dup pair → 5 groups")
    val dupRow = out.find(_.getAs[Long]("dup_count") == 2L)
    assert(dupRow.isDefined && dupRow.get.getAs[String]("text").contains("über"))
  }

  test("token and char counts are codepoint-correct, not byte-based") {
    val q = graft.ops.TextOps.t2_quality(spark, uniDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // 'über' etc: char count must match String.length, not UTF-8 bytes
    val text0 = "der schnelle braune Fuchs springt über den faulen Hund"
    assert(q(0L).getAs[Long]("n_chars") == text0.length.toLong)
    // CJK with no spaces: ONE whitespace token (the known limitation of
    // whitespace tokenization — the count must still be consistent)
    assert(q(3L).getAs[Long]("n_tokens") == 1)
    // surrogate pairs survive tokenization
    assert(q(4L).getAs[Long]("n_tokens") == 7)
  }

  test("normalization and fingerprints are stable on combining marks and CJK") {
    val norm = graft.ops.TextOps.t5_normalize(spark, uniDir)
    assert(norm.count() == 6, "normalize never drops rows")
    val fp = graft.ops.TextOps.t4_fingerprint(spark, uniDir).collect()
    assert(fp.length == 6 && fp.map(_.getAs[String]("fp_min")).forall(_ != null))
    // NFC vs NFD 'café' are DIFFERENT codepoint sequences → different
    // fingerprint inputs; the engine must not silently conflate them
    val texts = spark.read.parquet(s"$uniDir/documents.parquet")
      .filter(col("doc_id") === 5L).collect().head.getAs[String]("text")
    assert(texts.contains("́") && texts.contains("é"))
  }

  test("minhash/simhash signatures handle unicode shingles") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("über den", "den faulen")),
      (2L, Seq("中文 文本", "emoji 😀"))).toDF("id", "shingles")
    val sigs = df.select(col("id"),
        graft.functions.HashExpressions.shaMinHash(col("shingles"), 16).as("mh"),
        graft.functions.HashExpressions.shaSimHash(col("shingles"), 60).as("sh"))
      .collect()
    assert(sigs.length == 2)
    assert(sigs.forall(_.getAs[Seq[Long]]("mh").length == 16))
    // deterministic: same unicode input → same signature
    val again = df.select(graft.functions.HashExpressions.shaSimHash(col("shingles"), 60).as("sh"))
      .collect().map(_.getLong(0))
    assert(sigs.map(_.getAs[Long]("sh")).sameElements(again))
  }
}
