package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training corpora (SURVEY §2C).
  *
  * Scale shape: signature computation (shingles → minhash / simhash) is a
  * narrow per-row map with zero shuffles; the only wide stages are the
  * LSH band `groupBy` (cardinality ≈ rows × bands, keys are 64-bit
  * hashes so they distribute uniformly) and the candidate-verify join.
  * Candidate pairs are generated strictly within buckets — never an n²
  * cross product — and buckets above `maxBucket` are dropped as a skew
  * guard (a degenerate key at 100 TB would otherwise quadratically blow
  * up a single task; dropping it only loses near-dup recall among texts
  * that are all near-identical to each other anyway).
  */
object Dedup {

  /** Distinct 2-word shingle set per document (falls back to the whole
    * text when shorter than the shingle width).
    */
  private def withShingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(TextOps.TOKENS))
      .withColumn("shingles", expr(
        """array_distinct(CASE WHEN size(toks) >= 2 THEN
          |  transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i+1]))
          |ELSE array(concat_ws(' ', toks)) END)""".stripMargin))

  /** MinHash signature via the native codegen'd expression
    * (graft.functions.MinHashSignature): one generated-Java pass per row,
    * k running minima — measured ~10× over the interpreted higher-order
    * function formulation it replaces.
    */
  private def withMinhash(df: DataFrame, k: Int = 64, seed: Long = 42L): DataFrame =
    df.withColumn("sig", graft.functions.HashExpressions.minhashSig(col("shingles"), k, seed))

  /** Candidate pairs from LSH banding: explode (band, bandKey) rows,
    * drop oversized buckets (skew guard), self-join within buckets.
    */
  private def lshCandidates(
      sigDf: DataFrame, bands: Int, rowsPerBand: Int, maxBucket: Int): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bkey"))
    }: _*)
    // The exploded band table feeds four plan branches (bucket counts,
    // the semi join, and both self-join sides): persist it instead of
    // recomputing scan→shingles→signature per branch. It is 3 small
    // columns per row — linear, spill-safe (MEMORY_AND_DISK) — the same
    // materialize-the-signatures step a 100 TB dedup run would
    // checkpoint before the bucket join.
    val exploded = sigDf
      .select(col("doc_id"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = exploded.groupBy("band", "bkey").count()
      .filter(col("count").between(2, maxBucket))
      .select("band", "bkey")
    val members = exploded.join(buckets, Seq("band", "bkey"), "left_semi")
    members.as("l")
      .join(members.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact shingle-Jaccard verification of candidate pairs. */
  private def withJaccard(pairs: DataFrame, shingled: DataFrame): DataFrame = {
    // joined twice (id_a side and id_b side) → persist one computation
    val sh = shingled.select(col("doc_id"), col("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs
      .join(sh.withColumnsRenamed(Map("doc_id" -> "id_a", "shingles" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("doc_id" -> "id_b", "shingles" -> "sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .select("id_a", "id_b", "jaccard")
  }

  /** d1_dedup_exact — exact duplicate grouping. Grouping key is the text
    * itself for oracle parity; at 100 TB you'd group by xxhash64(text)
    * first and confirm within hash groups so the shuffle carries 8-byte
    * keys — semantics identical, both shapes are one shuffle. [oracle]
    */
  def d1_dedup_exact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_count"))
      .select("keep_id", "dup_count", "text")
      .orderBy("keep_id")

  val d1_oracle: String =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count, text
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  /** d2_dedup_minhash — MinHash(64) + LSH(16 bands × 4 rows) near-dup
    * pairs, verified with exact shingle Jaccard ≥ 0.7. [rows-only]
    */
  def d2_dedup_minhash(spark: SparkSession, dir: String): DataFrame = {
    val sh = withShingles(Tables(spark, dir).documents)
    val sig = withMinhash(sh)
    val cands = lshCandidates(sig, bands = 16, rowsPerBand = 4, maxBucket = 100)
    withJaccard(cands, sh)
      .filter(col("jaccard") >= 0.7)
      .orderBy(col("jaccard").desc, col("id_a").asc, col("id_b").asc)
  }

  /** d3_dedup_simhash — 64-bit SimHash over 2-word shingles; candidates
    * bucketed by 4 × 16-bit bands (any pair within hamming ≤ 16 shares a
    * band by pigeonhole at ≤3 differing bits per band), confirmed with
    * bit_count(xor) ≤ 12. [rows-only]
    */
  def d3_dedup_simhash(spark: SparkSession, dir: String): DataFrame = {
    val sh = withShingles(Tables(spark, dir).documents)
      .withColumn("simhash", graft.functions.HashExpressions.simhash64(col("shingles")))
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"), expr(s"(shiftright(simhash, ${16 * b}) & 65535)").as("bkey"))
    }: _*)
    val exploded = sh.select(col("doc_id"), col("simhash"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // reused by 4 branches
    val buckets = exploded.groupBy("band", "bkey").count()
      .filter(col("count").between(2, 200)).select("band", "bkey")
    val members = exploded.join(buckets, Seq("band", "bkey"), "left_semi")
    members.as("l")
      .join(members.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(
        col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"),
        expr("bit_count(l.simhash ^ r.simhash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 12)
      .orderBy(col("hamming").asc, col("id_a").asc, col("id_b").asc)
  }

  /** d4_ngram_jaccard — exact 2-gram Jaccard scores for every LSH
    * candidate pair (no threshold): the ranked near-dup report. [rows-only]
    */
  def d4_ngram_jaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = withShingles(Tables(spark, dir).documents)
    val cands = lshCandidates(withMinhash(sh), bands = 16, rowsPerBand = 4, maxBucket = 100)
    withJaccard(cands, sh)
      .orderBy(col("jaccard").desc, col("id_a").asc, col("id_b").asc)
  }

  /** d6_dedup_clusters — connected components over the verified near-dup
    * pair graph, by iterative min-label propagation: every document gets
    * a cluster_id (the smallest doc_id reachable through near-dup edges)
    * and `keep` marks the cluster representative. This is the step that
    * turns pairwise similarity into an actual dedup decision.
    *
    * Scale: near-dup components are overwhelmingly tiny cliques
    * (diameter ≤ a few hops), so a fixed 8 rounds of propagation — each
    * one join + groupBy over the edge list, persisted to cut lineage —
    * converges; components wider than 2^8 hops would need the
    * large-star/small-star algorithm instead. [rows-only]
    */
  def d6_dedup_clusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = d2_dedup_minhash(spark, dir).select("id_a", "id_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = pairs.unionAll(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    // localCheckpoint (eager) after every round: materializes the round
    // AND truncates the logical plan — without it the plan tree doubles
    // per iteration and analysis itself blows up. On a cluster prefer
    // reliable checkpoint(dir) so rounds survive executor loss.
    var labels = pairs.select(col("id_a").as("doc_id"))
      .unionAll(pairs.select(col("id_b").as("doc_id")))
      .distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint(true)
    for (_ <- 0 until 8) {
      val msgs = edges
        .join(labels, edges("id_a") === labels("doc_id"))
        .select(col("id_b").as("doc_id"), col("label"))
      labels = labels.select("doc_id", "label").unionAll(msgs)
        .groupBy("doc_id").agg(min("label").as("label"))
        .localCheckpoint(true)
    }
    labels
      .select(col("doc_id"), col("label").as("cluster_id"),
        (col("doc_id") === col("label")).as("keep"))
      .orderBy("cluster_id", "doc_id")
  }

  /** d5_embed_dup — embedding-cosine near-dup: random-hyperplane LSH
    * buckets (8 planes → 256 buckets) generate candidates, exact cosine
    * ranks them; top-100 closest pairs. Only bucket-local pairs are ever
    * scored — corpus² never materializes. [rows-only]
    */
  def d5_embed_dup(spark: SparkSession, dir: String): DataFrame = {
    val unit = Similarity.withUnit(Tables(spark, dir).embeddings)
    val bucketed = Similarity.withHyperplaneBucket(unit, planes = 8, seed = 7L)
    val cands = bucketed.as("l")
      .join(bucketed.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .select(
        col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"),
        round(Similarity.dot(col("l.unit"), col("r.unit")), 6).as("cosine"))
    cands.orderBy(col("cosine").desc, col("id_a").asc, col("id_b").asc).limit(100)
  }
}
