package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Caching.PersistSyntax

/** Training-data pipeline operators beyond per-document analysis
  * (SURVEY §2C): benchmark decontamination, sequence packing, and
  * within-document repetition scoring. All three are deterministic
  * integer/rounded arithmetic, so every operator here is hash-checked
  * against a DuckDB oracle.
  */
object PipelineOps {

  /** Distinct word-5-gram set per document (decontamination standard:
    * n high enough that cross-document collisions mean real overlap).
    */
  private val FIVE_GRAMS =
    """array_distinct(CASE WHEN size(toks) >= 5 THEN
      |  transform(sequence(0, size(toks) - 5),
      |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))
      |ELSE array(concat_ws(' ', toks)) END)""".stripMargin

  /** t9_decontaminate — benchmark decontamination: flag training
    * documents sharing any word-5-gram with the held-out test split
    * (t6's deterministic doc_id%100 split, so train/test membership is
    * stable). The held-out side's distinct n-gram set is tiny relative
    * to the corpus (10% of docs), so at 100 TB the eval n-gram set is
    * the broadcast side of the join and the training corpus is never
    * shuffled; output is one row per training doc with the overlap
    * count. [oracle]
    */
  def t9_decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables(spark, dir).documents
      .withColumn("toks", expr(TextOps.TOKENS))
      .select(col("doc_id"), explode(expr(FIVE_GRAMS)).as("gram"))
    val train = grams.filter(col("doc_id") % 100 < 80)
    val eval_ = grams.filter(col("doc_id") % 100 >= 90)
      .select(col("gram")).distinct()
    val overlap = train.join(broadcast(eval_), Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
    Tables(spark, dir).documents.filter(col("doc_id") % 100 < 80)
      .select("doc_id")
      .join(overlap, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        coalesce(col("n_shared_grams") > 0, lit(false)).as("contaminated"))
      .orderBy("doc_id")
  }

  val t9_oracle: String =
    """WITH grams AS (
      |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 5
      |    THEN list_transform(range(1, len(toks) - 3),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
      |    ELSE [array_to_string(toks, ' ')] END)) AS gram
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |        FROM documents)),
      |ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 100 >= 90),
      |overlap AS (SELECT doc_id, COUNT(*) AS n_shared_grams
      |            FROM grams JOIN ev USING (gram)
      |            WHERE doc_id % 100 < 80 GROUP BY doc_id)
      |SELECT d.doc_id,
      |  COALESCE(o.n_shared_grams, 0) AS n_shared_grams,
      |  COALESCE(o.n_shared_grams > 0, false) AS contaminated
      |FROM documents d LEFT JOIN overlap o ON d.doc_id = o.doc_id
      |WHERE d.doc_id % 100 < 80
      |ORDER BY d.doc_id""".stripMargin

  /** t10_pack_sequences — sequence packing: concatenate documents into
    * fixed token-budget training chunks (budget 512), per language,
    * in deterministic doc_id order. Chunk assignment is
    * floor(exclusive-prefix-token-sum / budget): a pure window
    * computation — one shuffle on (lang), no driver-side state — so it
    * scales to any corpus (the greedy first-fit variant needs a
    * sequential scan per group; prefix-sum packing is the
    * order-preserving distributed formulation). Output is the per-chunk
    * manifest. [oracle]
    */
  def t10_pack_sequences(spark: SparkSession, dir: String): DataFrame = {
    val budget = 512
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables(spark, dir).documents
      .withColumn("n_tokens", expr(s"CAST(size(${TextOps.TOKENS}) AS BIGINT)"))
      .withColumn("chunk_id",
        floor(coalesce(sum("n_tokens").over(w), lit(0L)) / budget).cast("long"))
      .groupBy("lang", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("chunk_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("lang", "chunk_id")
  }

  val t10_oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |chunked AS (
      |  SELECT doc_id, lang, n_tokens,
      |    CAST(floor(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT) AS chunk_id
      |  FROM toks)
      |SELECT lang, chunk_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM chunked GROUP BY lang, chunk_id
      |ORDER BY lang, chunk_id""".stripMargin

  /** t11_repetition — within-document repetition scoring (the
    * boilerplate/spam signal): total vs distinct word-3-gram counts and
    * the hottest 3-gram's multiplicity per document. Shape: explode →
    * two-level groupBy, all counts partial-aggregated map-side; one
    * shuffle keyed by (doc_id, gram) then (doc_id). [oracle]
    */
  def t11_repetition(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables(spark, dir).documents
      .withColumn("toks", expr(TextOps.TOKENS))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))""".stripMargin)).as("gram"))
    grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max("c").as("max_gram_count"))
      .select(
        col("doc_id"), col("n_grams"), col("n_distinct_grams"), col("max_gram_count"),
        round(lit(1.0) - col("n_distinct_grams") / col("n_grams").cast("double"), 4)
          .as("dup_fraction"))
      .orderBy("doc_id")
  }

  /** t13_corpus_report — the corpus health report card: one row
    * summarizing what the pipeline found — corpus size, exact-duplicate
    * texts, verified near-duplicate pairs (d4's exact contract),
    * benchmark-contaminated training docs (t9's contract), and total
    * whitespace tokens. Every component is itself an oracle-checked
    * operator, and the report's oracle is literally composed from their
    * oracle SQL — the composition proof that the operators agree as a
    * system, not just individually. All counts are tiny single-row
    * aggregates crossed together (no data movement beyond the component
    * jobs). [oracle]
    */
  def t13_corpus_report(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    // n_docs and total_ws_tokens ride ONE corpus scan/aggregate (r14:
    // they were two separate passes over the same table — guide §2.4's
    // "two operations keyed the same way share one pass"); the dup-text,
    // near-dup and contamination counts keep their own component
    // pipelines (each is a different oracle-checked operator).
    val docStats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(expr(s"size(${TextOps.TOKENS})")).cast("long").as("total_ws_tokens"))
    val dupTexts = docs.groupBy("text").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(count(lit(1)).as("n_dup_texts"))
    val nearDups = Dedup.d4_ngram_jaccard(spark, dir)
      .agg(count(lit(1)).as("n_near_dup_pairs"))
    val contaminated = t9_decontaminate(spark, dir)
      .filter(col("contaminated"))
      .agg(count(lit(1)).as("n_contaminated"))
    docStats.crossJoin(dupTexts).crossJoin(nearDups).crossJoin(contaminated)
      .select("n_docs", "n_dup_texts", "n_near_dup_pairs",
        "n_contaminated", "total_ws_tokens")
  }

  lazy val t13_oracle: String =
    s"""SELECT
       |  (SELECT COUNT(*) FROM documents) AS n_docs,
       |  (SELECT COUNT(*) FROM (SELECT text FROM documents GROUP BY text HAVING COUNT(*) > 1)) AS n_dup_texts,
       |  (SELECT COUNT(*) FROM (${Dedup.d4_oracle})) AS n_near_dup_pairs,
       |  (SELECT COUNT(*) FROM ($t9_oracle) WHERE contaminated) AS n_contaminated,
       |  (SELECT CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
       |   FROM documents) AS total_ws_tokens""".stripMargin

  /** t12_tfidf — TF-IDF-style salient terms per document: term frequency
    * within the doc × inverse document frequency across the corpus, top-3
    * per doc. The idf factor is kept RATIONAL (N·1e6 / df, floor) instead
    * of log-scaled so scoring is integer-exact and engine-independent —
    * the ranking is order-isomorphic to 1/df for fixed tf. Shape: one
    * explode → (doc, token) counts; document frequencies are a second
    * small aggregate broadcast back onto the term table; per-doc top-k by
    * window rank. The df side is |vocab|-sized — the broadcast dimension
    * — while the corpus-sized term table never reshuffles after its one
    * groupBy. [oracle]
    */
  def t12_tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    // ONE corpus exchange keyed hash(doc_id) (r15, guide §2.4): the tf
    // aggregate clusters on a superset of it, and the top-k heap + rank
    // window downstream cluster on doc_id itself, so all three ride this
    // exchange. The trade: repartitioning the RAW exploded tokens skips
    // the map-side partial tf reduction — A/B'd at two decades (min-of-2,
    // same hour): sf0.1 1.16→1.34 s (the lost partial agg) but sf1
    // 2.11→1.81 s (the saved exchanges grow with data) — the same
    // decade-divergence rule that rejected SHJ keeps the scale-winning
    // shape here.
    val terms = docs
      .select(col("doc_id"), explode(expr(TextOps.TOKENS)).as("token"))
      .repartition(col("doc_id"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df_ = terms.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("token").asc)
    val scored = terms
      .join(broadcast(df_), Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score", floor(col("tf") * col("n_docs") * 1000000L / col("df")).cast("long"))
    // k-selection via the native bounded-heap operator (no sort of the
    // full term table); the rank window touches only the survivors
    graft.plans.TopKPerGroup
      .topKPerGroup(scored, Seq("doc_id"), Seq(("score", false), ("token", true)), 3)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("doc_id", "rank", "token", "tf", "df", "score")
      .orderBy("doc_id", "rank")
  }

  val t12_oracle: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      |  FROM documents),
      |tf_t AS (SELECT doc_id, token, COUNT(*) AS tf FROM terms GROUP BY doc_id, token),
      |df_t AS (SELECT token, COUNT(*) AS df FROM tf_t GROUP BY token),
      |n_t AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, token, tf, df,
      |    CAST(floor(tf * n_docs * 1000000 / df) AS BIGINT) AS score
      |  FROM tf_t JOIN df_t USING (token) CROSS JOIN n_t),
      |ranked AS (
      |  SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score,
      |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS BIGINT) AS rank
      |  FROM scored)
      |SELECT doc_id, rank, token, tf, df, score
      |FROM ranked WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  val t11_oracle: String =
    """WITH grams AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |        FROM documents)
      |  WHERE len(toks) >= 3),
      |per_gram AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram)
      |SELECT doc_id,
      |  CAST(SUM(c) AS BIGINT) AS n_grams,
      |  COUNT(*) AS n_distinct_grams,
      |  CAST(MAX(c) AS BIGINT) AS max_gram_count,
      |  round(1.0 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 4) AS dup_fraction
      |FROM per_gram GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** p1_curation_funnel — the END-TO-END curation pipeline as one
    * checked operator: raw corpus → language-consistency filter (t1) →
    * quality filter (t2) → exact-dedup keepers (d1's contract) →
    * training-split decontamination (t9), emitting surviving docs +
    * tokens per stage — the attrition funnel every pretraining data
    * card reports. Each stage is an inner join of the survivor set
    * against a component operator's keep-set (semi-join shape at
    * 100 TB: only doc_id + token count flow between stages, never
    * text). Its oracle is literally composed from the component
    * oracles (t13's composition-proof pattern) — the stages agree as a
    * SYSTEM, not just individually. [oracle]
    */
  def p1_curation_funnel(spark: SparkSession, dir: String): DataFrame = {
    // ONE conditional-aggregation pass instead of five unioned
    // stage-aggregates (r14, guide §2.4): the old shape re-ran the
    // cumulative join chain per stage (s4's subtree contains s0..s3's),
    // scheduling 32 AQE jobs whose local floors dominated the entry and
    // whose repeated passes would each re-touch the corpus at 100 TB.
    // Here each component keep-set is LEFT-joined once as a boolean flag
    // (every keep-set carries doc_id at most once, so no fan-out), and
    // all five cumulative stage counts come out of a single aggregate —
    // stage i = rows where flags 1..i all hold, exactly the old inner
    // join chain's membership. The 5-row funnel is then a 1-row explode.
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"),
        expr(s"CAST(size(${TextOps.TOKENS}) AS BIGINT)").as("ntok"))
      .persistTracked
    val langOk = TextOps.t1_lang_id(spark, dir)
      .filter(col("lang_pred") === col("lang_declared")).select("doc_id")
    val qualOk = TextOps.t2_quality(spark, dir)
      .filter(col("quality") === 1).select("doc_id")
    val keepers = docs.groupBy("text").agg(min("doc_id").as("doc_id")).select("doc_id")
    val clean = t9_decontaminate(spark, dir)
      .filter(!col("contaminated")).select("doc_id")
    val flagged = docs.select("doc_id", "ntok")
      .join(langOk.withColumn("f1", lit(true)), Seq("doc_id"), "left")
      .join(qualOk.withColumn("f2", lit(true)), Seq("doc_id"), "left")
      .join(keepers.withColumn("f3", lit(true)), Seq("doc_id"), "left")
      .join(clean.withColumn("f4", lit(true)), Seq("doc_id"), "left")
      .select(col("ntok"),
        coalesce(col("f1"), lit(false)).as("k1"),
        coalesce(col("f1") && col("f2"), lit(false)).as("k2"),
        coalesce(col("f1") && col("f2") && col("f3"), lit(false)).as("k3"),
        coalesce(col("f1") && col("f2") && col("f3") && col("f4"), lit(false)).as("k4"))
    def stageAggs(i: Int, keep: org.apache.spark.sql.Column)
        : Seq[org.apache.spark.sql.Column] = Seq(
      count(when(keep, lit(1))).as(s"d$i"),
      coalesce(sum(when(keep, col("ntok"))), lit(0L)).cast("long").as(s"t$i"))
    val one = flagged.agg(
      count(lit(1)).as("d0"),
      (Seq(coalesce(sum(col("ntok")), lit(0L)).cast("long").as("t0")) ++
        stageAggs(1, col("k1")) ++ stageAggs(2, col("k2")) ++
        stageAggs(3, col("k3")) ++ stageAggs(4, col("k4"))): _*)
    val names = Seq("raw", "lang_match", "quality", "dedup_keeper", "train_decontam")
    one.select(explode(array(names.zipWithIndex.map { case (nm, i) =>
        struct(lit(i.toLong).as("stage"), lit(nm).as("name"),
          col(s"d$i").as("n_docs"), col(s"t$i").as("n_tokens"))
      }: _*)).as("s"))
      .select(col("s.stage").as("stage"), col("s.name").as("name"),
        col("s.n_docs").as("n_docs"), col("s.n_tokens").as("n_tokens"))
      .orderBy("stage")
  }

  lazy val p1_oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ntok
       |  FROM documents),
       |lang_ok AS (SELECT doc_id FROM (${TextOps.t1_oracle})
       |            WHERE lang_pred = lang_declared),
       |q_ok AS (SELECT doc_id FROM (${TextOps.t2_oracle}) WHERE quality = 1),
       |keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
       |clean AS (SELECT doc_id FROM ($t9_oracle) WHERE NOT contaminated),
       |s1 AS (SELECT d.* FROM d JOIN lang_ok USING (doc_id)),
       |s2 AS (SELECT s1.* FROM s1 JOIN q_ok USING (doc_id)),
       |s3 AS (SELECT s2.* FROM s2 JOIN keep USING (doc_id)),
       |s4 AS (SELECT s3.* FROM s3 JOIN clean USING (doc_id))
       |SELECT * FROM (
       |  SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS name,
       |    COUNT(*) AS n_docs, CAST(COALESCE(SUM(ntok), 0) AS BIGINT) AS n_tokens FROM d
       |  UNION ALL SELECT 1, 'lang_match', COUNT(*), CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM s1
       |  UNION ALL SELECT 2, 'quality', COUNT(*), CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM s2
       |  UNION ALL SELECT 3, 'dedup_keeper', COUNT(*), CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM s3
       |  UNION ALL SELECT 4, 'train_decontam', COUNT(*), CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM s4)
       |ORDER BY stage""".stripMargin

  /** t17_domain_mix — the corpus-mix table: per (source, lang) document
    * and whitespace-token counts plus each cell's integer-permille share
    * of all tokens (1000·cell DIV total — exact, engine-independent).
    * This is the table a pretraining run's sampling weights are
    * configured from, and the before/after evidence for t15's
    * rebalancing. One narrow scan → one groupBy; the grand total is a
    * 1-row broadcast, never a second corpus pass. [oracle]
    */
  def t17_domain_mix(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir).documents
      .select(col("source"), col("lang"),
        expr(s"size(${TextOps.TOKENS})").cast("long").as("toks"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("toks").cast("long").as("n_tokens"))
    // (r14 note: p2's whole-frame-window rewrite was A/B'd here and came
    // out slightly NEGATIVE (0.28 → 0.34 s min-of-2) — this single-level
    // shape's cells exchange is already reused at runtime, so the window
    // only added its own exchange. Kept as-is.)
    val total = cells.agg(sum("n_tokens").cast("long").as("total_tokens"))
    cells.crossJoin(broadcast(total))
      .withColumn("permille_tokens", expr("n_tokens * 1000L DIV total_tokens"))
      .select("source", "lang", "n_docs", "n_tokens", "permille_tokens")
      .orderBy("source", "lang")
  }

  val t17_oracle: String =
    """WITH cells AS (
      |  SELECT source, lang, COUNT(*) AS n_docs,
      |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source, lang),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM cells)
      |SELECT source, lang, n_docs, n_tokens,
      |  n_tokens * 1000 // total_tokens AS permille_tokens
      |FROM cells CROSS JOIN tot
      |ORDER BY source, lang""".stripMargin

  /** Per-stratum keep rates in permille for t15 (language rebalancing:
    * downsample the dominant language hard, keep the rest denser — the
    * standard corpus-mixing move). One source of truth for the Spark
    * CASE and the generated DuckDB CASE.
    */
  val StratRates: Seq[(String, Int)] =
    Seq("en" -> 200, "de" -> 500, "es" -> 500, "fr" -> 500, "zh" -> 800)

  /** t15_stratified_sample — DETERMINISTIC stratified sampling: keep a
    * row iff sha256(doc_id) mod 1000 < rate(stratum). Unlike
    * `df.sample()` the decision is a pure function of the row key, so
    * the sample is reproducible across runs, engines, retries, and
    * cluster sizes — what a training-data pipeline needs for auditable
    * mixes (and what makes the whole operator hash-checkable). Shape:
    * one narrow codegen'd scan, zero shuffles for the sample itself; the
    * per-stratum report is a tiny groupBy. A resample with new rates
    * rereads only the key column. [oracle]
    */
  def t15_stratified_sample(spark: SparkSession, dir: String): DataFrame = {
    val rateCase = StratRates
      .map { case (l, r) => s"WHEN '$l' THEN ${r}L" }
      .mkString("CASE lang ", " ", " ELSE 0L END")
    Tables(spark, dir).documents
      .withColumn("rate", expr(rateCase))
      .withColumn("ticket", pmod(
        graft.functions.HashExpressions.sha256PrefixLong(
          col("doc_id").cast("string"), 15), lit(1000L)))
      .filter(col("ticket") < col("rate"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_sampled"),
        sum("doc_id").cast("long").as("sum_doc_id"),
        min("ticket").as("min_ticket"),
        max("ticket").as("max_ticket"))
      .orderBy("lang")
  }

  val t15_oracle: String = {
    val rateCase = StratRates
      .map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString("CASE lang ", " ", " ELSE 0 END")
    s"""WITH ticketed AS (
       |  SELECT lang, doc_id,
       |    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS ticket,
       |    $rateCase AS rate
       |  FROM documents)
       |SELECT lang, COUNT(*) AS n_sampled,
       |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       |  MIN(ticket) AS min_ticket, MAX(ticket) AS max_ticket
       |FROM ticketed WHERE ticket < rate
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---- t20: RAG document chunking ------------------------------------
  private val CHUNK = 64 // tokens per chunk
  private val STRIDE = 48 // chunk start stride (16-token overlap)

  /** t20_chunk — overlapping token-window chunking, the universal RAG /
    * embedding-ingest front end: each document becomes
    * `1 + ceil(max(0, len-64)/48)` chunks of ≤ 64 whitespace tokens
    * starting every 48 (16-token overlap so no sentence is split across
    * a hard boundary without context). Chunk count, starts, and text are
    * pure integer arithmetic + array slicing, so the oracle reproduces
    * them byte-for-byte. Each chunk carries a stable global id
    * (doc_id·10⁴ + index — chunk counts are len/48 ≤ 10⁴ at any real
    * doc length) and a sha256-derived content fingerprint, the handle a
    * downstream embedding or dedup stage keys on.
    *
    * Scale shape: one narrow scan — tokenize, explode a `sequence` of
    * chunk INDICES (never the payload: `slice` on the kept token array
    * materializes each chunk once), zero shuffles. At 100 TB this is a
    * map-only stage that pipelines straight into the shard writer (t22)
    * or the embedding batcher (m-family). [oracle]
    */
  def t20_chunk(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).documents
      .select(col("doc_id"), expr(TextOps.TOKENS).as("toks"))
      .withColumn("n_chunks",
        expr(s"(greatest(size(toks) - $CHUNK, 0) + ${STRIDE - 1}) div $STRIDE + 1"))
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(0, cast(n_chunks - 1 as int))")).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * STRIDE + 1)
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("toks"), col("start_tok"), lit(CHUNK))))
      .select(
        (col("doc_id") * 10000L + col("chunk_idx")).as("chunk_id"),
        col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        expr(s"cast(size(slice(toks, start_tok, $CHUNK)) as bigint)").as("n_tokens"),
        graft.functions.HashExpressions.sha256PrefixLong(col("chunk_text"), 15)
          .as("chunk_fp"),
        col("chunk_text"))
      .orderBy("chunk_id")
  }

  val t20_oracle: String =
    s"""WITH toksd AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |counted AS (
       |  SELECT doc_id, toks,
       |    (greatest(len(toks) - $CHUNK, 0) + ${STRIDE - 1}) // $STRIDE + 1 AS n_chunks
       |  FROM toksd),
       |chunks AS (
       |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM counted),
       |built AS (
       |  SELECT doc_id, chunk_idx, chunk_idx * $STRIDE + 1 AS start_tok,
       |    array_to_string(toks[chunk_idx * $STRIDE + 1 : chunk_idx * $STRIDE + $CHUNK], ' ') AS chunk_text,
       |    len(toks[chunk_idx * $STRIDE + 1 : chunk_idx * $STRIDE + $CHUNK]) AS n_tok
       |  FROM chunks)
       |SELECT doc_id * 10000 + chunk_idx AS chunk_id, doc_id,
       |  CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(start_tok AS BIGINT) AS start_tok,
       |  CAST(n_tok AS BIGINT) AS n_tokens,
       |  ('0x' || substr(sha256(chunk_text), 1, 15))::BIGINT AS chunk_fp,
       |  chunk_text
       |FROM built ORDER BY chunk_id""".stripMargin

  // ---- t21: linear quality-classifier scoring ------------------------
  private val CLS_BUCKETS = 4096L
  private val CLS_WRANGE = 2001L // weights in [0, 2000], centered at 1000

  /** t21_classifier_score — fastText-style linear classifier scoring at
    * corpus scale: hash each token into one of 4096 buckets, look up a
    * per-bucket weight, and score the document by the token-frequency-
    * weighted mean. This is the shape of EVERY production quality /
    * toxicity / language-register filter that has to touch 100 TB — a
    * linear model over hashed bag-of-words features, evaluated as pure
    * per-row arithmetic (the model lives IN the expression; a real
    * deployment would broadcast a trained weight table keyed by the same
    * bucket ids). Weights here are sha-derived pseudo-weights so both
    * engines reproduce the exact integers end-to-end.
    *
    * Integer discipline: weights live in [0, 2000] (offset +1000) so
    * every division is over non-negative longs — Spark's `div`
    * truncates toward zero while DuckDB's `//` floors, and they only
    * agree on non-negatives; the 1000-offset is subtracted AFTER the
    * division, in fixed-point. Scale shape: tokenize + explode + one
    * (doc,bucket) aggregate that collapses straight back to per-doc —
    * one shuffle keyed by doc_id, weight lookup is expression-local.
    * [oracle]
    */
  def t21_classifier_score(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashExpressions.sha256PrefixLong
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), explode(expr(TextOps.TOKENS)).as("tok"))
      .withColumn("bucket", pmod(sha256PrefixLong(col("tok"), 8), lit(CLS_BUCKETS)))
      .withColumn("w",
        pmod(sha256PrefixLong(concat(lit("w"), col("bucket")), 8), lit(CLS_WRANGE)))
    toks.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      sum(col("w")).cast("long").as("wsum"))
      .withColumn("score_fp",
        expr("wsum * 1000000 div greatest(n_tokens, 1) - 1000000000"))
      .withColumn("keep", col("score_fp") > 0)
      .select("doc_id", "n_tokens", "score_fp", "keep")
      .orderBy("doc_id")
  }

  val t21_oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
       |  FROM documents),
       |feat AS (
       |  SELECT doc_id,
       |    ('0x' || substr(sha256(tok), 1, 8))::BIGINT % $CLS_BUCKETS AS bucket
       |  FROM toks),
       |weighted AS (
       |  SELECT doc_id,
       |    ('0x' || substr(sha256('w' || CAST(bucket AS VARCHAR)), 1, 8))::BIGINT % $CLS_WRANGE AS w
       |  FROM feat),
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(w) AS BIGINT) AS wsum
       |  FROM weighted GROUP BY doc_id)
       |SELECT doc_id, n_tokens,
       |  wsum * 1000000 // greatest(n_tokens, 1) - 1000000000 AS score_fp,
       |  (wsum * 1000000 // greatest(n_tokens, 1) - 1000000000) > 0 AS keep
       |FROM perdoc ORDER BY doc_id""".stripMargin

  // ---- t22: deterministic training-shard manifest --------------------
  private val SHARDS = 32L

  /** t22_shard_manifest — the manifest of a deterministic training-data
    * shard export: every document is assigned a shard by
    * sha256(doc_id) mod 32 (reproducible across runs, retries, engines,
    * and cluster sizes — t15's ticket discipline applied to placement),
    * and the manifest reports per-shard document count, whitespace-token
    * count, doc_id range, and a content checksum (sum of per-doc sha
    * fingerprints mod 10¹², order-independent so any partitioning
    * computes the same value). This is the data-card artifact a 100 TB
    * export job publishes next to its files; the actual file write is
    * `df.write.partitionBy("shard")` with this exact shard column
    * (sources/Sources.scala's dynamic-overwrite discipline).
    *
    * Scale shape: one narrow scan (hash + token count per row) + one
    * 32-group aggregate with map-side partials — no shuffle wider than
    * 32 keys. [oracle]
    */
  def t22_shard_manifest(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashExpressions.sha256PrefixLong
    Tables(spark, dir).documents
      .select(
        pmod(sha256PrefixLong(col("doc_id").cast("string"), 15), lit(SHARDS))
          .as("shard"),
        col("doc_id"),
        expr(s"cast(size(${TextOps.TOKENS}) as bigint)").as("ntok"),
        pmod(sha256PrefixLong(col("text"), 15), lit(1000000000000L)).as("fp"))
      .groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum("ntok").cast("long").as("n_tokens"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"),
        sum("fp").cast("long").as("checksum"))
      .orderBy("shard")
  }

  /** t23_substring_decontam — the exact-substring upgrade of t9's
    * any-5-gram test (Lee et al. 2022's dedup/decontamination insight:
    * SPAN length matters — one shared 5-gram is noise, a 50-token run
    * is a leaked benchmark item). For each train doc, positional
    * 5-grams matching the held-out split's gram set become match
    * POSITIONS; the longest CONSECUTIVE position run (gaps-and-islands:
    * island = pos − row_number over pos) gives the longest shared
    * token span = run + 4. `contaminated_span` flags spans ≥ 12 tokens
    * — the strict verdict t9's single-gram flag over-reads.
    *
    * Scale shape: t9's discipline — the eval gram set broadcasts, the
    * corpus is one narrow scan + positional explode; only MATCHING
    * rows (sparse: contaminated docs) reach the doc_id-partitioned
    * island window, never the corpus. [oracle]
    */
  def t23_substring_decontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .withColumn("toks", expr(TextOps.TOKENS))
    val posGrams = docs.filter(size(col("toks")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 4), " +
          "i -> struct(i AS pos, concat_ws(' ', slice(toks, i, 5)) AS gram))")).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.gram").as("gram"))
    val eval_ = posGrams.filter(col("doc_id") % 100 >= 90)
      .select("gram").distinct()
    val matches = posGrams.filter(col("doc_id") % 100 < 80)
      .join(broadcast(eval_), Seq("gram"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val runs = matches
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy("doc_id", "island").agg(count(lit(1)).as("run"))
      .groupBy("doc_id").agg(
        sum("run").cast("long").as("n_matched_grams"),
        (max("run") + 4).cast("long").as("longest_span"))
    docs.filter(col("doc_id") % 100 < 80).select("doc_id")
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matched_grams"), lit(0L)).as("n_matched_grams"),
        coalesce(col("longest_span"), lit(0L)).as("longest_span"),
        coalesce(col("longest_span") >= 12, lit(false)).as("contaminated_span"))
      .orderBy("doc_id")
  }

  val t23_oracle: String =
    """WITH toksd AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |pg AS (
      |  SELECT doc_id, unnest(range(1, len(toks) - 3)) AS pos, toks
      |  FROM toksd WHERE len(toks) >= 5),
      |grams AS (
      |  SELECT doc_id, pos,
      |    toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] || ' ' ||
      |    toks[pos+3] || ' ' || toks[pos+4] AS gram
      |  FROM pg),
      |ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 100 >= 90),
      |m AS (
      |  SELECT doc_id, pos FROM grams JOIN ev USING (gram)
      |  WHERE doc_id % 100 < 80),
      |runs AS (
      |  SELECT doc_id,
      |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM m),
      |islands AS (
      |  SELECT doc_id, island, COUNT(*) AS run FROM runs GROUP BY doc_id, island),
      |agged AS (
      |  SELECT doc_id, CAST(SUM(run) AS BIGINT) AS n_matched_grams,
      |    CAST(MAX(run) + 4 AS BIGINT) AS longest_span
      |  FROM islands GROUP BY doc_id)
      |SELECT d.doc_id,
      |  COALESCE(a.n_matched_grams, 0) AS n_matched_grams,
      |  COALESCE(a.longest_span, 0) AS longest_span,
      |  COALESCE(a.longest_span >= 12, false) AS contaminated_span
      |FROM documents d LEFT JOIN agged a ON d.doc_id = a.doc_id
      |WHERE d.doc_id % 100 < 80
      |ORDER BY d.doc_id""".stripMargin

  val t22_oracle: String =
    s"""WITH assigned AS (
       |  SELECT
       |    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $SHARDS AS shard,
       |    doc_id,
       |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS ntok,
       |    ('0x' || substr(sha256(text), 1, 15))::BIGINT % 1000000000000 AS fp
       |  FROM documents)
       |SELECT shard, COUNT(*) AS n_docs,
       |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
       |  CAST(SUM(fp) AS BIGINT) AS checksum
       |FROM assigned GROUP BY shard ORDER BY shard""".stripMargin

  /** p2_mix_apply — APPLY a target corpus mix (t17 measures the mix,
    * this operator enforces one): given a uniform target token share
    * per source (1000 DIV n_sources permille — the rebalance-everything
    * default), compute the largest achievable downsample-only plan and
    * execute it with t15's deterministic sha-ticket sampling. Integer
    * plan arithmetic throughout:
    *
    *   cap_s    = tokens_s·1000 DIV target   (budget each source supports)
    *   budget   = min_s cap_s                (downsampling can only shrink)
    *   rate_s   = (budget·target DIV 1000)·1000 DIV tokens_s   (permille)
    *   keep doc ⇔ sha256('mix:'‖doc_id) mod 1000 < rate_s
    *
    * The salted ticket keeps this sample independent of t15's, and the
    * pure-function keep decision is reproducible across runs, engines,
    * retries, and cluster sizes. Emits the per-source plan + achieved
    * mix — the before/after evidence a data card quotes.
    *
    * Scale shape: one narrow scan builds the compact (doc_id, source,
    * toks, ticket) frame (persisted — stats pass + sample pass); the
    * plan is an n_sources-row broadcast; the sample is a broadcast-join
    * filter, zero corpus shuffles beyond the two tiny aggregates.
    * [oracle]
    */
  def p2_mix_apply(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        expr(s"size(${TextOps.TOKENS})").cast("long").as("toks"),
        pmod(graft.functions.HashExpressions.sha256PrefixLong(
          concat(lit("mix:"), col("doc_id").cast("string")), 15), lit(1000L)).as("ticket"))
      .persistTracked
    val cells = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("toks").cast("long").as("n_tokens"))
    // The frame-level scalars (n_src, min cap, total kept) ride
    // whole-frame WINDOWS over the n_sources-row plan instead of a
    // crossJoin(broadcast(agg)) lattice that re-derived the cells
    // subtree at every level (r14: 25 planned exchanges → 6, 33
    // scheduled jobs → ~8; arithmetic unchanged, oracle identical).
    // A single-partition window over O(sources) rows is safe at any
    // corpus size — source count is configuration-bounded.
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rates = cells
      .withColumn("n_src", count(lit(1)).over(wAll))
      .withColumn("target_pm", expr("1000L DIV n_src"))
      .withColumn("cap", expr("n_tokens * 1000L DIV target_pm"))
      .withColumn("budget", min("cap").over(wAll))
      .withColumn("rate_pm", least(lit(1000L),
        expr("(budget * target_pm DIV 1000L) * 1000L DIV n_tokens")))
      .select("source", "n_docs", "n_tokens", "target_pm", "rate_pm")
    val kept = docs
      .join(broadcast(rates.select("source", "rate_pm")), Seq("source"))
      .filter(col("ticket") < col("rate_pm"))
      .groupBy("source")
      .agg(count(lit(1)).as("kept_docs"), sum("toks").cast("long").as("kept_tokens"))
    // Σ kept_tokens over the left join (sum skips the NULLs of absent
    // sources) ≡ the old kept.agg(sum) — including NULL when NOTHING was
    // kept, so achieved_pm degrades to NULL exactly as before instead of
    // an ANSI division-by-zero
    rates.join(kept, Seq("source"), "left")
      .withColumn("total_kept", sum(col("kept_tokens")).over(wAll).cast("long"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("target_pm"), col("rate_pm"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        expr("coalesce(kept_tokens, 0L) * 1000L DIV total_kept").as("achieved_pm"))
      .orderBy("source")
  }

  /** DuckDB mirror of p2: identical integer plan + salted sha tickets. */
  val p2_oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS toks,
      |    ('0x' || substr(sha256('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS ticket
      |  FROM documents),
      |cells AS (
      |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens
      |  FROM d GROUP BY source),
      |plan AS (
      |  SELECT source, n_docs, n_tokens,
      |    1000 // (SELECT COUNT(*) FROM cells) AS target_pm,
      |    n_tokens * 1000 // (1000 // (SELECT COUNT(*) FROM cells)) AS cap
      |  FROM cells),
      |rates AS (
      |  SELECT source, n_docs, n_tokens, target_pm,
      |    LEAST(1000, ((SELECT MIN(cap) FROM plan) * target_pm // 1000) * 1000 // n_tokens) AS rate_pm
      |  FROM plan),
      |kept AS (
      |  SELECT d.source, COUNT(*) AS kept_docs, CAST(SUM(d.toks) AS BIGINT) AS kept_tokens
      |  FROM d JOIN rates r ON r.source = d.source
      |  WHERE d.ticket < r.rate_pm GROUP BY d.source)
      |SELECT r.source, r.n_docs, r.n_tokens, r.target_pm, r.rate_pm,
      |  CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs,
      |  CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
      |  COALESCE(k.kept_tokens, 0) * 1000 // (SELECT CAST(SUM(kept_tokens) AS BIGINT) FROM kept) AS achieved_pm
      |FROM rates r LEFT JOIN kept k ON k.source = r.source
      |ORDER BY r.source""".stripMargin

  /** t26_wordpiece — greedy longest-match subword tokenization (the
    * WordPiece/BPE APPLICATION pass every LLM pipeline runs to turn
    * word counts into real token counts). The vocabulary is derived
    * from the corpus itself, deterministically in both engines:
    *
    *   - every single character (the coverage guarantee — greedy match
    *     can always advance, no [UNK] dead-ends);
    *   - 2–4-char substrings with frequency-weighted occurrence count
    *     ≥ max(20, corpus_tokens/250) (d4's corpus-scaled cap);
    *   - whole words of length ≥ 5 above the same count.
    *
    * Segmentation is greedy longest-match: at each position try the
    * whole remaining word (position 1 only), then lengths 4..1.
    *
    * The 100 TB shape is the real production trick: tokenization is a
    * pure function of the WORD, so everything runs on the DISTINCT-WORD
    * table (orders of magnitude smaller than the corpus) and results
    * join back by word — here the word counts are carried through
    * directly. The greedy walk itself is a pair of narrow higher-order
    * `aggregate`s over a per-word position→best-piece map (built by one
    * small groupBy) — an integer-only length(word)-step counting pass
    * (exact: every piece advances ≥1 char, so no word can outrun the
    * bound and pieces always cover the word) then an exactly-n_pieces-
    * step array build — no iterative joins, no UDF. Both engines
    * execute the identical bounded recurrence (DuckDB: a recursive CTE
    * with the same per-word len(word) bound over the same best-piece
    * table), so the segmentation is hash-exact. [oracle]
    */
  def t26_wordpiece(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables(spark, dir).documents
      .select(explode(expr(TextOps.TOKENS)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcount"))
      .persistTracked
    wordpieceFromWords(words).orderBy("word")
  }

  /** The vocabulary derivation + greedy walk over a distinct-word
    * (word, wcount) frame — shared by t26 (which adds the ORDER BY) and
    * t29 (which joins n_pieces back to (lang, word) counts, so handing
    * it a words frame derived from ITS aggregate tokenizes the corpus
    * once instead of twice).
    *
    * Partitioning discipline (r15): `words` comes out of a groupBy(word)
    * so it arrives hash(word)-partitioned, and every aggregation in the
    * walk keys on word or a superset of it — (word, pos), then (word) —
    * so the whole segmentation rides that ONE exchange; the vocab join
    * is an explicit broadcast (the vocab is frequency-capped at ≲250
    * pieces per length class + the charset + ≤250 whole words at ANY
    * corpus size — guide §3.1's "you know a side is small").
    */
  private def wordpieceFromWords(words: DataFrame): DataFrame = {
    val totK = words.agg(
      expr("greatest(20L, coalesce(sum(wcount), 0L) DIV 250L)").as("k"))

    // chars + counted substrings FUSED (r14's top deferral): one explode
    // over lengths 1..4 and one aggregate instead of two passes and
    // three aggregates. The sets are identical to the old derivation:
    // an l-char piece is only generated at explode length l, so 1-char
    // pieces (kept unconditionally — the coverage guarantee) and the
    // count-thresholded 2-4-char pieces have exactly the old counts.
    val short = words
      .select(col("word"), col("wcount"),
        explode(expr("sequence(1, length(word))")).as("i"))
      .select(col("word"), col("wcount"), col("i"),
        explode(expr("array(1, 2, 3, 4)")).as("l"))
      .filter(expr("i + l - 1 <= length(word)"))
      .select(expr("substr(word, i, l)").as("piece"), col("wcount"))
      .groupBy("piece").agg(sum("wcount").cast("long").as("c"))
      .crossJoin(broadcast(totK))
      .filter(expr("length(piece) = 1 OR c >= k"))
      .select("piece")
    val wholes = words.crossJoin(broadcast(totK))
      .filter(expr("length(word) >= 5 AND wcount >= k"))
      .select(col("word").as("piece"))
    // short pieces have length ≤ 4 and whole-word pieces ≥ 5: the legs
    // are disjoint and each internally distinct, so the union needs no
    // dedup exchange — same SET the old union().distinct() produced.
    val vocab = short.union(wholes)

    // best (longest vocab-matching) piece per (word, position): whole
    // remaining word competes only at position 1, then lengths 4..1;
    // the single-char rows guarantee a match at EVERY position
    val cand = words
      .select(col("word"), col("wcount"),
        explode(expr("sequence(1, length(word))")).as("pos"))
      .select(col("word"), col("wcount"), col("pos"), explode(expr(
        "CASE WHEN pos = 1 THEN array(length(word), 4, 3, 2, 1) " +
          "ELSE array(4, 3, 2, 1) END")).as("l"))
      .filter(expr("pos + l - 1 <= length(word)"))
      .select(col("word"), col("wcount"), col("pos"), col("l"),
        expr("substr(word, pos, l)").as("piece"))
    // wcount rides the aggregates (constant per word, so first() is
    // deterministic) — the old words⋈maps join back for it is gone
    val best = cand.join(broadcast(vocab), Seq("piece"))
      .groupBy("word", "pos")
      .agg(max("l").as("l"), first("wcount").as("wcount"))
      .withColumn("p", expr("substr(word, pos, l)"))

    // per-word position→(len, piece) map, then the greedy walk as TWO
    // bounded folds. Walk 1 is integer-only (pos, n) over length(word)
    // steps — exact bound, every piece advances ≥1 char, the IF keeps
    // finished words inert and copies nothing. Walk 2 re-runs the walk
    // for EXACTLY n_pieces steps (no IF needed) appending piece
    // references to an array, joined once by concat_ws at the end.
    // The old single fold concatenated the growing pieces string every
    // step — O(len²) character copying per word, which dominated the
    // r9 bench once the bound became the exact length(word); the split
    // keeps the long-word steps integer-cheap and bounds the array
    // walk by the (usually tiny) piece count instead.
    best.groupBy("word")
      .agg(first("wcount").as("wcount"),
        map_from_entries(collect_list(
          struct(col("pos"), struct(col("l"), col("p"))))).as("m"))
      .withColumn("n_pieces", expr(
        """aggregate(sequence(1, length(word)),
          |  named_struct('pos', 1, 'n', CAST(0 AS BIGINT)),
          |  (acc, step) -> IF(acc.pos > length(word), acc,
          |    named_struct('pos', acc.pos + element_at(m, acc.pos).l,
          |                 'n', acc.n + 1)),
          |  acc -> acc.n)""".stripMargin))
      .withColumn("pieces", expr(
        """concat_ws('|', aggregate(sequence(1, CAST(n_pieces AS INT)),
          |  named_struct('pos', 1, 'arr', CAST(array() AS ARRAY<STRING>)),
          |  (acc, step) -> named_struct(
          |    'pos', acc.pos + element_at(m, acc.pos).l,
          |    'arr', array_append(acc.arr, element_at(m, acc.pos).p)),
          |  acc -> acc.arr))""".stripMargin))
      .select(col("word"), col("wcount"), col("n_pieces"), col("pieces"))
  }

  /** DuckDB mirror of t26: identical vocabulary derivation and
    * best-piece table; the greedy walk is the same per-word
    * len(word)-bounded recurrence as a recursive CTE.
    */
  val t26_oracle: String =
    """WITH RECURSIVE
      |w AS MATERIALIZED (
      |  SELECT tok AS word, COUNT(*) AS wcount FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |    FROM documents)
      |  GROUP BY tok),
      |kk AS (SELECT GREATEST(20, CAST(COALESCE(SUM(wcount), 0) AS BIGINT) // 250) AS k FROM w),
      |chars AS (
      |  SELECT DISTINCT substr(word, i, 1) AS piece
      |  FROM w, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i)),
      |subs AS (
      |  SELECT substr(word, i, l) AS piece, CAST(SUM(wcount) AS BIGINT) AS c
      |  FROM w,
      |    LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i),
      |    LATERAL (SELECT unnest([2, 3, 4]) AS l)
      |  WHERE i + l - 1 <= len(word)
      |  GROUP BY piece),
      |vocab AS MATERIALIZED (
      |  SELECT DISTINCT piece FROM (
      |    SELECT piece FROM chars
      |    UNION ALL
      |    SELECT piece FROM subs WHERE c >= (SELECT k FROM kk)
      |    UNION ALL
      |    SELECT word FROM w WHERE len(word) >= 5 AND wcount >= (SELECT k FROM kk))),
      |cand AS (
      |  SELECT word, pos, l, substr(word, pos, l) AS piece FROM (
      |    SELECT w.word, i AS pos, u.l
      |    FROM w,
      |      LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i),
      |      LATERAL (SELECT unnest(CASE WHEN i = 1
      |        THEN [len(word), 4, 3, 2, 1] ELSE [4, 3, 2, 1] END) AS l) u)
      |  WHERE pos + l - 1 <= len(word)),
      |bestp AS MATERIALIZED (
      |  SELECT word, pos, MAX(l) AS l,
      |    substr(word, pos, MAX(l)) AS p
      |  FROM cand JOIN vocab USING (piece)
      |  GROUP BY word, pos),
      |seg AS (
      |  SELECT 0 AS iter, word, CAST(1 AS INTEGER) AS pos,
      |    '' AS pieces, CAST(0 AS BIGINT) AS n
      |  FROM w
      |  UNION ALL
      |  SELECT s.iter + 1, s.word,
      |    CASE WHEN s.pos > len(s.word) THEN s.pos
      |         ELSE s.pos + CAST(b.l AS INTEGER) END,
      |    CASE WHEN s.pos > len(s.word) THEN s.pieces
      |         WHEN s.n = 0 THEN b.p
      |         ELSE s.pieces || '|' || b.p END,
      |    CASE WHEN s.pos > len(s.word) THEN s.n ELSE s.n + 1 END
      |  FROM seg s LEFT JOIN bestp b ON b.word = s.word AND b.pos = s.pos
      |  WHERE s.iter < len(s.word))
      |SELECT s.word, w.wcount, s.n AS n_pieces, s.pieces
      |FROM seg s JOIN w USING (word)
      |WHERE s.iter = len(s.word)
      |ORDER BY s.word""".stripMargin

  /** t29_fertility — tokenizer FERTILITY report per language (the
    * standard multilingual tokenizer-eval metric: mean subword pieces
    * per word instance — fertility ≫ 1 for a language means the vocab
    * under-serves it and its documents pay more sequence length per
    * word): t26's greedy segmentation supplies pieces-per-distinct-word,
    * a (lang, word) count table weights it back to word INSTANCES, and
    * the per-lang rollup emits instance counts, vocab size, fertility
    * in permille, and the single-piece share (words the vocab covers
    * whole). Integer-exact throughout. Scale shape: both legs run on
    * word-granularity tables (t26's distinct-word discipline); the join
    * is vocab-sized, never corpus-sized. [oracle]
    */
  def t29_fertility(spark: SparkSession, dir: String): DataFrame = {
    // shares wordpieceFromWords with t26 (fused vocab, exchange-riding
    // walk, no ORDER BY under the join). A "tokenize once" variant that
    // derived words as the lang-marginal of the (lang, word) counts was
    // A/B'd at sf1 and came out ~30% SLOWER min-of-4 (the extra
    // marginal exchange + double persist cost more than the saved
    // tokenize pass at this shape) — words keeps its direct derivation.
    val words = Tables(spark, dir).documents
      .select(explode(expr(TextOps.TOKENS)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcount"))
      .persistTracked
    val wp = wordpieceFromWords(words).select("word", "n_pieces")
    val lw = Tables(spark, dir).documents
      .select(col("lang"), explode(expr(TextOps.TOKENS)).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("c"))
    lw.join(wp, Seq("word"))
      .groupBy("lang")
      .agg(
        sum("c").cast("long").as("n_words"),
        countDistinct("word").as("n_vocab"),
        sum(expr("c * n_pieces")).cast("long").as("n_pieces_total"),
        sum(when(col("n_pieces") === 1L, col("c")).otherwise(lit(0L)))
          .cast("long").as("n_single"))
      .withColumn("fertility_permille",
        expr("n_pieces_total * 1000L DIV n_words"))
      .withColumn("single_piece_permille",
        expr("n_single * 1000L DIV n_words"))
      .orderBy("lang")
  }

  /** DuckDB mirror of t29: t26's recursive segmentation as a CTE + the
    * same instance-weighted rollup.
    */
  lazy val t29_oracle: String =
    s"""WITH wp AS ($t26_oracle),
       |lw AS (
       |  SELECT lang, tok AS word, COUNT(*) AS c FROM (
       |    SELECT lang,
       |      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
       |    FROM documents)
       |  GROUP BY lang, tok)
       |SELECT lang,
       |  CAST(SUM(c) AS BIGINT) AS n_words,
       |  COUNT(DISTINCT word) AS n_vocab,
       |  CAST(SUM(c * n_pieces) AS BIGINT) AS n_pieces_total,
       |  CAST(SUM(CASE WHEN n_pieces = 1 THEN c ELSE 0 END) AS BIGINT)
       |    AS n_single,
       |  CAST(SUM(c * n_pieces) AS BIGINT) * 1000 // CAST(SUM(c) AS BIGINT)
       |    AS fertility_permille,
       |  CAST(SUM(CASE WHEN n_pieces = 1 THEN c ELSE 0 END) AS BIGINT) * 1000
       |    // CAST(SUM(c) AS BIGINT) AS single_piece_permille
       |FROM lw JOIN wp USING (word)
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- p3

  /** p3_temperature_mix — the temperature-scaled sampling PLAN (p2
    * enforces a uniform downsample-only target; this computes the
    * rebalance a multilingual/multi-source run actually trains with):
    * source s gets sampling share q_s ∝ p_s^α at α = 1/2, the
    * low-resource-upweighting exponent family of mBERT/XLM-R. α = 1/2
    * is deliberate: q_s reduces to √tokens_s, and floor(√n) is exact
    * integer arithmetic in every engine (IEEE sqrt is correctly
    * rounded), so the whole plan — shares, target tokens, repetition
    * epochs — is engine-reproducible without a single irrational pow().
    *
    *   w_s        = floor(sqrt(tokens_s))
    *   target_pm  = w_s·1000 DIV Σw            (permille share)
    *   target_tok = budget·w_s DIV Σw          (budget = Σ tokens: re-mix, same total)
    *   epochs_bp  = target_tok·10000 DIV tokens_s  (>10000 ⇒ source repeats)
    *
    * Scale shape: one narrow scan → n_sources-row aggregate; everything
    * after is arithmetic on that broadcast-sized frame. The output is
    * the data-card mix table; applying it is p2's ticket sampler with
    * rate = epochs capped at 1000‰ (upsampling replicates epochs).
    * [oracle]
    */
  def p3_temperature_mix(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir).documents
      .select(col("source"), expr(s"size(${TextOps.TOKENS})").cast("long").as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("toks").cast("long").as("n_tokens"))
      .withColumn("wgt", expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)"))
    // frame-level totals as whole-frame windows over the n_sources-row
    // cells (p2's r14 rewrite): the crossJoin(broadcast(agg)) shape ran
    // the corpus aggregate subtree twice
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    cells
      .withColumn("wsum", sum("wgt").over(wAll).cast("long"))
      .withColumn("budget", sum("n_tokens").over(wAll).cast("long"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000L DIV budget").as("natural_pm"),
        expr("wgt * 1000L DIV wsum").as("target_pm"),
        expr("budget * wgt DIV wsum").as("target_tokens"),
        expr("(budget * wgt DIV wsum) * 10000L DIV n_tokens").as("epochs_bp"))
      .orderBy("source")
  }

  /** DuckDB mirror of p3: identical integer plan off floor(sqrt(tokens)). */
  val p3_oracle: String =
    """WITH cells AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS wgt FROM cells),
      |tot AS (SELECT CAST(SUM(wgt) AS BIGINT) AS wsum,
      |               CAST(SUM(n_tokens) AS BIGINT) AS budget FROM w)
      |SELECT source, n_docs, n_tokens,
      |  n_tokens * 1000 // budget AS natural_pm,
      |  wgt * 1000 // wsum AS target_pm,
      |  budget * wgt // wsum AS target_tokens,
      |  (budget * wgt // wsum) * 10000 // n_tokens AS epochs_bp
      |FROM w, tot ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p4

  /** p4_anneal_mix — TWO-PHASE mix plan (p3 is a single-phase
    * temperature rebalance; this is the pretrain→anneal schedule
    * mid-training runs actually follow): phase 1 ("pretrain", 9/10 of
    * the token budget) samples sources at their natural share; phase 2
    * ("anneal", the final 1/10) restricts to quality-gated documents —
    * t19's Gopher-rule keep bit — and samples sources by their
    * HIGH-QUALITY token mass, upweighting clean sources exactly when
    * the schedule says quality matters most. All arithmetic is integer
    * DIV off exact token counts, so the plan is engine-reproducible;
    * `anneal_epochs_bp` > 10000 flags sources whose clean slice must
    * repeat during the anneal.
    *
    * Scale shape: t19's flags come from one narrow scan (per-doc rule
    * bits, no shuffle), then ONE n_sources-row aggregate and broadcast
    * arithmetic — the corpus is never shuffled; the apply step is p2's
    * ticket sampler per phase. [oracle]
    */
  def p4_anneal_mix(spark: SparkSession, dir: String): DataFrame = {
    val flags = TextOps.t19_gopher_rules(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("keep"))
    val cells = Tables(spark, dir).documents.select("doc_id", "source")
      .join(flags, Seq("doc_id"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"),
        sum(expr("n_tokens * keep")).cast("long").as("n_hq_tokens"))
    // frame-level totals as whole-frame windows (p2's r14 rewrite): the
    // crossJoin(broadcast(agg)) shape ran the cells subtree — and its
    // t19-join corpus pass — twice
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    cells
      .withColumn("tot", sum("n_tokens").over(wAll).cast("long"))
      .withColumn("tot_hq", sum("n_hq_tokens").over(wAll).cast("long"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_hq_tokens"),
        expr("(tot * 9L DIV 10L) * n_tokens DIV tot").as("pretrain_tokens"),
        expr("(tot DIV 10L) * n_hq_tokens DIV tot_hq").as("anneal_tokens"),
        expr("CASE WHEN n_hq_tokens = 0L THEN 0L ELSE " +
          "(tot DIV 10L) * n_hq_tokens DIV tot_hq * 10000L DIV n_hq_tokens END")
          .as("anneal_epochs_bp"))
      .orderBy("source")
  }

  /** DuckDB mirror of p4: t19's oracle (verbatim, as a CTE) supplies the
    * keep bits; the phase arithmetic is the same integer DIV plan.
    */
  lazy val p4_oracle: String =
    s"""WITH t19 AS (${TextOps.t19_oracle}),
       |cells AS (
       |  SELECT d.source, COUNT(*) AS n_docs,
       |    CAST(SUM(f.n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(SUM(f.n_tokens * f.keep) AS BIGINT) AS n_hq_tokens
       |  FROM documents d JOIN t19 f ON d.doc_id = f.doc_id
       |  GROUP BY d.source),
       |tot AS (
       |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
       |         CAST(SUM(n_hq_tokens) AS BIGINT) AS tot_hq FROM cells)
       |SELECT source, n_docs, n_tokens, n_hq_tokens,
       |  (tot * 9 // 10) * n_tokens // tot AS pretrain_tokens,
       |  (tot // 10) * n_hq_tokens // tot_hq AS anneal_tokens,
       |  CASE WHEN n_hq_tokens = 0 THEN 0
       |       ELSE (tot // 10) * n_hq_tokens // tot_hq * 10000 // n_hq_tokens
       |  END AS anneal_epochs_bp
       |FROM cells, tot ORDER BY source""".stripMargin

  /** p5_curriculum — curriculum ordering + deterministic global
    * shuffle: score every document's DIFFICULTY as its mean token
    * rarity (rarity = 1e6 DIV corpus term count — rare vocabulary ⇒
    * harder text; the t12 df-join class of vocabulary-sized join),
    * split the corpus into four curriculum phases at the exact
    * difficulty quartiles (a 1-row broadcast cut, t24's discipline),
    * and assign each doc a sha-derived `shuffle_key` — the
    * deterministic stand-in for "shuffle the corpus globally": sorting
    * by (phase, shuffle_key) IS the easy-to-hard training order with
    * uniform within-phase shuffling, reproducible across runs and
    * engines. No global window anywhere: the order is carried as a sort
    * KEY, never materialized as a rank (a row_number over the corpus
    * would be a single-partition window at 100 TB; writers sort by the
    * key instead — composes with t22's sharded manifest). [oracle]
    */
  def p5_curriculum(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashExpressions.sha256PrefixLong
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), explode(expr(graft.ops.TextOps.TOKENS)).as("tok"))
      .persistTracked
    val tf = toks.groupBy("tok").agg(count(lit(1)).as("c_tok"))
    val scored = toks.join(tf, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(expr("1000000L DIV c_tok")).cast("long").as("rsum"))
      .withColumn("difficulty_fp", expr("rsum DIV n_tokens"))
    val cuts = scored.agg(
      expr("percentile(difficulty_fp, 0.25d)").as("c1"),
      expr("percentile(difficulty_fp, 0.50d)").as("c2"),
      expr("percentile(difficulty_fp, 0.75d)").as("c3"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("phase",
        when(col("difficulty_fp") <= col("c1"), lit(0L))
          .when(col("difficulty_fp") <= col("c2"), lit(1L))
          .when(col("difficulty_fp") <= col("c3"), lit(2L))
          .otherwise(lit(3L)))
      .withColumn("shuffle_key",
        sha256PrefixLong(concat(lit("shuf"), col("doc_id").cast("string")), 12))
      .select("doc_id", "n_tokens", "difficulty_fp", "phase", "shuffle_key")
      .orderBy("doc_id")
  }

  /** DuckDB mirror of p5: same rarity sum, quartile cuts, and sha key. */
  val p5_oracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      |  FROM documents),
      |tf AS (SELECT tok, COUNT(*) AS c_tok FROM toks GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    CAST(SUM(1000000 // c_tok) AS BIGINT) AS rsum
      |  FROM toks JOIN tf USING (tok) GROUP BY 1),
      |d AS (
      |  SELECT doc_id, n_tokens, rsum // n_tokens AS difficulty_fp
      |  FROM scored),
      |cuts AS (
      |  SELECT quantile_cont(difficulty_fp, 0.25) AS c1,
      |         quantile_cont(difficulty_fp, 0.50) AS c2,
      |         quantile_cont(difficulty_fp, 0.75) AS c3
      |  FROM d)
      |SELECT doc_id, n_tokens, difficulty_fp,
      |  CAST(CASE WHEN difficulty_fp <= c1 THEN 0
      |            WHEN difficulty_fp <= c2 THEN 1
      |            WHEN difficulty_fp <= c3 THEN 2
      |            ELSE 3 END AS BIGINT) AS phase,
      |  ('0x' || substr(sha256('shuf' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
      |    AS shuffle_key
      |FROM d CROSS JOIN cuts
      |ORDER BY doc_id""".stripMargin

  private val DSIR_BUCKETS = 512L

  /** t28_dsir — Data Selection via Importance Resampling (the DSIR
    * recipe of Xie et al. 2023, arXiv:2302.03169) in fixed-point
    * integers: hash every token into 512 feature buckets, estimate a
    * TARGET distribution from the designated target sample (docs with
    * doc_id % 13 = 0 — the "looks like my eval/domain data" reference
    * set) and the RAW distribution from the whole corpus, weight each
    * bucket by the add-one-smoothed ratio (c_target+1)·1e6 DIV
    * (c_raw+1) — the fixed-point surrogate of DSIR's log-likelihood
    * ratio, monotone in it per bucket — and score each document by its
    * mean token-bucket weight. Selection = score ≥ the per-source mean
    * score (an integer threshold from a |sources|-row aggregate).
    *
    * Scale shape: the bucket-weight table is BOUNDED at 512 rows
    * (broadcast — never a vocabulary-sized join), the corpus is scanned
    * twice (count pass, score pass — both partial-aggregate to
    * doc/bucket granularity), and the per-source threshold is a 20-row
    * broadcast, NOT a per-source window over the corpus (window-by-
    * source is a skew trap at 20 sources × 100 TB). All arithmetic is
    * integer, so the scores hash-match cross-engine. [oracle]
    */
  def t28_dsir(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashExpressions.sha256PrefixLong
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        explode(expr(graft.ops.TextOps.TOKENS)).as("tok"))
      .withColumn("bucket", pmod(sha256PrefixLong(col("tok"), 8), lit(DSIR_BUCKETS)))
      .select("doc_id", "source", "bucket")
      .persistTracked
    val raw = toks.groupBy("bucket").agg(count(lit(1)).as("c_raw"))
    val tgt = toks.filter(col("doc_id") % 13 === 0)
      .groupBy("bucket").agg(count(lit(1)).as("c_tgt"))
    val weights = raw.join(tgt, Seq("bucket"), "left").select(col("bucket"),
      expr("(coalesce(c_tgt, 0L) + 1L) * 1000000L DIV (c_raw + 1L)").as("w"))
    val scored = toks.join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tokens"), sum("w").cast("long").as("wsum"))
      .withColumn("score_fp", expr("wsum DIV n_tokens"))
    val thr = scored.groupBy("source")
      .agg(expr("sum(score_fp) DIV count(1)").as("thr"))
    scored.join(broadcast(thr), Seq("source"))
      .withColumn("selected", col("score_fp") >= col("thr"))
      .select("doc_id", "source", "n_tokens", "score_fp", "selected")
      .orderBy("doc_id")
  }

  /** DuckDB mirror of t28: same hash buckets, smoothing, and integer
    * thresholds.
    */
  val t28_oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, source,
       |    ('0x' || substr(sha256(tok), 1, 8))::BIGINT % $DSIR_BUCKETS AS bucket
       |  FROM toks),
       |raw AS (SELECT bucket, COUNT(*) AS c_raw FROM b GROUP BY 1),
       |tgt AS (SELECT bucket, COUNT(*) AS c_tgt FROM b
       |        WHERE doc_id % 13 = 0 GROUP BY 1),
       |w AS (
       |  SELECT r.bucket,
       |    (COALESCE(t.c_tgt, 0) + 1) * 1000000 // (r.c_raw + 1) AS w
       |  FROM raw r LEFT JOIN tgt t ON t.bucket = r.bucket),
       |scored AS (
       |  SELECT doc_id, source, COUNT(*) AS n_tokens,
       |    CAST(SUM(w.w) AS BIGINT) AS wsum
       |  FROM b JOIN w ON w.bucket = b.bucket GROUP BY 1, 2),
       |sc AS (
       |  SELECT doc_id, source, n_tokens, wsum // n_tokens AS score_fp
       |  FROM scored),
       |thr AS (
       |  SELECT source, CAST(SUM(score_fp) AS BIGINT) // COUNT(*) AS thr
       |  FROM sc GROUP BY 1)
       |SELECT sc.doc_id, sc.source, sc.n_tokens, sc.score_fp,
       |  sc.score_fp >= thr.thr AS selected
       |FROM sc JOIN thr ON thr.source = sc.source
       |ORDER BY sc.doc_id""".stripMargin

  private val EpochCap = 4L       // max repetitions per source (Muennighoff cap)
  private val BudgetNum = 37L     // training budget = 37/10 × corpus tokens
  private val BudgetDen = 10L

  /** p6_epoch_plan — data-constrained EPOCH allocation (the "how many
    * times may each source repeat" plan of Muennighoff et al. 2023,
    * arXiv:2305.16264, which p2/p3/p4 presuppose): the training budget
    * (37/10 of the corpus) is split into an equal per-source token
    * target, and each source covers its target by full epochs capped at
    * 4 (beyond which repeated data stops helping) plus a partial-epoch
    * remainder; target mass the cap forecloses is reported as
    * `unmet_tokens` — the measured data-constraint shortfall a scaling
    * decision reads. Integer arithmetic throughout (DIV/LEAST), so the
    * plan is hash-exact cross-engine:
    *
    *   target  = (37·total) DIV (10·n_sources)
    *   full    = LEAST(4, target DIV tokens_s)
    *   partial = target − full·tokens_s  (0 when the cap binds)
    *   planned = LEAST(target, 4·tokens_s);  unmet = target − planned
    *
    * Scale shape: one narrow token-count scan partial-aggregates to a
    * |sources|-row frame; the total is a 1-row broadcast crossJoin; the
    * corpus is never shuffled and never touched again — the plan the
    * sampler (p2's ticket filter) would execute. [oracle]
    */
  def p6_epoch_plan(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables(spark, dir).documents
      .select(col("source"), expr(s"size(${TextOps.TOKENS})").cast("long").as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("toks").cast("long").as("tokens"))
    // totals as whole-frame windows over the |sources|-row frame (p2's
    // r14 rewrite) — replaces the persist + agg + crossJoin trio with
    // one tiny window exchange
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    per
      .withColumn("total", sum("tokens").over(wAll).cast("long"))
      .withColumn("n_src", count(lit(1)).over(wAll))
      .withColumn("target_tokens",
        expr(s"($BudgetNum * total) DIV ($BudgetDen * n_src)"))
      .withColumn("epochs_full",
        least(lit(EpochCap), expr("target_tokens DIV tokens")))
      .withColumn("partial_tokens",
        when(col("epochs_full") < EpochCap,
          col("target_tokens") - col("epochs_full") * col("tokens"))
          .otherwise(lit(0L)))
      .withColumn("planned_tokens",
        least(col("target_tokens"), lit(EpochCap) * col("tokens")))
      .withColumn("unmet_tokens", col("target_tokens") - col("planned_tokens"))
      .select("source", "n_docs", "tokens", "target_tokens", "epochs_full",
        "partial_tokens", "planned_tokens", "unmet_tokens")
      .orderBy("source")
  }

  /** DuckDB mirror of p6: identical integer plan arithmetic. */
  val p6_oracle: String =
    s"""WITH per AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
       |      AS tokens
       |  FROM documents GROUP BY source),
       |tot AS (
       |  SELECT CAST(SUM(tokens) AS BIGINT) AS total, COUNT(*) AS n_src FROM per),
       |plan AS (
       |  SELECT source, n_docs, tokens,
       |    ($BudgetNum * total) // ($BudgetDen * n_src) AS target_tokens,
       |    LEAST($EpochCap, (($BudgetNum * total) // ($BudgetDen * n_src)) // tokens)
       |      AS epochs_full
       |  FROM per CROSS JOIN tot)
       |SELECT source, n_docs, tokens, target_tokens, epochs_full,
       |  CASE WHEN epochs_full < $EpochCap
       |       THEN target_tokens - epochs_full * tokens ELSE 0 END AS partial_tokens,
       |  LEAST(target_tokens, $EpochCap * tokens) AS planned_tokens,
       |  target_tokens - LEAST(target_tokens, $EpochCap * tokens) AS unmet_tokens
       |FROM plan
       |ORDER BY source""".stripMargin

  private val CtxLen = 256L // tokens per packed training context

  /** p7_pack_chunks — sequence PACKING manifest (the concatenate-then-
    * chunk step that turns a filtered corpus into fixed-length training
    * contexts, GPT-style): documents are placed in a deterministic
    * sha-shuffled order within their t22 shard, concatenated, and cut
    * into 256-token contexts. Per shard the manifest reports what the
    * trainer needs to size the run — context count (= ceil(tokens/256)),
    * pad waste in the final context, how many documents CROSS a context
    * boundary (the attention-mask/document-boundary loss the packing
    * trades for zero padding), and packing density (docs per context,
    * permille). Order and placement derive from sha256, so the manifest
    * is reproducible across runs, engines, and cluster sizes — t22's
    * placement discipline extended from shards to positions.
    *
    * Scale shape: one narrow scan (doc_id, length, keys); the only wide
    * stages are the per-shard cumulative-sum window and the 32-row
    * aggregate. The window partitions by shard — shard count is the
    * parallelism knob (a 100 TB run uses ~100k shards so each window
    * partition is a few GB; the arithmetic is shard-local either way).
    * Payload text never moves: packing is planned over lengths, and the
    * trainer's writer streams text into the planned positions. [oracle]
    */
  def p7_pack_chunks(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashExpressions.sha256PrefixLong
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
      .select(
        pmod(sha256PrefixLong(col("doc_id").cast("string"), 15), lit(SHARDS))
          .as("shard"),
        col("doc_id"),
        expr(s"cast(size(${TextOps.TOKENS}) as bigint)").as("len"),
        sha256PrefixLong(concat(lit("pack"), col("doc_id").cast("string")), 12)
          .as("pos_key"))
      .filter(col("len") >= 1)
    val w = Window.partitionBy("shard")
      .orderBy(col("pos_key").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum_end", sum("len").over(w))
      .withColumn("chunk_first", expr(s"(cum_end - len) DIV $CtxLen"))
      .withColumn("chunk_last", expr(s"(cum_end - 1) DIV $CtxLen"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("len").cast("long").as("n_tokens"),
        expr(s"(sum(len) + ${CtxLen - 1}) DIV $CtxLen").as("n_chunks"),
        expr(s"((sum(len) + ${CtxLen - 1}) DIV $CtxLen) * $CtxLen - sum(len)")
          .as("pad_tokens"),
        sum(when(col("chunk_last") > col("chunk_first"), 1L).otherwise(0L))
          .cast("long").as("n_boundary_docs"))
      .withColumn("docs_per_chunk_pm", expr("n_docs * 1000 DIV n_chunks"))
      .orderBy("shard")
  }

  /** DuckDB mirror of p7: same sha placement, window cumsum, chunk
    * arithmetic.
    */
  val p7_oracle: String =
    s"""WITH docs AS (
       |  SELECT
       |    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $SHARDS
       |      AS shard,
       |    doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |      AS len,
       |    ('0x' || substr(sha256('pack' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
       |      AS pos_key
       |  FROM documents
       |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 1),
       |placed AS (
       |  SELECT shard, doc_id, len,
       |    SUM(len) OVER (PARTITION BY shard ORDER BY pos_key, doc_id
       |                   ROWS UNBOUNDED PRECEDING) AS cum_end
       |  FROM docs)
       |SELECT shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(len) AS BIGINT) AS n_tokens,
       |  CAST((SUM(len) + ${CtxLen - 1}) // $CtxLen AS BIGINT) AS n_chunks,
       |  CAST(((SUM(len) + ${CtxLen - 1}) // $CtxLen) * $CtxLen - SUM(len) AS BIGINT)
       |    AS pad_tokens,
       |  CAST(SUM(CASE WHEN (cum_end - 1) // $CtxLen > (cum_end - len) // $CtxLen
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
       |  CAST(COUNT(*) * 1000 // ((SUM(len) + ${CtxLen - 1}) // $CtxLen) AS BIGINT)
       |    AS docs_per_chunk_pm
       |FROM placed GROUP BY shard ORDER BY shard""".stripMargin

  // Train/val/test thresholds in permille of the sha ticket space.
  private val TrainPm = 900L
  private val ValPm = 950L

  /** p8_split_assign — leakage-safe train/val/test assignment: the
    * split unit is the EXACT-DUPLICATE GROUP (d1's sha256(text)
    * identity), not the document, so byte-identical copies can never
    * straddle train and test — the most common eval-contamination
    * failure is train/test leakage through duplicates the splitter
    * never saw as related. Every member of a group shares its text,
    * hence its group ticket (sha of the group key), hence its split —
    * leakage-free BY CONSTRUCTION, and the manifest still reports the
    * measured `leaked_groups` count (a computed 0, not an assertion) so
    * a regression in the grouping key is caught, not assumed away.
    * 90/5/5 via sha permille tickets: deterministic across runs,
    * engines, and cluster sizes (t15's reproducibility discipline).
    *
    * Scale shape: one narrow scan (doc_id, sha, length); the split
    * column is a per-row hash, the report is a 3-row aggregate plus a
    * 1-row leak/total aggregate broadcast onto it. Near-dup-level
    * leakage safety composes the same way with d6's cluster labels as
    * the group key — the exact-group key here keeps the oracle
    * hash-checkable. [oracle]
    */
  def p8_split_assign(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashExpressions.sha256PrefixLong
    val docs = Tables(spark, dir).documents
      .select(
        col("doc_id"),
        sha2(col("text"), 256).as("gkey"),
        expr(s"cast(size(${TextOps.TOKENS}) as bigint)").as("len"))
      .withColumn("ticket",
        pmod(sha256PrefixLong(concat(lit("split"), col("gkey")), 15), lit(1000L)))
      .withColumn("split",
        when(col("ticket") < TrainPm, "train")
          .when(col("ticket") < ValPm, "val")
          .otherwise("test"))
      .persistTracked // feeds the per-split report AND the leak audit
    // 1-row totals + measured leakage (groups seen in >1 split)
    val totals = docs.groupBy("gkey")
      .agg(countDistinct("split").as("n_splits"), count(lit(1)).as("n"))
      .agg(
        sum("n").cast("long").as("total_docs"),
        sum(when(col("n_splits") > 1, 1L).otherwise(0L)).cast("long")
          .as("leaked_groups"))
    docs.groupBy("split")
      .agg(
        countDistinct("gkey").as("n_groups"),
        count(lit(1)).as("n_docs"),
        sum("len").cast("long").as("n_tokens"))
      .crossJoin(broadcast(totals))
      .withColumn("docs_pm", expr("n_docs * 1000 DIV total_docs"))
      .select("split", "n_groups", "n_docs", "n_tokens", "docs_pm", "leaked_groups")
      .orderBy("split")
  }

  /** DuckDB mirror of p8: same sha group key, ticket, thresholds. */
  val p8_oracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, sha256(text) AS gkey,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |      AS len,
       |    ('0x' || substr(sha256('split' || sha256(text)), 1, 15))::BIGINT % 1000
       |      AS ticket
       |  FROM documents),
       |assigned AS (
       |  SELECT *, CASE WHEN ticket < $TrainPm THEN 'train'
       |                 WHEN ticket < $ValPm THEN 'val'
       |                 ELSE 'test' END AS split
       |  FROM docs),
       |totals AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS total_docs,
       |    CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS leaked_groups
       |  FROM (SELECT gkey, COUNT(DISTINCT split) AS n_splits, COUNT(*) AS n
       |        FROM assigned GROUP BY gkey))
       |SELECT split,
       |  CAST(COUNT(DISTINCT gkey) AS BIGINT) AS n_groups,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(len) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(*) * 1000 // total_docs AS BIGINT) AS docs_pm,
       |  leaked_groups
       |FROM assigned CROSS JOIN totals
       |GROUP BY split, total_docs, leaked_groups
       |ORDER BY split""".stripMargin

  /** p9_dataset_card — the per-source DATA CARD a corpus release ships
    * with (Datasheets-for-Datasets condensed to the measurable rows):
    * document and token mass, mean document length, the exact-duplicate
    * rate (docs that are a non-first occurrence of their sha256 group,
    * d1's canonical-owner rule — measured against the WHOLE corpus, so
    * a source full of copies of another source's docs is charged for
    * them), the t2 quality-pass rate, and language coverage. One table
    * a reviewer reads to decide whether a source belongs in the mix —
    * the summary every component operator in this family feeds.
    *
    * Scale shape: one narrow scan; the duplicate verdict needs one
    * digest-keyed groupBy (32-byte keys) joined back doc-keyed; the
    * report is a |sources|-row aggregate. All permille integer. [oracle]
    */
  def p9_dataset_card(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), col("lang"),
        sha2(col("text"), 256).as("dg"),
        expr(s"cast(size(${TextOps.TOKENS}) as bigint)").as("n_toks"),
        expr(s"size(filter(${TextOps.TOKENS}, x -> x IN (${TextOps.STOPWORDS_SQL})))")
          .as("n_stop"))
      .persistTracked // feeds the owner groupBy AND the per-source report
    val owner = docs.groupBy("dg").agg(min("doc_id").as("first_id"))
    docs
      .join(owner, Seq("dg"))
      .withColumn("is_dup", (col("doc_id") > col("first_id")).cast("long"))
      .withColumn("q_pass",
        (col("n_toks").between(5, 1000) && col("n_stop") > 0).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").cast("long").as("n_tokens"),
        expr("sum(n_toks) DIV count(1)").as("mean_doc_tokens"),
        expr("sum(is_dup) * 1000 DIV count(1)").as("dup_doc_pm"),
        expr("sum(q_pass) * 1000 DIV count(1)").as("quality_pass_pm"),
        countDistinct("lang").as("n_langs"))
      .orderBy("source")
  }

  /** DuckDB mirror of p9: same digest-owner rule, t2 quality flag,
    * permille arithmetic.
    */
  val p9_oracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, source, lang, sha256(text) AS dg,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |      AS n_toks,
       |    CAST(len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''),
       |      x -> x IN (${TextOps.STOPWORDS_SQL}))) AS BIGINT) AS n_stop
       |  FROM documents),
       |owner AS (SELECT dg, MIN(doc_id) AS first_id FROM docs GROUP BY dg)
       |SELECT source,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_toks) // COUNT(*) AS BIGINT) AS mean_doc_tokens,
       |  CAST(SUM(CASE WHEN doc_id > first_id THEN 1 ELSE 0 END) * 1000 // COUNT(*)
       |    AS BIGINT) AS dup_doc_pm,
       |  CAST(SUM(CASE WHEN n_toks BETWEEN 5 AND 1000 AND n_stop > 0 THEN 1 ELSE 0 END)
       |    * 1000 // COUNT(*) AS BIGINT) AS quality_pass_pm,
       |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
       |FROM docs JOIN owner USING (dg)
       |GROUP BY source ORDER BY source""".stripMargin

  // ---- p10: token-budget selection -----------------------------------

  private val BudgetShards = 32 // prefix-sum parallelism knob (~100k at 100 TB)
  private val BandWidth = 250   // quality-band coarseness (mean-len permille)

  /** Bands saturate here (mean token length ≥ 100 chars is degenerate
    * either way), making the offset-ladder cell table ≤ (MaxBand+1) ×
    * BudgetShards rows BY CONSTRUCTION — the unpartitioned window in
    * p10's phase 1 is safe at any corpus because no data distribution
    * can grow the cell table, not because today's data happens to be
    * tame.
    */
  private val MaxBand = 400

  /** p10_token_budget — select the best-quality corpus prefix that fits
    * a token budget: the greedy knapsack every training run executes
    * when compute (not data) is the binding constraint ("train on the
    * best 40% of tokens"). Priority is (quality band DESC, sha shard,
    * sha ticket, doc_id) — quality-banded on purpose: within a band,
    * strict ordering is meaningless precision, and the sha order makes
    * the cut reproducible across runs/engines/cluster sizes (t15's
    * discipline). A document is kept iff its cumulative token count
    * under that total order fits the budget (2/5 of corpus tokens —
    * corpus-scaled, no literal tuned to one SF).
    *
    * Scale shape — the reason this entry exists: the global running sum
    * is a TWO-PHASE distributed prefix sum, never a single-partition
    * window. Per-(band, shard) token subtotals (a ≤ bands×32-row
    * aggregate) get running offsets on the tiny cell table; each
    * document's global position is its cell offset plus a cumsum inside
    * its own (band, shard) window partition. Shard count is the
    * parallelism knob (p7's discipline); DuckDB reproduces the numbers
    * with one flat window over the identical total order, which proves
    * the decomposition exact. [oracle]
    */
  def p10_token_budget(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashExpressions.sha256PrefixLong
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        expr(s"CAST(size(${TextOps.TOKENS}) AS BIGINT)").as("ntok"),
        expr(s"aggregate(${TextOps.TOKENS}, 0L, (a, x) -> a + length(x))").as("nchar"))
      .withColumn("band", expr(
        s"least((CASE WHEN ntok = 0 THEN 0L ELSE nchar * 1000L DIV ntok END) DIV $BandWidth, ${MaxBand}L)"))
      .withColumn("shard",
        pmod(sha256PrefixLong(col("doc_id").cast("string"), 15), lit(BudgetShards.toLong)))
      .withColumn("tick",
        sha256PrefixLong(concat(lit("budget"), col("doc_id").cast("string")), 12))
      .persistTracked
    val budget = docs.agg((sum("ntok") * 2).cast("long").as("b"))
      .withColumn("b", expr("b DIV 5"))
    // phase 1: per-cell subtotals + running offsets on the tiny cell table
    val cells = docs.groupBy("band", "shard")
      .agg(sum("ntok").cast("long").as("cell_tokens"))
    val offW = Window.orderBy(col("band").desc, col("shard").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cells
      .withColumn("cell_before", coalesce(sum("cell_tokens").over(offW), lit(0L)))
      .select("band", "shard", "cell_before")
    // phase 2: within-cell cumsum; global position = offset + local cum
    val inW = Window.partitionBy("band", "shard")
      .orderBy(col("tick").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(offsets), Seq("band", "shard"))
      .withColumn("cum_incl", col("cell_before") + sum("ntok").over(inW))
      .crossJoin(broadcast(budget))
      .withColumn("kept", col("cum_incl") <= col("b"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("ntok").cast("long").as("n_tokens"),
        sum(when(col("kept"), 1L).otherwise(0L)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("ntok")).otherwise(0L)).cast("long").as("kept_tokens"),
        sum(when(col("kept"), col("doc_id")).otherwise(0L)).cast("long").as("kept_id_sum"))
      .withColumn("kept_permille", expr(
        "CASE WHEN n_tokens = 0 THEN 0L ELSE kept_tokens * 1000L DIV n_tokens END"))
      .select("source", "n_docs", "n_tokens", "n_kept", "kept_tokens",
        "kept_permille", "kept_id_sum")
      .orderBy("source")
  }

  /** DuckDB mirror of p10: one flat window over the identical
    * (band DESC, shard, tick, doc_id) total order — agreeing with
    * Spark's two-phase decomposition by construction.
    */
  val p10_oracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ntok,
       |    CAST(coalesce(list_sum(list_transform(
       |      list_filter(string_split(text, ' '), x -> x <> ''), x -> len(x))), 0) AS BIGINT) AS nchar,
       |    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $BudgetShards AS shard,
       |    ('0x' || substr(sha256('budget' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS tick
       |  FROM documents),
       |banded AS (
       |  SELECT *, LEAST((CASE WHEN ntok = 0 THEN 0 ELSE nchar * 1000 // ntok END) // $BandWidth, $MaxBand) AS band
       |  FROM docs),
       |b AS (SELECT CAST(SUM(ntok) * 2 // 5 AS BIGINT) AS budget FROM docs),
       |placed AS (
       |  SELECT *, SUM(ntok) OVER (ORDER BY band DESC, shard, tick, doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS cum_incl
       |  FROM banded),
       |verdicts AS (
       |  SELECT p.*, p.cum_incl <= b.budget AS kept FROM placed p CROSS JOIN b)
       |SELECT source,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN kept THEN ntok ELSE 0 END) AS BIGINT) AS kept_tokens,
       |  CASE WHEN SUM(ntok) = 0 THEN 0
       |       ELSE CAST(SUM(CASE WHEN kept THEN ntok ELSE 0 END) * 1000 // SUM(ntok) AS BIGINT)
       |  END AS kept_permille,
       |  CAST(SUM(CASE WHEN kept THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
       |FROM verdicts GROUP BY source ORDER BY source""".stripMargin

  // ---- t32: per-source document cap ----------------------------------

  private val DomainCap = 25 // absolute policy cap, NOT a tuned threshold

  /** t32_domain_cap — per-source document cap (the RefinedWeb /
    * CommonCrawl anti-spam move: no single domain may dominate the
    * corpus, so every source keeps at most K documents). K is an
    * ABSOLUTE POLICY constant (real pipelines cap at e.g. 100k
    * docs/domain regardless of corpus size — unlike d4's df cap this is
    * not a statistical threshold that must scale, and a bigger corpus
    * just drops more). Which K survive is decided by the deterministic
    * sha ticket (t15's reproducibility discipline), so the kept set is
    * identical across runs, engines, and cluster sizes.
    *
    * Scale shape: the K-selection runs on the native bounded-heap
    * TopKPerGroup operator — per-partition partial heaps, one merge per
    * source, never a full per-source sort (the window row_number
    * formulation sorts every group; the heap carries K rows per
    * partition). The report joins the kept set's aggregate against the
    * per-source totals from the same persisted compact frame — text
    * never shuffles. [oracle]
    */
  def t32_domain_cap(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashExpressions.sha256PrefixLong
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        expr(s"CAST(size(${TextOps.TOKENS}) AS BIGINT)").as("ntok"))
      .withColumn("tick",
        sha256PrefixLong(concat(lit("cap"), col("doc_id").cast("string")), 12))
      .persistTracked
    val kept = graft.plans.TopKPerGroup
      .topKPerGroup(docs, Seq("source"),
        Seq(("tick", true), ("doc_id", true)), DomainCap)
      .groupBy("source")
      .agg(
        count(lit(1)).cast("long").as("n_kept"),
        sum("ntok").cast("long").as("kept_tokens"),
        sum("doc_id").cast("long").as("kept_id_sum"))
    docs.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("ntok").cast("long").as("n_tokens"))
      .join(kept, Seq("source"))
      .withColumn("n_dropped", col("n_docs") - col("n_kept"))
      .select("source", "n_docs", "n_tokens", "n_kept", "n_dropped",
        "kept_tokens", "kept_id_sum")
      .orderBy("source")
  }

  /** DuckDB mirror of t32: row_number over the same (tick, doc_id)
    * priority — semantics identical to the bounded heap.
    */
  val t32_oracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ntok,
       |    ('0x' || substr(sha256('cap' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS tick
       |  FROM documents),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY tick, doc_id) AS rn
       |  FROM docs),
       |kept AS (
       |  SELECT source, COUNT(*) AS n_kept, CAST(SUM(ntok) AS BIGINT) AS kept_tokens,
       |    CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
       |  FROM ranked WHERE rn <= $DomainCap GROUP BY source),
       |tot AS (
       |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
       |  FROM docs GROUP BY source)
       |SELECT source, n_docs, n_tokens, n_kept, n_docs - n_kept AS n_dropped,
       |  kept_tokens, kept_id_sum
       |FROM tot JOIN kept USING (source)
       |ORDER BY source""".stripMargin
}
