package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Fuzz family 8 (VERDICT r13 item 6): the streaming hybrid-retrieval
  * index under adversarial micro-batch splits.
  *
  * [[CorpusStream.hybridCandidatesBatch]] claims the same two contracts
  * the other streaming surfaces carry — replay idempotence, and
  * batch ≡ streamed equality (serving from the accumulated index equals
  * the one-shot oracle-checked s7 entry, because per-batch top-k cuts
  * are lossless under the (score desc, id asc) total order) — but until
  * this spec only the single 3-batch HybridStreamSpec fixture exercised
  * them. Here 12 seed-pinned random draws each generate a doc corpus
  * (duplicate texts → kw-score ties, exercising the id tiebreak) plus an
  * embedding set, write them as a real parquet sf dir, cut the combined
  * arrival stream at random micro-batch boundaries, and require:
  *
  *  - served top-k from the streamed index ≡
  *    `Similarity.s7_hybrid_search` on the same parquet, row-for-row;
  *  - a RETRIED random batch (at-least-once replay) leaves the served
  *    results identical.
  *
  * Draw determinism is pinned by a digest like the other fuzz families.
  */
class HybridReplayFuzzSpec extends SparkSpec {

  private val Seeds = 0 until 12

  private final case class Draw(docs: Seq[(Long, String)],
                                vecs: Seq[(Long, Array[Float])])

  /** Random corpus: texts from a small pool (guaranteed duplicate texts
    * and shared tokens, so the keyword side has real overlap + ties)
    * and small non-zero embeddings. Ids 0..n-1 so the s7 standing-query
    * set (ids < 3) always exists on both sides.
    */
  private def draw(seed: Int): Draw = {
    val rng = new scala.util.Random(12000 + seed)
    val pool = (0 until 10 + rng.nextInt(8)).map { _ =>
      (0 until 3 + rng.nextInt(6)).map(_ => s"tok${rng.nextInt(25)}").mkString(" ")
    }
    val nDocs = 25 + rng.nextInt(30)
    val docs = (0 until nDocs).map(i => i.toLong -> pool(rng.nextInt(pool.size)))
    val nVecs = 25 + rng.nextInt(30)
    val vecs = (0 until nVecs).map { i =>
      // first dim bounded away from 0 so every norm is positive
      val v = Array.tabulate(8)(d =>
        if (d == 0) 1f + rng.nextInt(50) / 10f else rng.nextInt(100) / 10f - 5f)
      i.toLong -> v
    }
    Draw(docs, vecs)
  }

  /** Cut an ordered sequence into 2–5 random non-empty micro-batches. */
  private def split[T](rng: scala.util.Random, xs: Seq[T]): Seq[Seq[T]] = {
    val k = 2 + rng.nextInt(4)
    val cuts = Seq.fill(k - 1)(1 + rng.nextInt(xs.size - 1)).distinct.sorted
    (Seq(0) ++ cuts ++ Seq(xs.size)).sliding(2).map {
      case Seq(a, b) => xs.slice(a, b)
    }.toSeq.filter(_.nonEmpty)
  }

  test("fuzz hybrid: the 12 seeded draws regenerate bit-identically") {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    Seeds.foreach { s =>
      val d = draw(s)
      d.docs.foreach { case (id, t) => digest.update(s"$id,$t".getBytes) }
      d.vecs.foreach { case (id, v) =>
        digest.update(s"$id,${v.mkString(",")}".getBytes)
      }
    }
    val hex = digest.digest().map("%02x".format(_)).mkString
    assert(hex == "88d84ad150729036002bf1c1257488bb95ed8359ef3f621d9ea4122a98e3dd0a",
      s"draw digest drifted: $hex")
  }

  test("fuzz hybrid: streamed index ≡ batch s7 under random splits; retried batch is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    Seeds.foreach { seed =>
      val rng = new scala.util.Random(13000 + seed)
      val d = draw(seed)
      // materialize the draw as a real sf dir so the comparison target
      // is the actual oracle-checked batch entry, not a re-derivation
      val dir = java.nio.file.Files.createTempDirectory(s"graft_hf_$seed").toString
      d.docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      d.vecs.toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

      val docsDf = spark.read.parquet(s"$dir/documents.parquet")
      val embDf = spark.read.parquet(s"$dir/embeddings.parquet")
      val qtoks = docsDf.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), explode(expr(
          "array_distinct(filter(split(lower(text), '[^a-z]+'), t -> t != ''))")).as("tok"))
      val qvecs = graft.ops.Similarity.withUnit(embDf.filter(col("vec_id") < 3))
        .select(col("vec_id").as("query_id"), col("unit").as("qunit"))

      // the corpus as it ARRIVES: every text and embedding an independent
      // event, shuffled (the embedder lags the crawl arbitrarily), then
      // cut at random micro-batch boundaries
      val events: Seq[CorpusEvent] =
        rng.shuffle(
          d.docs.map { case (id, t) => CorpusEvent(id, t, null) } ++
          d.vecs.map { case (id, v) => CorpusEvent(id, null, v) })
      val batches = split(rng, events)

      val idx = java.nio.file.Files.createTempDirectory(s"graft_hfi_$seed")
        .toString + "/index"
      val stream = MemoryStream[CorpusEvent]
      val q = stream.toDF().writeStream
        .foreachBatch(CorpusStream.hybridCandidatesBatch(qtoks, qvecs, idx) _)
        .start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      q.stop()

      val served = CorpusStream.hybridSearchIndex(spark, idx).collect().toSeq
      assert(served.nonEmpty, s"seed=$seed: empty served result")
      val batch = graft.ops.Similarity.s7_hybrid_search(spark, dir).collect().toSeq
      assert(served == batch,
        s"seed=$seed: ${batches.size}-batch streamed index diverged from batch s7")

      // at-least-once replay: re-run a random batch verbatim
      val j = rng.nextInt(batches.size)
      CorpusStream.hybridCandidatesBatch(qtoks, qvecs, idx)(
        spark.createDataset(batches(j)).toDF(), j.toLong)
      assert(CorpusStream.hybridSearchIndex(spark, idx).collect().toSeq == served,
        s"seed=$seed: retrying batch $j changed the served results")

      Seq(dir, idx).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      }
    }
  }
}
