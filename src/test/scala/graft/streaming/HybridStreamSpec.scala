package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming hybrid retrieval (r6 verdict #7): the RAG ingest pipeline —
  * texts and embeddings arriving on independent schedules, scored per
  * micro-batch against a broadcast standing-query set, candidates
  * accumulated in a replay-idempotent parquet index. The contract under
  * test is EXACT batch ≡ streaming parity: serving from the streamed
  * index must answer byte-identically to the one-shot oracle-checked
  * s7_hybrid_search entry, because per-batch top-k cuts are lossless
  * under the (score desc, id asc) total order.
  */
class HybridStreamSpec extends SparkSpec {

  test("streamed hybrid index ≡ batch s7_hybrid_search; replayed batch idempotent") {
    import spark.implicits._
    val docs = Tables(spark, sfDir).documents.select(col("doc_id"), col("text"))
    val emb = Tables(spark, sfDir).embeddings

    // standing query set — same 3 queries as the batch entry (ids < 3)
    val qtoks = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), explode(expr(
        "array_distinct(filter(split(lower(text), '[^a-z]+'), t -> t != ''))")).as("tok"))
    val qvecs = graft.ops.Similarity.withUnit(emb.filter(col("vec_id") < 3))
      .select(col("vec_id").as("query_id"), col("unit").as("qunit"))

    // the corpus as it would ARRIVE: every text and every embedding an
    // independent item (the embedder lags the crawl), split over 3
    // micro-batches by id
    val events: Array[CorpusEvent] =
      docs.select(col("doc_id").as("id"), col("text"),
          lit(null).cast("array<float>").as("embedding")).as[CorpusEvent].collect() ++
      emb.select(col("vec_id").as("id"), lit(null).cast("string").as("text"),
          col("embedding")).as[CorpusEvent].collect()
    val byBatch = events.groupBy(_.id % 3)

    val idx = java.nio.file.Files.createTempDirectory("graft_hybrid_").toString + "/index"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[CorpusEvent]
    val q = stream.toDF().writeStream
      .foreachBatch(CorpusStream.hybridCandidatesBatch(qtoks, qvecs, idx) _)
      .start()
    (0L to 2L).foreach { b =>
      stream.addData(byBatch(b).toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val served = CorpusStream.hybridSearchIndex(spark, idx).collect().toSeq
    assert(served.nonEmpty)

    // parity: the streamed index answers exactly what the one-shot batch
    // pipeline (oracle-checked s7 driver entry) computes on the same data
    val batch = graft.ops.Similarity.s7_hybrid_search(spark, sfDir).collect().toSeq
    assert(served == batch,
      s"streaming/batch divergence:\n streamed=${served.take(5)}\n batch=${batch.take(5)}")

    // replay idempotence: a checkpoint-recovery re-run of batch 1
    // overwrites its own partition and changes nothing served
    CorpusStream.hybridCandidatesBatch(qtoks, qvecs, idx)(
      spark.createDataset(byBatch(1L).toSeq).toDF(), 1L)
    assert(CorpusStream.hybridSearchIndex(spark, idx).collect().toSeq == served,
      "replayed batch must not change the served results")
  }
}
