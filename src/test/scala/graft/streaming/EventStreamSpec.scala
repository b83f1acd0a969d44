package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val rows = Seq(
    UserEvent(1, ts("2024-01-01 00:10:00"), 1, "click", 10.0),
    UserEvent(2, ts("2024-01-01 00:50:00"), 2, "click", 5.0),
    UserEvent(3, ts("2024-01-01 01:10:00"), 1, "view", 2.5),
    UserEvent(4, ts("2024-01-01 02:05:00"), 3, "click", 1.0))

  test("windowed agg over a stream equals the same transform in batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    stream.addData(rows: _*)
    val q = EventStream.windowedStream(stream.toDF())
      .writeStream.format("memory").queryName("win_complete")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("win_complete")
      .orderBy("window_start", "event_type").collect()
    val batch = EventStream.windowedAgg(rows.toDF())
      .orderBy("window_start", "event_type").collect()
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    assert(batch.length == 3)
  }

  test("sliding windows over a stream equal the batch transform; x4 membership") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    stream.addData(rows: _*)
    val q = EventStream.slidingStream(stream.toDF())
      .writeStream.format("memory").queryName("slide_complete")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("slide_complete")
      .orderBy("window_start", "event_type").collect()
    val batch = EventStream.slidingAgg(rows.toDF())
      .orderBy("window_start", "event_type").collect()
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    // every event lands in exactly 4 overlapping windows
    assert(batch.map(_.getAs[Long]("n_events")).sum == rows.length * 4L)
  }

  test("append mode + watermark emits only watermark-closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val q = EventStream.windowedStream(stream.toDF())
      .writeStream.format("memory").queryName("win_append")
      .outputMode(OutputMode.Append()).start()
    stream.addData(rows: _*)
    q.processAllAvailable() // watermark now 00:05 → nothing closed yet
    assert(spark.table("win_append").count() == 0)
    stream.addData(UserEvent(9, ts("2024-01-01 09:00:00"), 9, "late", 0.0))
    q.processAllAvailable() // watermark 07:00 → first three windows close
    q.stop()
    val closed = spark.table("win_append")
      .orderBy("window_start", "event_type").collect()
    val batch = EventStream.windowedAgg(rows.toDF())
      .orderBy("window_start", "event_type").collect()
    assert(closed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("streaming dedup: dropDuplicatesWithinWatermark keeps first occurrence only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val deduped = stream.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Append()).start()
    stream.addData(UserEvent(1, ts("2024-01-01 00:00:01"), 1, "click", 1.0))
    q.processAllAvailable()
    stream.addData(
      UserEvent(1, ts("2024-01-01 00:00:01"), 1, "click", 1.0), // dup within watermark
      UserEvent(2, ts("2024-01-01 00:00:02"), 1, "view", 2.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_sink").collect().map(_.getAs[Long]("event_id")).sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("streaming corpus dedup: state-store seen-set drops cross-batch duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamDoc]
    val q = CorpusStream.dedupStream(stream.toDF())
      .writeStream.format("memory").queryName("corpus_dedup")
      .outputMode(OutputMode.Append()).start()
    stream.addData(
      StreamDoc(1, "the quick brown fox jumps"),
      StreamDoc(2, "the quick brown fox jumps"), // in-batch dup
      StreamDoc(3, "an entirely different document here"),
      StreamDoc(4, "xx")) // fails the quality gate (< 3 tokens)
    q.processAllAvailable()
    stream.addData(
      StreamDoc(5, "the quick brown fox jumps"), // cross-batch dup
      StreamDoc(6, "novel content in the second batch"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("corpus_dedup").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 3L, 6L),
      "one survivor per distinct text, quality-gated, across batches")
  }

  test("incremental dedup index: micro-batches anti-join the parquet index, replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("corpus_idx_").toString + "/index"
    val stream = MemoryStream[StreamDoc]
    val q = stream.toDF().writeStream
      .foreachBatch(CorpusStream.incrementalDedupBatch(idx) _)
      .outputMode(OutputMode.Append()).start()
    stream.addData(
      StreamDoc(1, "alpha beta gamma"), StreamDoc(2, "alpha beta gamma"),
      StreamDoc(3, "delta epsilon zeta"))
    q.processAllAvailable()
    stream.addData(
      StreamDoc(4, "alpha beta gamma"),   // dup vs index → dropped
      StreamDoc(5, "eta theta iota"))
    q.processAllAvailable()
    q.stop()
    val texts = spark.read.parquet(idx).select("text")
      .collect().map(_.getString(0)).sorted
    assert(texts.toSeq == Seq("alpha beta gamma", "delta epsilon zeta", "eta theta iota"))
    // replaying batch 1 against the same index overwrites its own
    // partition — still 3 rows, not 5 (idempotence under retry)
    CorpusStream.incrementalDedupBatch(idx)(
      Seq(StreamDoc(1, "alpha beta gamma"),
        StreamDoc(3, "delta epsilon zeta")).toDF(), 0L)
    assert(spark.read.parquet(idx).count() == 3)
  }

  test("snapshot-dim enrichment: each micro-batch joins the version current at its moment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = java.nio.file.Files.createTempDirectory("enrich_dim_").toString + "/langs"
    val out = java.nio.file.Files.createTempDirectory("enrich_out_").toString + "/docs"
    // dim v0 — carries a `text` column COLLIDING with the batch's own
    // `text`: non-key dim columns must come out `dim_`-prefixed or the
    // parquet write would fail on the duplicate name
    graft.sources.Snapshots.write(
      Seq((1L, "en", "d1"), (2L, "fr", "d2")).toDF("doc_id", "lang", "text"), dim)
    val stream = MemoryStream[StreamDoc]
    val q = stream.toDF().writeStream
      .foreachBatch(CorpusStream.enrichWithSnapshotBatch(dim, "doc_id", out) _)
      .outputMode(OutputMode.Append()).start()
    stream.addData(StreamDoc(1, "hello"), StreamDoc(2, "bonjour"))
    q.processAllAvailable()
    // dim publishes v1 mid-stream: doc 2 reclassified, doc 3 appears
    graft.sources.Snapshots.write(
      Seq((1L, "en", "d1"), (2L, "fr-CA", "d2"), (3L, "de", "d3"))
        .toDF("doc_id", "lang", "text"), dim)
    stream.addData(StreamDoc(2, "bonjour"), StreamDoc(3, "hallo"))
    q.processAllAvailable()
    q.stop()
    def read(): Set[(Long, String, Long)] = spark.read.parquet(out)
      .select("doc_id", "dim_lang", "dim_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(read() == Set((1L, "en", 0L), (2L, "fr", 0L), (2L, "fr-CA", 1L), (3L, "de", 1L)),
      s"each batch must see its own dim version, got ${read()}")
    // provenance: any output row's dim version is re-readable months later
    assert(graft.sources.Snapshots.read(spark, dim, Some(0L)).count() == 2)
    // checkpoint-recovery REPLAY of batch 0 after the dim moved on: the
    // completed partition pins the version it originally joined (v0) —
    // a replay can never rewrite history against a newer dim
    CorpusStream.enrichWithSnapshotBatch(dim, "doc_id", out)(
      Seq(StreamDoc(1, "hello"), StreamDoc(2, "bonjour")).toDF(), 0L)
    assert(read() == Set((1L, "en", 0L), (2L, "fr", 0L), (2L, "fr-CA", 1L), (3L, "de", 1L)),
      s"replayed batch 0 must re-pin dim v0, got ${read()}")
  }

  test("Trigger.AvailableNow file ingest: each run drains only files the checkpoint hasn't seen") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("avail_now_").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    def runOnce(): Unit = {
      // AvailableNow = incremental batch: process everything currently in
      // `in` that the checkpoint hasn't recorded, then stop — the
      // scheduled-ingest pattern that replaces hand-rolled file bookkeeping
      val q = spark.readStream.schema(schema).json(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").json(in)
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    Seq((3L, "c")).toDF("id", "v").write.mode("append").json(in)
    runOnce()
    val all = spark.read.parquet(out).orderBy("id").collect().map(_.getLong(0))
    assert(all.toSeq == Seq(1L, 2L, 3L), "second run appends only the new file's rows")
  }

  test("foreachBatch idempotent sink: batches land once, replay overwrites not duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("fb_sink_").toString
    val stream = MemoryStream[UserEvent]
    val q = EventStream.startIdempotentParquetSink(stream.toDF(), out)
    stream.addData(rows.take(2): _*)
    q.processAllAvailable()
    stream.addData(rows.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val written = spark.read.parquet(s"$out/batch_id=*").count()
    assert(written == rows.length, s"every event exactly once, got $written")
    // simulate a replay of batch 0: the overwrite keeps it exactly-once
    spark.createDataset(rows.take(2)).toDF()
      .write.mode("overwrite").parquet(s"$out/batch_id=0")
    assert(spark.read.parquet(s"$out/batch_id=*").count() == rows.length)
  }

  test("stream-stream join with watermarks equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[UserEvent]
    val views = MemoryStream[UserEvent]
    val q = EventStream.clickThenViewStream(clicks.toDF(), views.toDF())
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    val clickRows = Seq(
      UserEvent(10, ts("2024-01-01 00:00:00"), 1, "click", 0),
      UserEvent(11, ts("2024-01-01 03:00:00"), 2, "click", 0))
    val viewRows = Seq(
      UserEvent(20, ts("2024-01-01 00:30:00"), 1, "view", 0), // within 1 h of click 10
      UserEvent(21, ts("2024-01-01 02:00:00"), 1, "view", 0), // too late for click 10
      UserEvent(22, ts("2024-01-01 03:10:00"), 2, "view", 0)) // within 1 h of click 11
    clicks.addData(clickRows: _*)
    views.addData(viewRows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ss_join")
      .select("click_id", "view_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventStream.clickThenView(clickRows.toDF(), viewRows.toDF())
      .select("click_id", "view_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch == Set((10L, 20L), (11L, 22L)))
  }

  test("flatMapGroupsWithState sessionization closes on gap and on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val q = EventStream.sessionizeWithState(stream.toDS())
      .writeStream.format("memory").queryName("fmgws_sessions")
      .outputMode(OutputMode.Append()).start()
    // batch 1: two sessions for user 1 separated by a >30 min gap;
    // the first closes in-batch, the second stays open in state
    stream.addData(
      UserEvent(1, ts("2024-01-01 00:00:00"), 1, "e", 0),
      UserEvent(2, ts("2024-01-01 00:10:00"), 1, "e", 0),
      UserEvent(3, ts("2024-01-01 01:00:00"), 1, "e", 0))
    q.processAllAvailable()
    val afterBatch1 = spark.table("fmgws_sessions").collect()
    assert(afterBatch1.length == 1)
    assert(afterBatch1.head.getAs[Long]("n_events") == 2)
    // batch 2: far-future event for another user advances the watermark
    // past the open session's timeout → it closes via EventTimeTimeout
    stream.addData(UserEvent(9, ts("2024-01-01 06:00:00"), 2, "e", 0))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("fmgws_sessions").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSet
    assert(all.contains((1L, 2L)) && all.contains((1L, 1L)))
  }

  test("mapGroupsWithState keeps running per-user counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val q = EventStream.runningUserCounts(stream.toDS())
      .writeStream.format("memory").queryName("user_counts")
      .outputMode(OutputMode.Update()).start()

    stream.addData(
      UserEvent(1, ts("2024-01-01 00:00:01"), 1, "click", 1.0),
      UserEvent(2, ts("2024-01-01 00:00:02"), 1, "click", 2.0),
      UserEvent(3, ts("2024-01-01 00:00:03"), 2, "view", 5.0))
    q.processAllAvailable()
    stream.addData(UserEvent(4, ts("2024-01-01 00:00:04"), 1, "view", 4.0))
    q.processAllAvailable()
    q.stop()

    val byUser = spark.table("user_counts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
    // second batch updates user 1's state on top of the first batch
    assert(byUser.contains((1L, 3L, 7.0)))
    assert(byUser.contains((2L, 1L, 5.0)))
  }
}
