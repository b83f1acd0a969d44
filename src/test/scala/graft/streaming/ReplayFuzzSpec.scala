package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Fuzz family 7 (VERDICT r12 item 5): streaming replay-idempotence.
  *
  * The streaming surface claims a replay contract — any micro-batch
  * SPLIT of the same event stream produces the same final table as the
  * single-batch run — but until this spec only hand-picked fixtures
  * exercised it. Here 12 seed-pinned random draws each generate an
  * event stream + doc corpus with injected verbatim duplicates, cut
  * them at random micro-batch boundaries, and require:
  *
  *  - tumbling/sliding windowed aggregation (q21/q58's streaming
  *    shape, Complete mode): the streamed final table is row-for-row
  *    identical to the BATCH transform of the same events — the
  *    strongest form of "split-invariant", since the batch plan never
  *    saw a split at all;
  *  - flatMapGroupsWithState sessionization (q24's custom-state twin):
  *    closed sessions equal an independent in-spec oracle (per-user
  *    gap-split recomputed in plain Scala), with open tails flushed by
  *    the event-time timeout via a far-future watermark event;
  *  - the q65 dedup-index path: per-batch survivors equal the
  *    first-batch-wins oracle, and a RETRIED random batch (the actual
  *    at-least-once replay) leaves the index bit-identical.
  *
  * Draw determinism is pinned the same way as the other fuzz families:
  * a digest over every generated row must regenerate bit-identically,
  * so a silent RNG/codegen change cannot quietly shrink the net.
  */
class ReplayFuzzSpec extends SparkSpec {

  private val Seeds = 0 until 12

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** Random ts-ordered event stream with ~15% verbatim duplicates. */
  private def drawEvents(seed: Int): Seq[UserEvent] = {
    val rng = new scala.util.Random(7000 + seed)
    val nUsers = 3 + rng.nextInt(6)
    val types = Seq("click", "view", "buy", "scroll")
    val n = 60 + rng.nextInt(90)
    val raw = (1 to n).map { i =>
      UserEvent(i.toLong, ts(base + rng.nextInt(10 * 3600) * 1000L),
        1L + rng.nextInt(nUsers), types(rng.nextInt(types.size)),
        rng.nextInt(1000) / 10.0)
    }
    val withDups = raw.flatMap { e =>
      if (rng.nextDouble() < 0.15) Seq(e, e) else Seq(e)
    }
    withDups.sortBy(e => (e.ts.getTime, e.event_id))
  }

  /** Random doc corpus from a small text pool (guaranteed duplicates,
    * every text ≥3 tokens so the dedup-stream quality gate keeps all).
    */
  private def drawDocs(seed: Int): Seq[StreamDoc] = {
    val rng = new scala.util.Random(8000 + seed)
    val pool = (0 until 12 + rng.nextInt(10)).map { p =>
      (0 until 4 + rng.nextInt(5)).map(w => s"w${rng.nextInt(30)}").mkString(" ")
    }
    (1 to 40 + rng.nextInt(60)).map { i =>
      StreamDoc(i.toLong, pool(rng.nextInt(pool.size)))
    }
  }

  /** Cut an ordered sequence into 2–5 random non-empty micro-batches. */
  private def split[T](rng: scala.util.Random, xs: Seq[T]): Seq[Seq[T]] = {
    val k = 2 + rng.nextInt(4)
    val cuts = Seq.fill(k - 1)(1 + rng.nextInt(xs.size - 1)).distinct.sorted
    (Seq(0) ++ cuts ++ Seq(xs.size)).sliding(2).map {
      case Seq(a, b) => xs.slice(a, b)
    }.toSeq.filter(_.nonEmpty)
  }

  test("fuzz replay: the 12 seeded draws regenerate bit-identically") {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    Seeds.foreach { s =>
      drawEvents(s).foreach(e => digest.update(
        s"${e.event_id},${e.ts.getTime},${e.user_id},${e.event_type},${e.value}".getBytes))
      drawDocs(s).foreach(d => digest.update(s"${d.doc_id},${d.text}".getBytes))
    }
    val hex = digest.digest().map("%02x".format(_)).mkString
    assert(hex == "15f5179ccc07a1052e84ad0d1d057fa923e40b534fa100bfc7763aacc84c14a8",
      s"draw digest drifted: $hex")
  }

  test("fuzz replay: random micro-batch splits of windowed aggs are bit-identical to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Seeds.foreach { seed =>
      val rng = new scala.util.Random(9000 + seed)
      val events = drawEvents(seed)
      val batches = split(rng, events)
      // alternate tumbling/sliding across seeds: same contract, both
      // window shapes covered at half the streaming-query cost
      val sliding = seed % 2 == 1
      val stream = MemoryStream[UserEvent]
      val dfS = if (sliding) EventStream.slidingStream(stream.toDF())
                else EventStream.windowedStream(stream.toDF())
      val name = s"rf_win_$seed"
      val q = dfS.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val streamed = spark.table(name)
        .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
      val batchDf = if (sliding) EventStream.slidingAgg(events.toDF())
                    else EventStream.windowedAgg(events.toDF())
      val batch = batchDf.orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch,
        s"seed=$seed sliding=$sliding: ${batches.size}-batch split diverged from batch run")
      spark.catalog.dropTempView(name)
    }
  }

  test("fuzz replay: sessionization-with-state matches the gap-split oracle under random splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 30L * 60 * 1000
    Seeds.foreach { seed =>
      val rng = new scala.util.Random(10000 + seed)
      val events = drawEvents(seed)
      val batches = split(rng, events)
      // independent oracle: per-user gap-split over the sorted times
      val expected = events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        val times = es.map(_.ts.getTime).sorted
        val sessions = Seq.newBuilder[(Long, Long, Long)] // user, start, n
        var start = times.head; var last = times.head; var n = 0L
        times.foreach { t =>
          if (t - last > gapMs) {
            sessions += ((u, start, n)); start = t; n = 0L
          }
          last = t; n += 1
        }
        sessions += ((u, start, n))
        sessions.result()
      }.sorted
      val stream = MemoryStream[UserEvent]
      val name = s"rf_sess_$seed"
      val q = EventStream.sessionizeWithState(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      // far-future flush event (synthetic user 9999) advances the
      // watermark past every open session's timeout so tails close
      val flushT = events.map(_.ts.getTime).max + 12L * 3600 * 1000
      stream.addData(UserEvent(999999L, ts(flushT), 9999L, "flush", 0.0))
      q.processAllAvailable()
      q.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start").getTime,
          r.getAs[Long]("n_events")))
        .filter(_._1 != 9999L).toSeq.sorted
      assert(got == expected,
        s"seed=$seed: ${batches.size}-batch sessionization diverged from the oracle")
      spark.catalog.dropTempView(name)
    }
  }

  test("fuzz replay: dedup-index survivors match first-batch-wins; a retried batch is a no-op") {
    import spark.implicits._
    Seeds.foreach { seed =>
      val rng = new scala.util.Random(11000 + seed)
      val docs = drawDocs(seed)
      val batches = split(rng, docs)
      val scratch = java.nio.file.Files.createTempDirectory(s"graft_rf65_$seed")
      val index = scratch.toString + "/idx"
      batches.zipWithIndex.foreach { case (b, i) =>
        CorpusStream.incrementalDedupBatch(index)(b.toDF(), i.toLong)
      }
      def indexRows() = spark.read.parquet(index)
        .select(col("fp"), col("batch").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val before = indexRows()
      // oracle: each distinct text survives exactly once, in the first
      // batch that contains it (fp = xxhash64(text), computed by Spark
      // itself so the comparison keys agree bit-for-bit)
      val firstBatch = docs.map { d =>
        (d.text, batches.indexWhere(_.exists(_.doc_id == d.doc_id)).toLong)
      }.groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).min) }
      val fpOf = docs.map(_.text).distinct.toDF("text")
        .withColumn("fp", xxhash64(col("text")))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val expected = firstBatch.toSeq.map { case (t, b) => (fpOf(t), b) }.sorted
      assert(before == expected,
        s"seed=$seed: dedup-index survivors diverged from first-batch-wins")
      // at-least-once replay: re-run a random batch verbatim — the
      // retry must rewrite its own partition to the identical content
      val j = rng.nextInt(batches.size)
      CorpusStream.incrementalDedupBatch(index)(batches(j).toDF(), j.toLong)
      assert(indexRows() == before,
        s"seed=$seed: retrying batch $j changed the index — replay is not idempotent")
      val p = new org.apache.hadoop.fs.Path(scratch.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
