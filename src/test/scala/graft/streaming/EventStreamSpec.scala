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
