package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class TimeOpsSpec extends SparkSpec {

  test("rangeJoin equals the naive theta join, but plans as a hash equi-join") {
    val ev = Tables(spark, sfDir).events
    val l = ev.select(col("user_id"), col("event_id"), col("ts"))
    val r = ev.select(col("user_id"), col("event_id").as("r_id"), col("ts").as("r_ts"))

    val bucketized = TimeOps.rangeJoin(l, r, "user_id", "ts", "r_ts",
        -10L * 60 * 1000000, 0L)
      .select("event_id", "r_id")
    val naive = l.join(r,
        l("user_id") === r("user_id") &&
          unix_micros(col("r_ts")) >= unix_micros(col("ts")) - 600000000L &&
          unix_micros(col("r_ts")) <= unix_micros(col("ts")))
      .select("event_id", "r_id")

    assert(bucketized.count() == naive.count())
    assert(bucketized.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketized).count() == 0)

    val plan = bucketized.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "range join must be an equi-join on (key, bucket)")
  }

  test("q24 session_window groups match manual gaps-and-islands (q20 counts)") {
    val sessions = TimeOps.q24_session_window(spark, sfDir)
    val perUser = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val q20 = graft.queries.Relational.q20_sessionize(spark, sfDir)
    val joined = perUser.join(q20.withColumnsRenamed(
        Map("n_sessions" -> "q20_sessions", "n_events" -> "q20_events")), Seq("user_id"))
    assert(joined.filter(
      col("n_sessions") =!= col("q20_sessions") || col("n_events") =!= col("q20_events")
    ).count() == 0)
  }

  /** Independent-implementation cross-check for the partition-wise sweep
    * line: the spec recomputes peak concurrency with the textbook GLOBAL
    * running sum (single unpartitioned window — fine at test scale, the
    * exact thing q55 exists to avoid at 100 TB) and demands row-for-row
    * agreement.
    */
  test("q55 partition-wise sweep equals the global sweep line") {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 30L * 60 * 1000000
    val wUser = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    val sess = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(wUser))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sid",
        sum(col("brk")).over(wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("us")).as("s_us"), (max(col("us")) + 1L).as("e_us"))
    val bounds = sess.select(col("s_us").as("us"), lit(1L).as("delta"))
      .unionAll(sess.select(col("e_us").as("us"), lit(-1L).as("delta")))
    val wg = Window.orderBy(col("us").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val globalPeaks = bounds
      .withColumn("run", sum(col("delta")).over(wg))
      .withColumn("h", expr("us div 3600000000"))
      .groupBy("h")
      .agg(max(col("run")).as("max_run"), count(lit(1)).as("n_boundaries"),
        sum(col("delta")).as("net"))
      .withColumn("off", coalesce(sum(col("net")).over(
        Window.orderBy(col("h").asc).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("h"), greatest(col("off"), col("max_run")).as("peak_concurrency"),
        col("n_boundaries"))

    val fast = TimeOps.q55_concurrency(spark, sfDir)
    assert(fast.count() > 0)
    assert(fast.exceptAll(globalPeaks).count() == 0)
    assert(globalPeaks.exceptAll(fast).count() == 0)
    // every peak is positive: each hour present has at least one boundary
    assert(fast.filter(col("peak_concurrency") < 0).count() == 0)
  }
}
