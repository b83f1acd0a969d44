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
}
