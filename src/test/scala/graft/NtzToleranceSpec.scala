package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Writer-independence contract for event time (VERDICT r7 item 4).
  *
  * pandas/arrow pipelines write tz-less parquet timestamps
  * (`timestamp[us]`, isAdjustedToUTC=false) — Spark 4's default inference
  * reads those as TIMESTAMP_NTZ, which `unix_micros`/window operators
  * reject or propagate. The round-7 testdata regeneration switched writer
  * conventions mid-round and broke every event-time entry; this spec pins
  * the two-layer defense so that can never recur:
  *
  *   1. GraftSession disables NTZ inference, so tz-less parquet surfaces
  *      as TIMESTAMP under the engine's own sessions;
  *   2. the operators themselves normalize via `TimeOps.eventMicros`/
  *      `eventTime` (cast-to-timestamp discipline) and `Tables.events`
  *      casts NTZ through the UTC session zone — so the SAME entries
  *      still run, with identical results, under a foreign session that
  *      re-enables inference.
  *
  * The fixture is generated in-test as a genuinely NTZ-typed parquet (the
  * exact pandas shape), not a copy of driver data.
  */
class NtzToleranceSpec extends SparkSpec {

  /** The event-time entry family: everything that reads events.ts. */
  private val timeEntries = Seq(
    "q20_sessionize", "q23_asof_join", "q24_session_window",
    "q25_range_join", "q48_scd2", "q50_window_countd", "q51_resample",
    "q55_concurrency", "q58_sliding_window", "q61_temporal_join")

  /** events rewritten with a true TIMESTAMP_NTZ ts column (what a pandas
    * `to_parquet` emits), alongside the tz'd original for comparison.
    */
  private lazy val ntzDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_").toString
    Tables(spark, sfDir).events
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("tz-less parquet reads as TIMESTAMP under the engine session") {
    val ts = Tables(spark, ntzDir).events.schema("ts").dataType
    assert(ts == TimestampType,
      s"GraftSession must read tz-less parquet event time as TIMESTAMP, got $ts")
  }

  test("every event-time entry runs identically on the NTZ-written fixture") {
    timeEntries.foreach { name =>
      val fn = SparkEntry.queries(name)
      assert(sortedRows(fn(spark, ntzDir)) == sortedRows(fn(spark, sfDir)),
        s"$name differs between NTZ-written and tz'd event time")
    }
  }

  test("entries survive a foreign session with NTZ inference enabled") {
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    spark.conf.set(key, "true")
    try {
      // under inference the raw file really is NTZ...
      val raw = spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType
      assert(raw == TimestampNTZType, s"fixture must be NTZ-typed, got $raw")
      // ...Tables normalizes it back to an instant...
      assert(Tables(spark, ntzDir).events.schema("ts").dataType == TimestampType)
      // ...and the operators' cast discipline yields the same results.
      timeEntries.foreach { name =>
        val fn = SparkEntry.queries(name)
        assert(sortedRows(fn(spark, ntzDir)) == sortedRows(fn(spark, sfDir)),
          s"$name differs under inferTimestampNTZ=true")
      }
    } finally spark.conf.set(key, "false")
  }
}
