package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series operators beyond the q13/q20/q21 basics: Spark's native
  * gap-based session windows, and a bucketized range join — the
  * scale-safe replacement for theta joins on time predicates (a plain
  * `l.ts BETWEEN r.ts-g AND r.ts` join plans as a nested-loop join and
  * dies at scale; bucketing turns it into a hash equi-join).
  */
object TimeOps {

  /** Event-time epoch micros, writer-independent. Timezone-less parquet
    * timestamps (the pandas/arrow convention — TIMESTAMP_NTZ under Spark
    * 4's default inference) and tz'd ones both normalize through
    * `cast("timestamp")`: a no-op on TIMESTAMP, a wall-clock→instant
    * reinterpretation under the session zone (UTC) on NTZ. `unix_micros`
    * alone rejects NTZ at analysis, so every event-time operator goes
    * through this instead of calling it raw — a 100 TB ingest surface
    * cannot dictate which writer produced its parquet.
    */
  def eventMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Event-time column as an instant TIMESTAMP, for time-window operators
    * (`window`/`session_window`) whose output bound types follow the
    * input type; same NTZ normalization as [[eventMicros]].
    */
  def eventTime(c: Column): Column = c.cast("timestamp")

  /** q24_session_window — native session_window (30 min gap) per user:
    * the declarative form of q20's manual gaps-and-islands, and the same
    * operator Structured Streaming uses for streaming sessionization.
    * [oracle: DuckDB gaps-and-islands SQL]
    */
  def q24_session_window(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(session_window(eventTime(col("ts")), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  val q24_oracle: String =
    """WITH seq AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu,
      |    LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events
      |), marked AS (
      |  SELECT user_id, tsu,
      |    CASE WHEN prev IS NULL OR tsu - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM seq
      |), numbered AS (
      |  SELECT user_id, tsu,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked
      |)
      |SELECT user_id,
      |  MIN(tsu) AS session_start,
      |  MAX(tsu) + INTERVAL 30 MINUTE AS session_end,
      |  COUNT(*) AS n_events
      |FROM numbered
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Generic bucketized range join: pairs (l, r) sharing `key` with
    * r.ts ∈ [l.ts + lowerUs, l.ts + upperUs] (microsecond timestamps).
    *
    * Buckets of width (upper - lower) guarantee every matching right row
    * lands in one of the two buckets containing [l+lower, l+upper], so
    * the left side explodes ×2 into an ordinary hash equi-join on
    * (key, bucket) and the exact predicate refines after. Shuffle
    * cardinality is 2|L| + |R| — independent of match count — where the
    * nested-loop plan a theta join produces is |L|·|R| per key.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String,
                lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs > lowerUs, "empty range")
    val w = upperUs - lowerUs
    // `div` = exact integer division (timestamps-since-epoch are positive,
    // so truncation == floor); float division would misbucket at edges
    val l = left
      .withColumn("_lus", eventMicros(col(leftTs)))
      .withColumn("_bucket", explode(array_distinct(array(
        expr(s"(_lus + ${lowerUs}L) div ${w}L"),
        expr(s"(_lus + ${upperUs}L) div ${w}L")))))
    val r = right
      .withColumn("_rus", eventMicros(col(rightTs)))
      .withColumn("_bucket", expr(s"_rus div ${w}L"))
    l.join(r, Seq(key, "_bucket"))
      .filter(col("_rus") >= col("_lus") + lowerUs && col("_rus") <= col("_lus") + upperUs)
      .drop("_bucket", "_lus", "_rus")
  }

  /** q25_range_join — for each event, how many OTHER events of the same
    * user happened in the preceding 10 minutes. [oracle: DuckDB theta
    * join — correct at oracle scale, the thing this operator replaces]
    */
  def q25_range_join(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val l = ev.select(col("user_id"), col("event_id"), col("ts"))
    val r = ev.select(col("user_id"), col("event_id").as("r_id"), col("ts").as("r_ts"))
    rangeJoin(l, r, "user_id", "ts", "r_ts", -10L * 60 * 1000000, 0L)
      .filter(col("r_id") =!= col("event_id"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_prior"))
      .join(l.select("event_id"), Seq("event_id"), "right")
      .select(col("event_id"), coalesce(col("n_prior"), lit(0L)).as("n_prior"))
      .orderBy("event_id")
  }

  val q25_oracle: String =
    """SELECT l.event_id,
      |  CAST(COUNT(r.r_id) AS BIGINT) AS n_prior
      |FROM (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS lus FROM events) l
      |LEFT JOIN (SELECT user_id, event_id AS r_id, epoch_us(CAST(ts AS TIMESTAMP)) AS rus FROM events) r
      |  ON l.user_id = r.user_id AND r.r_id <> l.event_id
      | AND r.rus >= l.lus - 600000000 AND r.rus <= l.lus
      |GROUP BY l.event_id
      |ORDER BY l.event_id""".stripMargin

  /** q55_concurrency — peak concurrent sessions per hour via a
    * PARTITION-WISE sweep line. The textbook sweep (±1 at interval
    * boundaries, global running sum) needs a total order over all
    * boundaries — on Spark that is a single-partition window, the thing
    * that cannot scale. This operator decomposes it:
    *
    *   1. per-hour NET delta (an ordinary groupBy shuffle),
    *   2. exclusive cumsum of the nets over the per-HOUR aggregate —
    *      a single-partition window, but over O(hours) rows, not O(data)
    *      (a century of hours is <1M rows; the frame is bounded by time
    *      span, never by data volume),
    *   3. the within-hour sweep as a window PARTITIONED BY hour, then
    *      peak(h) = offset(h) + max(0, max running-in-hour).
    *
    * Interval ends are exclusive at last_event+1µs; same-instant
    * boundaries order (-1 before +1), and within equal (us, delta) ties
    * any permutation yields the same prefix-sum multiset, so the peak is
    * deterministic cross-engine. Sessions are q20/q24's 30-min-gap rule.
    * [oracle: DuckDB GLOBAL sweep line — the semantics this operator
    * re-expresses scalably]
    */
  def q55_concurrency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 30L * 60 * 1000000
    val hourUs = 3600000000L
    val wUser = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    val sess = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), eventMicros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(wUser))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sid",
        sum(col("brk")).over(wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("us")).as("s_us"), (max(col("us")) + 1L).as("e_us"))
    val bounds = sess.select(col("s_us").as("us"), lit(1L).as("delta"))
      .unionAll(sess.select(col("e_us").as("us"), lit(-1L).as("delta")))
      .withColumn("h", expr(s"us div ${hourUs}L"))
    val net = bounds.groupBy("h")
      .agg(sum(col("delta")).as("net"), count(lit(1)).as("n_boundaries"))
    // exclusive prefix over the per-hour aggregate (tiny by construction)
    val wh = Window.orderBy(col("h").asc).rowsBetween(Window.unboundedPreceding, -1)
    val off = net.withColumn("offset", coalesce(sum(col("net")).over(wh), lit(0L)))
      .select("h", "offset", "n_boundaries")
    val whh = Window.partitionBy("h").orderBy(col("us").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.withColumn("run_in_h", sum(col("delta")).over(whh))
      .groupBy("h").agg(max(col("run_in_h")).as("max_in_h"))
      .join(broadcast(off), Seq("h"))
      .select(col("h"),
        greatest(col("offset"), col("offset") + col("max_in_h")).as("peak_concurrency"),
        col("n_boundaries"))
      .orderBy("h")
  }

  val q55_oracle: String =
    """WITH seq AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC) AS prev
      |  FROM events),
      |marked AS (
      |  SELECT user_id, us,
      |    CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM seq),
      |numbered AS (
      |  SELECT user_id, us,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked),
      |sess AS (
      |  SELECT user_id, sid, MIN(us) AS s_us, MAX(us) + 1 AS e_us
      |  FROM numbered GROUP BY user_id, sid),
      |b AS (
      |  SELECT s_us AS us, 1 AS delta FROM sess
      |  UNION ALL SELECT e_us, -1 FROM sess),
      |run AS (
      |  SELECT us // 3600000000 AS h, delta,
      |    SUM(delta) OVER (ORDER BY us ASC, delta ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM b),
      |hour AS (
      |  SELECT h, CAST(MAX(run) AS BIGINT) AS max_run,
      |    CAST(COUNT(*) AS BIGINT) AS n_boundaries,
      |    CAST(SUM(delta) AS BIGINT) AS net
      |  FROM run GROUP BY h),
      |hoff AS (
      |  SELECT h, max_run, n_boundaries,
      |    CAST(COALESCE(SUM(net) OVER (ORDER BY h ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      |  FROM hour)
      |SELECT CAST(h AS BIGINT) AS h,
      |  GREATEST(off, max_run) AS peak_concurrency, n_boundaries
      |FROM hoff ORDER BY h""".stripMargin
}
