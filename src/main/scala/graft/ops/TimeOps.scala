package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series operators beyond the q13/q20/q21 basics: Spark's native
  * gap-based session windows, and a bucketized range join — the
  * scale-safe replacement for theta joins on time predicates (a plain
  * `l.ts BETWEEN r.ts-g AND r.ts` join plans as a nested-loop join and
  * dies at scale; bucketing turns it into a hash equi-join).
  */
object TimeOps {

  /** q24_session_window — native session_window (30 min gap) per user:
    * the declarative form of q20's manual gaps-and-islands, and the same
    * operator Structured Streaming uses for streaming sessionization.
    * [oracle: DuckDB gaps-and-islands SQL]
    */
  def q24_session_window(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
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
      .withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_bucket", explode(array_distinct(array(
        expr(s"(_lus + ${lowerUs}L) div ${w}L"),
        expr(s"(_lus + ${upperUs}L) div ${w}L")))))
    val r = right
      .withColumn("_rus", unix_micros(col(rightTs)))
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
}
