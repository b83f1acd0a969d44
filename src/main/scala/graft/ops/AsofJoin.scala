package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * right.ts <= left.ts within the same key — the canonical time-series
  * enrichment operator (quotes→trades, clicks→purchases) that Spark has
  * no builtin for.
  *
  * Implementation is the union-sort trick, not a range join: tag both
  * sides, union, sort within each key by (ts, side) and take
  * last(right_payload, ignoreNulls) over the running frame. Exactly one
  * shuffle on the key (the same shuffle any per-key op would pay), state
  * O(1) per row, no (left × right-candidate-range) blowup — this is the
  * shape that survives 100 TB where a theta-join on ts ranges would not.
  */
object AsofJoin {

  /** Generic as-of join. `rightPayload` columns come back nested in an
    * `asof` struct (null when no right row precedes the left row).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val payloadStruct = struct(rightPayload.map(col): _*)
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
    val r = right
      .select(Seq(col(key), col(ts)) :+ payloadStruct.as("_payload"): _*)
      .withColumn("_side", lit(0))
    // align schemas: right rows carry nulls for the left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    // side 0 sorts before side 1 at equal ts → right rows at exactly
    // left.ts are visible (ASOF >= semantics)
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_payload")
  }

  /** q23_asof_join — for every purchase, the user's latest click at or
    * before the purchase time. [oracle: DuckDB native ASOF LEFT JOIN]
    */
  def q23_asof_join(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    asofJoin(purchases, clicks, key = "user_id", ts = "ts",
        rightPayload = Seq("click_id", "click_value"))
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        col("asof.click_id").as("click_id"),
        col("asof.click_value").as("click_value"))
      .orderBy("purchase_id")
  }

  val q23_oracle: String =
    """SELECT l.event_id AS purchase_id, l.user_id,
      |       r.click_id, r.click_value
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu, value
      |      FROM events WHERE event_type = 'purchase') l
      |ASOF LEFT JOIN
      |     (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu,
      |             event_id AS click_id, value AS click_value
      |      FROM events WHERE event_type = 'click') r
      |  ON l.user_id = r.user_id AND l.tsu >= r.tsu
      |ORDER BY purchase_id""".stripMargin
}

/** Skew handling: explicit salting for fact⋈fact joins where one key is
  * degenerate (the null-key user, the default partition, the viral item).
  * AQE's skew-join split handles moderate skew at runtime
  * (enabled in GraftSession); salting is the deliberate version for keys
  * known to be pathological: the skewed side gets a random salt in
  * [0, factor), the other side is replicated `factor` times, and the join
  * key becomes (key, salt) — one hot partition becomes `factor` even ones
  * at the cost of replicating the smaller side.
  */
object Skew {

  def saltedJoin(skewed: DataFrame, other: DataFrame,
                 skewedKey: String, otherKey: String, factor: Int): DataFrame = {
    val salted = skewed.withColumn("_salt", (rand(42) * factor).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          salted(skewedKey) === replicated(otherKey))
      .drop("_salt")
  }

  /** Advisor-driven salting: measures the skewed side's key distribution
    * and applies [[saltedJoin]] with the salt factor q59's skew report
    * recommends — ceil(max_cnt / avg_cnt), capped at `maxFactor` (the
    * replication cost ceiling). Factor ≤ 1 (no skew) degrades to the
    * plain join with zero overhead. The measurement is one
    * partial-aggregated groupBy collapsed to a 1-row collect — the
    * pre-flight a deliberate 100 TB join pays once, not per row; reuse
    * the q59 report if it was already run.
    */
  def saltedJoinAuto(skewed: DataFrame, other: DataFrame,
                     skewedKey: String, otherKey: String,
                     maxFactor: Int = 32): DataFrame = {
    val row = skewed.groupBy(skewedKey).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"))
      .collect().head
    val factor =
      if (row.isNullAt(1) || row.getAs[Long]("n_rows") == 0L) 1
      else {
        val nKeys = row.getAs[Long]("n_keys")
        val nRows = row.getAs[Long]("n_rows")
        val maxCnt = row.getAs[Long]("max_cnt")
        math.min(maxFactor.toLong, (maxCnt * nKeys + nRows - 1) / nRows).toInt
      }
    if (factor <= 1) skewed.join(other, skewed(skewedKey) === other(otherKey))
    else saltedJoin(skewed, other, skewedKey, otherKey, factor)
  }
}
