package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Shannon entropy (bits) of a categorical column — a custom typed
  * `Aggregator`, the engine's extension point for aggregation semantics
  * Spark lacks (SURVEY §3 preference (b): typed agg before any
  * row-at-a-time UDF). The buffer is a value→count map, merged
  * associatively, so it distributes exactly like the builtin aggregates:
  * partial maps per task, one shuffle of (group, buffer) pairs.
  * State is bounded by the column's distinct-value count — right for
  * categorical columns; for high-cardinality inputs swap the exact map
  * for a CMS/HLL-backed estimator behind the same interface.
  */
object EntropyAggregator extends Aggregator[String, Map[String, Long], Double] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], v: String): Map[String, Long] = {
    val k = if (v == null) "" else v
    b.updated(k, b.getOrElse(k, 0L) + 1L)
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (k, n)) => acc.updated(k, acc.getOrElse(k, 0L) + n) }

  override def finish(counts: Map[String, Long]): Double = {
    val total = counts.values.sum.toDouble
    if (total == 0) 0.0
    else -counts.values.foldLeft(0.0) { (acc, n) =>
      val p = n / total
      acc + p * (math.log(p) / math.log(2.0))
    }
  }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** q26_entropy — per-user entropy of the event-type distribution
    * (behavioral diversity score). [oracle: DuckDB's native entropy()]
    */
  def q26_entropy(spark: SparkSession, dir: String): DataFrame = {
    val e = udaf(EntropyAggregator)
    Tables(spark, dir).events
      .groupBy("user_id")
      .agg(
        round(e(col("event_type")), 6).as("type_entropy"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val q26_oracle: String =
    """SELECT user_id,
      |  ROUND(entropy(event_type), 6) AS type_entropy,
      |  COUNT(*) AS n_events
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin
}
