package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Pipeline health metrics collected from the SAME job that materializes
  * the frame (Spark's Observation API): row counts, null rates, value
  * sums ride the action for free instead of costing a second 100 TB
  * scan. The standard pattern: observe the frame, write it, then read
  * the metrics off the Observation — if a write lands, its metrics are
  * guaranteed consistent with exactly the rows written.
  */
object Observed {

  /** Attach named metric expressions (aggregates over the full frame) to
    * `df`. Returns the instrumented frame plus the Observation handle;
    * `obs.get` blocks until the frame's FIRST action completes and then
    * yields the metric map.
    */
  def withMetrics(df: DataFrame, name: String,
                  metrics: Seq[(String, Column)]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric expression required")
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }
}
