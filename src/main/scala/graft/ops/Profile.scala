package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts and min/max —
  * the summary a data-quality layer (reference: ASSERT tests) builds its
  * expectations from.
  *
  * Shape: ONE pass over the table computing every column's aggregates
  * together (a single wide aggregate, map-side partial), then a tiny
  * unpivot of the 1-row result. Profiling N columns costs one scan, not
  * N scans. `count(distinct)` over many columns would multiply shuffles,
  * so distinct counts use exact count_distinct only in the oracle-checked
  * per-column form here; swap `approxDistinct = true` at 100 TB for one
  * HLL pass.
  */
object Profile {

  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"${f.name}__nonnull"),
        (if (approxDistinct) approx_count_distinct(c, 0.01) else countDistinct(c))
          .as(s"${f.name}__distinct"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
    }
    // The multi-distinct agg Expands rows ×(distinct cols + 1) and the
    // partial aggregate runs on the SCAN's partitioning. A small table in
    // one parquet file would serialize that work onto one task, so widen
    // narrow inputs to the cluster's parallelism first; a 100 TB table
    // already has thousands of splits and skips this shuffle.
    val par = spark.sparkContext.defaultParallelism
    // "narrow input" decided from optimizer statistics (bytes /
    // maxPartitionBytes ≈ scan tasks) — df.rdd.getNumPartitions would
    // instantiate the full RDD lineage just to ask the same question
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    val sizeStat = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // stats equal to spark.sql.defaultSizeInBytes mean UNKNOWN (a
    // non-scan input without CBO stats) — treating Long.MaxValue as
    // "huge, skip widening" would silently serialize a small in-memory
    // relation onto one task, so fall back to the physical partition
    // count there (the cheap planner-side question, no job run)
    val approxTasks =
      if (sizeStat == BigInt(spark.sessionState.conf.defaultSizeInBytes))
        df.queryExecution.executedPlan.outputPartitioning.numPartitions.toLong max 1L
      else (sizeStat / maxPart).toLong + 1
    val src = if (approxTasks < par / 2) df.repartition(par) else df
    val row = src.agg(count(lit(1)).as("__rows"), aggs.toIndexedSeq: _*).collect().head
    val nRows = row.getAs[Long]("__rows")
    df.schema.fields.map { f =>
      (f.name, f.dataType.simpleString, nRows,
        row.getAs[Long](s"${f.name}__nonnull"),
        row.getAs[Long](s"${f.name}__distinct"),
        row.getAs[String](s"${f.name}__min"),
        row.getAs[String](s"${f.name}__max"))
    }.toSeq
      .toDF("col_name", "col_type", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")
      .orderBy("col_name")
  }

  /** q27_profile — profile of the orders table. [oracle] */
  def q27_profile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables(spark, dir).orders)

  val q27_oracle: String = {
    val cols = Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint", "o_orderstatus" -> "string",
      "o_totalprice" -> "double", "o_orderdate" -> "timestamp", "o_orderpriority" -> "string")
    cols.map { case (c, t) =>
      // tz-less parquet reads as an instant TIMESTAMP under GraftSession
      // (inferTimestampNTZ=false — the r7/r8 writer-independence seam);
      // DuckDB's naive timestamp stringifies identically under UTC.
      val castT = if (t == "timestamp") s"CAST($c AS TIMESTAMP)" else c
      s"""SELECT '$c' AS col_name, '$t' AS col_type,
         |  (SELECT COUNT(*) FROM orders) AS n_rows,
         |  COUNT($c) AS n_nonnull,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($castT) AS VARCHAR) AS min_val,
         |  CAST(MAX($castT) AS VARCHAR) AS max_val
         |FROM orders""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
  }
}
