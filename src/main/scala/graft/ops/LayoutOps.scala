package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for write paths.
  *
  * At 100 TB the dominant cost of most queries is the scan, and the
  * scan's cost is set by LAYOUT: parquet row-group min/max pruning only
  * helps when rows that are close in query space are close in file
  * space. A single-column sort clusters one dimension and destroys the
  * other; a Z-order (Morton) key interleaves the bits of two dimensions
  * so range predicates on EITHER column prune effectively.
  *
  * The key is a pure bitwise Column expression — 32 shift/mask/add
  * terms, fully whole-stage-codegen'd, no UDF — and clustering is
  * `repartitionByRange(zkey) + sortWithinPartitions(zkey)`: one range
  * shuffle at write time buys min/max locality for every later read.
  * (Hilbert curves cluster marginally better but cost a per-row state
  * machine; Morton is the standard engineering trade.)
  */
object LayoutOps {

  /** Morton interleave of the low 16 bits of two non-negative integral
    * columns: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Bits ≥ 16 are ignored (callers quantize to 16-bit grids first).
    */
  def zorder16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Range-partition + locally sort `df` by the Z-key of (xCol, yCol):
    * the write-path clustering pass. Row groups then carry tight min/max
    * boxes in BOTH dimensions.
    *
    * Each dimension is first scaled onto the full 16-bit grid from its
    * observed min/max (one O(1)-row aggregate, broadcast back). Without
    * this, a dimension whose data range uses fewer bits than the other's
    * surrenders the interleave's high bits entirely — the key degenerates
    * to a single-column sort on the wider dimension. (Production Z-order
    * writers quantize by range or rank for exactly this reason.)
    */
  def clusterByZorder(df: DataFrame, xCol: String, yCol: String,
                      numPartitions: Int): DataFrame = {
    val stats = df.agg(
      min(col(xCol)).cast("double").as("xmin"), max(col(xCol)).cast("double").as("xmax"),
      min(col(yCol)).cast("double").as("ymin"), max(col(yCol)).cast("double").as("ymax"))
    def grid(c: Column, lo: Column, hi: Column): Column =
      least(lit(65535L), floor((c.cast("double") - lo) * 65535.0 /
        greatest(hi - lo, lit(1e-9)))).cast("long")
    df.join(broadcast(stats))
      .withColumn("_zkey", zorder16(
        grid(col(xCol), col("xmin"), col("xmax")),
        grid(col(yCol), col("ymin"), col("ymax"))))
      .drop("xmin", "xmax", "ymin", "ymax")
      .repartitionByRange(numPartitions, col("_zkey"))
      .sortWithinPartitions("_zkey")
  }

  /** q57_zorder — the Z-key itself, oracle-checked as exact integer
    * math: (o_custkey, floor(o_totalprice)) interleaved for a fixed key
    * range. DuckDB reconstructs every bit with div/mod arithmetic, so a
    * single wrong shift breaks the hash. The clustering effect (per-
    * partition bounding-box shrinkage) is asserted in LayoutSpec. [oracle]
    */
  def q57_zorder(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .filter(col("o_orderkey") <= 400)
      .select(col("o_orderkey"), col("o_custkey").cast("long").as("x"),
        floor(col("o_totalprice")).cast("long").as("y"))
      .withColumn("zkey", zorder16(col("x"), col("y")))
      .orderBy("o_orderkey")

  val q57_oracle: String = {
    val terms = (0 until 16).flatMap { i =>
      Seq(s"((x // ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"((y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")
    s"""WITH q AS (
       |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
       |    CAST(FLOOR(o_totalprice) AS BIGINT) AS y
       |  FROM orders WHERE o_orderkey <= 400)
       |SELECT o_orderkey, x, y, CAST($terms AS BIGINT) AS zkey
       |FROM q ORDER BY o_orderkey""".stripMargin
  }
}
