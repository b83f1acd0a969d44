package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (deequ-style, re-expressed
  * Spark-first): completeness, uniqueness, value-domain, range, and
  * referential-integrity checks evaluated as FUSED aggregates — one scan
  * per table computes every per-table metric (Catalyst collapses the
  * conjunction of `sum(when(...))` columns into a single partial-agg
  * pass), plus one semi-join for cross-table referential integrity.
  *
  * The 100 TB point: constraint checking must NOT cost one pass per
  * constraint. N per-table checks ride one shared scan; only the
  * cross-table check pays a join, and its pass verdict is an integer
  * count comparison (no double-equality flakiness cross-engine).
  * Thresholded verdicts use integer cross-multiplication
  * (`nn*1000 >= n*999`, never `nn/n >= 0.999`) so the boolean is exact
  * in any engine.
  *
  * Reference scope: PowerSQL ASSERT tests run per-model post-hoc SQL
  * checks (reference: src/testing.rs); this operator is the corpus-scale
  * generalization a warehouse DQ gate needs.
  */
object DataQuality {

  /** q56_dq_suite — 8 constraints over orders/lineitem emitted as
    * (check_name, metric, passed) rows: per-table metrics from one fused
    * aggregate each, referential integrity from a left-semi count, all
    * unpivoted via a single explode (no per-constraint plan branches).
    * [oracle]
    */
  def q56_dq_suite(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders
    val l = t.lineitem

    val omet = o.agg(
      count(lit(1)).as("o_n"),
      sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("custkey_nn"),
      countDistinct(col("o_orderkey")).as("orderkey_d"),
      sum(when(col("o_totalprice") >= 0, 1L).otherwise(0L)).as("price_nonneg"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("status_dom"),
      sum(when(col("o_orderdate").cast("date").between(
        lit("1992-01-01").cast("date"), lit("1998-12-31").cast("date")), 1L)
        .otherwise(0L)).as("date_rng"))

    val lmet = l.agg(
      count(lit(1)).as("l_n"),
      sum(when(col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("qty_rng"),
      sum(when(col("l_discount").between(0, 0.1), 1L).otherwise(0L)).as("disc_rng"))

    val ri = l.join(o.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
      .agg(count(lit(1)).as("ri_n"))

    // three 1-row frames → one row → explode the constraint structs
    def c(name: String, num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column,
          passed: org.apache.spark.sql.Column) =
      struct(lit(name).as("check_name"),
        round(num.cast("double") / den, 6).as("metric"), passed.as("passed"))

    omet.crossJoin(lmet).crossJoin(ri)
      .select(explode(array(
        c("lineitem.l_discount.in_range", col("disc_rng"), col("l_n"),
          col("disc_rng") === col("l_n")),
        c("lineitem.l_orderkey.ref_integrity", col("ri_n"), col("l_n"),
          col("ri_n") === col("l_n")),
        c("lineitem.l_quantity.in_range", col("qty_rng"), col("l_n"),
          col("qty_rng") === col("l_n")),
        c("orders.o_custkey.completeness", col("custkey_nn"), col("o_n"),
          col("custkey_nn") * 1000L >= col("o_n") * 999L),
        c("orders.o_orderdate.in_range", col("date_rng"), col("o_n"),
          col("date_rng") === col("o_n")),
        c("orders.o_orderkey.uniqueness", col("orderkey_d"), col("o_n"),
          col("orderkey_d") === col("o_n")),
        c("orders.o_orderstatus.domain", col("status_dom"), col("o_n"),
          col("status_dom") === col("o_n")),
        c("orders.o_totalprice.non_negative", col("price_nonneg"), col("o_n"),
          col("price_nonneg") === col("o_n"))
      )).as("c"))
      .select(col("c.check_name"), col("c.metric"), col("c.passed"))
      .orderBy("check_name")
  }

  val q56_oracle: String =
    """WITH o AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS custkey_nn,
      |    COUNT(DISTINCT o_orderkey) AS orderkey_d,
      |    SUM(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS price_nonneg,
      |    SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS status_dom,
      |    SUM(CASE WHEN CAST(o_orderdate AS DATE)
      |      BETWEEN DATE '1992-01-01' AND DATE '1998-12-31' THEN 1 ELSE 0 END) AS date_rng
      |  FROM orders),
      |l AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS qty_rng,
      |    SUM(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 1 ELSE 0 END) AS disc_rng
      |  FROM lineitem),
      |ri AS (
      |  SELECT COUNT(*) AS n_match FROM lineitem
      |  WHERE l_orderkey IN (SELECT o_orderkey FROM orders))
      |SELECT * FROM (
      |  SELECT 'lineitem.l_discount.in_range' AS check_name,
      |    ROUND(CAST(disc_rng AS DOUBLE)/n, 6) AS metric, disc_rng = n AS passed FROM l
      |  UNION ALL SELECT 'lineitem.l_orderkey.ref_integrity',
      |    ROUND(CAST(ri.n_match AS DOUBLE)/l.n, 6), ri.n_match = l.n FROM l, ri
      |  UNION ALL SELECT 'lineitem.l_quantity.in_range',
      |    ROUND(CAST(qty_rng AS DOUBLE)/n, 6), qty_rng = n FROM l
      |  UNION ALL SELECT 'orders.o_custkey.completeness',
      |    ROUND(CAST(custkey_nn AS DOUBLE)/n, 6), custkey_nn*1000 >= n*999 FROM o
      |  UNION ALL SELECT 'orders.o_orderdate.in_range',
      |    ROUND(CAST(date_rng AS DOUBLE)/n, 6), date_rng = n FROM o
      |  UNION ALL SELECT 'orders.o_orderkey.uniqueness',
      |    ROUND(CAST(orderkey_d AS DOUBLE)/n, 6), orderkey_d = n FROM o
      |  UNION ALL SELECT 'orders.o_orderstatus.domain',
      |    ROUND(CAST(status_dom AS DOUBLE)/n, 6), status_dom = n FROM o
      |  UNION ALL SELECT 'orders.o_totalprice.non_negative',
      |    ROUND(CAST(price_nonneg AS DOUBLE)/n, 6), price_nonneg = n FROM o
      |) ORDER BY check_name""".stripMargin
}
