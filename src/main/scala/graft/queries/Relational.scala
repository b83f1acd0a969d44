package graft.queries

import graft.Tables
import graft.ops.TimeOps.{eventMicros, eventTime}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim, SparkSession}
import org.apache.spark.sql.functions._
import graft.Caching.PersistSyntax
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType}
import org.apache.spark.sql.expressions.Window

/** The relational query surface (SURVEY §2B), written DataFrame-first so
  * Catalyst owns physical planning: predicate/projection pushdown into the
  * parquet scans, broadcast joins for dims, partial aggregation, AQE.
  *
  * Reference context: PowerSQL pushes this entire layer to PostgreSQL or
  * BigQuery (reference: src/execute.rs:21-28); graft executes it natively.
  *
  * Oracle-match discipline (SURVEY §4): money aggregates go through exact
  * DECIMAL(18,4) sums and are only converted to double after ROUND(.,2),
  * so Spark and DuckDB produce bit-identical doubles regardless of
  * summation order. Every output is deterministically globally ordered.
  */
object Relational {

  /** Exact, order-independent money aggregate: decimal sum → round → double. */
  private def money(c: Column): Column =
    round(sum(c.cast(DecimalType(18, 4))), 2).cast("double")

  /** q1_agg — TPC-H Q1-style multi-aggregate scan.
    * Scale: single shuffle on the (tiny-cardinality) group keys; Spark
    * plans partial (map-side) aggregation before it, so the shuffle
    * carries one row per key per task regardless of input size.
    */
  def q1_agg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        money(col("l_quantity")).as("sum_qty"),
        money(col("l_extendedprice")).as("sum_base_price"),
        money(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q2_filter_project — selective filter + narrow projection; both must
    * reach the scan (PushedFilters / ReadSchema) so at 100 TB only the
    * needed row-groups and columns are read.
    */
  def q2_filter_project(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_quantity") < 10
      )
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q3_join_broadcast — fact⋈dim with an explicit broadcast hint: the
    * customer dim is O(SF·150k) rows, always broadcastable, so the join
    * is shuffle-free over the orders fact table.
    */
  def q3_join_broadcast(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        money(col("o_totalprice")).as("revenue")
      )
      .orderBy("c_mktsegment")
  }

  /** q4_join_shuffle — fact⋈fact join (lineitem⋈orders): both sides large
    * at scale, so this is a shuffle join on the key; AQE handles skew.
    */
  def q4_join_shuffle(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        money(col("l_extendedprice")).as("total_price")
      )
      .orderBy("o_orderpriority")
  }

  /** q5_outer_join — left outer join preserving customers with no orders. */
  def q5_outer_join(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(money(col("o_totalprice")), lit(0.0)).as("total_spent")
      )
      .orderBy("c_custkey")
  }

  /** q6_semi_anti — EXISTS / NOT EXISTS as left-semi / left-anti joins
    * (no row multiplication, one shuffle each on the join key).
    */
  def q6_semi_anti(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val withOrders = t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n"))
      .select(lit("with_orders").as("cohort"), col("n"))
    val withoutOrders = t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("without_orders").as("cohort"), col("n"))
    withOrders.unionAll(withoutOrders).orderBy("cohort")
  }

  /** q7_topk — global top-k: Catalyst plans TakeOrderedAndProject, i.e.
    * per-partition heaps + driver merge of k rows, never a global sort.
    */
  def q7_topk(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(25)
  }

  /** q8_window_rank — top-3 orders per market segment via row_number. */
  def q8_window_rank(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window
      .partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("c_mktsegment", "rn")
  }

  /** q9_window_running — running (prefix) sum + lag per customer; the
    * running sum uses the exact-decimal money discipline inside the frame.
    */
  def q9_window_running(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t.orders
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum(col("o_totalprice").cast(DecimalType(18, 4)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .cast("double").as("running_total"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price")
      )
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q10_setops — UNION / INTERSECT / EXCEPT over customer vs supplier
    * nation sets, tagged and stacked.
    */
  def q10_setops(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // each distinct input feeds three set-op branches: persist the two
    // scan+distinct computations once instead of re-running them per
    // branch (6 scans + 6 shuffles → 2 at any scale)
    val cn = t.customer.select(col("c_nationkey").as("nationkey")).distinct()
      .persistTracked
    val sn = t.supplier.select(col("s_nationkey").as("nationkey")).distinct()
      .persistTracked
    val u = cn.union(sn).distinct().select(lit("union").as("op"), col("nationkey"))
    val i = cn.intersect(sn).select(lit("intersect").as("op"), col("nationkey"))
    val e = cn.except(sn).select(lit("except").as("op"), col("nationkey"))
    u.unionAll(i).unionAll(e).orderBy("op", "nationkey")
  }

  /** q11_cte_subquery — scalar-subquery threshold (customers above the
    * global average balance). The scalar aggregate is computed once and
    * broadcast into the filter.
    */
  def q11_cte_subquery(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val avgBal = t.customer.agg(avg(col("c_acctbal")).as("a"))
    t.customer
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a"))
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** q12_case_string — CASE/WHEN bucketing + string functions, all
    * codegen'd builtins (no UDFs in the hot path).
    */
  def q12_case_string(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.part
      .select(
        col("p_partkey"),
        when(col("p_size") < 10, lit("small"))
          .when(col("p_size") < 30, lit("medium"))
          .otherwise(lit("large")).as("size_class"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        col("p_type").like("%a%").as("has_a")
      )
      .orderBy("p_partkey")
  }

  /** q13_date — time-series aggregation: month bucket × event type. */
  def q13_date(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(
        date_trunc("month", col("ts")).as("month"),
        col("event_type")
      )
      .agg(
        count(lit(1)).as("n_events"),
        money(col("value")).as("total_value")
      )
      .orderBy("month", "event_type")
  }

  /** q14_pivot — genuine relational pivot (wide conditional aggregation):
    * quantity by line status × return flag.
    */
  def q14_pivot(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(money(col("l_quantity")))
      .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))
      .orderBy("l_linestatus")
  }

  /** q15_rollup — ROLLUP grouping sets with grouping_id; NULL group keys
    * are ordered NULLS FIRST explicitly so engines agree.
    */
  def q15_rollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        money(col("l_quantity")).as("sum_qty")
      )
      .orderBy(
        col("gid").asc,
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first
      )
  }

  /** q16_having — post-aggregation filter on group counts. */
  def q16_having(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.part
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"), money(col("p_retailprice")).as("shelf_value"))
      .filter(col("n_parts") > 2)
      .orderBy("p_brand")
  }

  /** q17_countd — exact distinct counting per group (oracle-checked;
    * the approximate HLL variant is q17b, rows-only).
    */
  def q17_countd(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows")
      )
      .orderBy("l_returnflag")
  }

  /** q17b_approx_countd — approx_count_distinct (HyperLogLog++): the
    * 100 TB path where exact distinct would shuffle every key. rsd=0.01.
    * DuckDB's HLL is a different sketch, so raw approx values can't
    * hash-match; instead the entry emits the engine-independent error
    * INVARIANT — |approx − exact| ≤ 3·rsd·exact per group — alongside the
    * exact counts. The oracle computes the exact side and asserts the
    * bound literally TRUE, so a sketch regression breaks the hash. [oracle]
    */
  def q17b_approx_countd(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rsd = 0.01
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"),
        approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), rsd).as("approx_supps")
      )
      .select(
        col("l_returnflag"), col("exact_parts"), col("exact_supps"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double")
          <= lit(3 * rsd) * col("exact_parts")).as("parts_within_bound"),
        (abs(col("approx_supps") - col("exact_supps")).cast("double")
          <= lit(3 * rsd) * col("exact_supps")).as("supps_within_bound")
      )
      .orderBy("l_returnflag")
  }

  /** q18_star_revenue — TPC-H Q5-style star join: fact⋈fact shuffle join
    * (lineitem⋈orders) then broadcast dims customer→nation→region.
    */
  def q18_star_revenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        money(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy("r_name", "n_name")
  }

  /** q19_json_extract — semi-structured extraction from events.props
    * (JSON string) via get_json_object, then aggregate.
    */
  def q19_json_extract(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k")
      )
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** q20_sessionize — event sessionization: a session break is a >30 min
    * gap per user; session ids are prefix sums of breaks. Single shuffle
    * on user_id; everything else is within-partition window work.
    */
  def q20_sessionize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    t.events
      .select(col("user_id"), col("event_id"), eventMicros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn(
        "is_break",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 30L * 60 * 1000000, 1L)
          .otherwise(0L)
      )
      .withColumn(
        "session_id",
        sum(col("is_break")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .groupBy("user_id")
      .agg(
        max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events")
      )
      .orderBy("user_id")
  }

  /** q28_window_ranks — the full ranking-function family over one
    * window: dense_rank, ntile, percent_rank, cume_dist. Ratios are
    * exact integer fractions, so they compare bit-identically across
    * engines. Unique (balance, custkey) ordering keeps every rank
    * deterministic.
    */
  def q28_window_ranks(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t.customer
      .select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        dense_rank().over(w).cast("long").as("drank"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
      .orderBy("c_mktsegment", "drank", "c_custkey")
  }

  /** q29_scalar_funcs — breadth of the scalar-function surface: string
    * manipulation (reverse/lpad/repeat/left/instr/split_part/translate)
    * and conditionals (nullif/greatest/least), all codegen'd builtins.
    */
  def q29_scalar_funcs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part.selectExpr(
      "p_partkey",
      "reverse(p_brand) AS brand_rev",
      "lpad(p_brand, 12, '.') AS brand_pad",
      "repeat(left(p_type, 2), 3) AS type_rep",
      "CAST(instr(p_name, 'a') AS BIGINT) AS a_pos",
      "split_part(p_type, ' ', 1) AS type_first",
      "translate(p_brand, 'ab', 'xy') AS brand_tr",
      "nullif(p_size, 10) AS size_nn",
      "greatest(p_size, 25) AS size_hi",
      "least(p_size, 25) AS size_lo"
    ).orderBy("p_partkey")

  /** q22_stats — statistical aggregates: exact interpolated percentiles,
    * sample stddev, correlation. Spark computes these with mergeable
    * partial states (percentile buffers / moment sketches), so they
    * distribute like any other agg; outputs rounded to absorb sub-ulp
    * summation-order differences vs the oracle.
    */
  def q22_stats(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 2).as("median_qty"),
        round(expr("percentile(l_quantity, 0.95)"), 2).as("p95_qty"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp")
      )
      .orderBy("l_returnflag")
  }

  /** q21_stream_window — tumbling event-time window (1 h) × event type.
    * Identical transform runs under Structured Streaming with a watermark
    * (see graft.streaming.EventStream); here it runs in batch for the
    * oracle. window("1 hour").start == date_trunc('hour', ts).
    */
  def q21_stream_window(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream
      .windowedAgg(Tables(spark, dir).events)
      .orderBy("window_start", "event_type")

  /** q58_sliding_window — OVERLAPPING time windows (1 h length, 15 min
    * slide): each event contributes to exactly 4 windows. Spark's
    * `window()` plans this as a narrow ×4 Expand before the aggregate —
    * partial aggregation still applies, so the shuffle carries window
    * aggregates, not the ×4 event fan-out. The sliding shape q21's
    * tumbling windows can't express (and the same operator Structured
    * Streaming uses for sliding-window aggs). [oracle: explicit k=0..3
    * window-start enumeration]
    */
  def q58_sliding_window(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(window(eventTime(col("ts")), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), money(col("value")).as("total"))
      .select(eventMicros(col("window.start")).as("ws"), col("event_type"),
        col("n"), col("total"))
      .orderBy("ws", "event_type")

  /** q62_lateral — correlated LATERAL subquery with ORDER BY + LIMIT
    * (top-2 customers per nation): the SQL-standard per-row-subquery
    * form of top-k-per-group. ONE text runs verbatim on Spark and DuckDB
    * (q41/q47's frontend-parity discipline). Catalyst DECORRELATES the
    * lateral into a join + per-group limit — the executed plan is the
    * same bounded-k shape as q42's native operator, never an actual
    * per-outer-row subquery execution (the thing that cannot scale).
    */
  def q62_lateral(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).register(Seq("nation","customer"))
    spark.sql(LATERAL_TEXT)
  }

  /** Runs unchanged on Spark AND DuckDB. */
  val LATERAL_TEXT: String =
    """SELECT n.n_name, c.c_name, c.c_acctbal
      |FROM nation n CROSS JOIN LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
      |ORDER BY n.n_name ASC, c.c_acctbal DESC, c.c_name ASC""".stripMargin

  /** q63_recursive — `WITH RECURSIVE` transitive closure (reachability +
    * bounded path counting from nation 0 over the high-value trade
    * graph), ONE text verbatim on Spark 4 and DuckDB — the q41/q47/q62
    * frontend-parity discipline applied to the last SQL construct the
    * reference's warehouse backends accept that graft's frontend did not
    * (the reference pushes model SQL through unparsed, reference:
    * src/execute.rs:100-103, so a PG-origin PowerSQL project may contain
    * recursive CTEs). Spark's recursion accepts UNION ALL only, so the
    * text bounds depth (hops < 3) and deduplicates in the outer
    * GROUP BY — the portable recursive-CTE shape. All-integer (hop
    * counts, path counts), so the result hash-matches cross-engine.
    * Scale shape (the round-4 `weak` fix): Spark INLINES a non-recursive
    * CTE referenced inside the loop, so writing the edge aggregation as
    * a CTE re-executed the 4-table join + DISTINCT every iteration
    * (measured 4.4× records read at sf0.1; at 100 TB that is four extra
    * passes over lineitem⋈orders⋈customer⋈supplier). So the contracted
    * edge table is MATERIALIZED first — one pass, `localCheckpoint`
    * cuts the lineage exactly like g1's contracted-graph discipline —
    * and the verbatim recursive text joins the materialized table
    * (PlanSpec asserts the loop never touches parquet; total records
    * read ≈ one edges pass). In a PowerSQL project this is simply two
    * models (`CREATE TABLE trade_edges AS …;` then the recursive model —
    * GraftCliSpec's recursive-model test runs exactly that shape), so
    * the benched entry now carries the shape real projects ship.
    */
  def q63_recursive(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).register(Seq("lineitem","orders","customer","supplier"))
    // one edges pass, materialized; eager localCheckpoint cuts lineage so
    // each recursion step re-reads ~600 contracted rows, never the facts.
    // The view is NAMESPACED (graft_q63_…) so it cannot collide with
    // user/model views in a shared session, and the PRIOR invocation's
    // checkpoint blocks are unpersisted eagerly instead of lingering
    // until ContextCleaner GC.
    val edges = spark.sql(EDGES_TEXT).localCheckpoint()
    Option(q63PriorEdges.put(spark, edges)).foreach { old =>
      GraftColumnShim.logicalPlan(old).collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      }
    }
    edges.createOrReplaceTempView("graft_q63_trade_edges")
    spark.sql(RECURSIVE_TEXT)
  }

  /** Per-session handle to the previous q63 checkpoint so re-invocation
    * frees its blocks immediately (bounded: one entry per live session).
    */
  private val q63PriorEdges =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]()

  /** The contracted-edge aggregation — shared verbatim with the oracle,
    * where it is the non-recursive `trade_edges` CTE.
    */
  val EDGES_TEXT: String =
    """SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |WHERE o.o_totalprice > 400000 AND c.c_nationkey <> s.s_nationkey""".stripMargin

  /** The recursion over the materialized `trade_edges` table — runs
    * unchanged on Spark AND DuckDB (recursive UNION ALL).
    */
  val RECURSIVE_TEXT: String =
    """WITH RECURSIVE
      |reach AS (
      |  SELECT CAST(0 AS BIGINT) AS nation, CAST(0 AS BIGINT) AS hops
      |  UNION ALL
      |  SELECT CAST(e.dst AS BIGINT) AS nation, r.hops + 1 AS hops
      |  FROM reach r JOIN graft_q63_trade_edges e ON e.src = r.nation
      |  WHERE r.hops < 3
      |)
      |SELECT nation, MIN(hops) AS min_hops, CAST(COUNT(*) AS BIGINT) AS n_paths
      |FROM reach GROUP BY nation ORDER BY nation""".stripMargin

  /** DuckDB oracle: the SAME two texts, with the materialized table
    * expressed as the non-recursive CTE (DuckDB executes its CTEs once,
    * so both engines run one edges pass + the identical recursion).
    */
  val q63_oracle: String = RECURSIVE_TEXT.replace(
    "WITH RECURSIVE\n",
    s"WITH RECURSIVE\ngraft_q63_trade_edges AS (\n$EDGES_TEXT\n),\n")

  /** q61_temporal_join — point-in-interval join against the SCD2
    * dimension q48 builds: each event is enriched with the dimension
    * VERSION that was valid at the event's timestamp
    * (valid_from ≤ ts < valid_to, open interval = current). The standard
    * "fact joins dimension as-of event time" warehouse pattern. Shape:
    * an equi-join on the entity key plus the interval filter — correct
    * and scalable because SCD2 guarantees O(versions-per-key) matches,
    * never a cross product; versions-per-event is then aggregated to
    * keep the output compact. [oracle]
    */
  def q61_temporal_join(spark: SparkSession, dir: String): DataFrame = {
    val dim = scd2Frame(spark, dir)
      .select(col("user_id"), col("version"), col("event_type").as("dim_type"),
        col("valid_from_us"), col("valid_to_us"))
    val facts = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), eventMicros(col("ts")).as("us"))
    facts.join(dim, Seq("user_id"))
      .filter(col("us") >= col("valid_from_us") &&
        (col("valid_to_us").isNull || col("us") < col("valid_to_us")))
      .groupBy("user_id", "dim_type")
      .agg(count(lit(1)).as("n_events"), max(col("version")).as("max_version"))
      .orderBy("user_id", "dim_type")
  }

  /** q60_variant — Spark 4's VARIANT type: semi-structured data parsed
    * once into the binary variant encoding (`parse_json`), then
    * navigated with TYPED paths (`variant_get(v, '$.p.k', 'long')`) —
    * shredded access without a fixed schema, the engine-native answer to
    * schemaless JSON at scale (no per-access string re-parsing, unlike
    * get_json_object chains). `try_variant_get` pins the missing-path
    * NULL contract. The oracle computes the same result from the raw
    * JSON/base columns — proving variant navigation changes the
    * representation, never the semantics (q49's map-free-oracle
    * pattern). [oracle]
    */
  def q60_variant(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .withColumn("vj", concat(lit("{\"p\": "), col("props"),
        lit(", \"user\": "), col("user_id").cast("string"), lit("}")))
      .withColumn("v", parse_json(col("vj")))
      .select(col("event_type"),
        expr("variant_get(v, '$.p.k', 'long')").as("k"),
        expr("variant_get(v, '$.user', 'long')").as("u"),
        expr("try_variant_get(v, '$.absent', 'long')").as("miss"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), sum(col("u")).as("sum_user"),
        count(col("miss")).as("n_miss"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** q59_skew_report — join-key skew DIAGNOSIS (the analysis side of
    * q35's salting remedy): per-key counts, the top-5 heaviest keys with
    * parts-per-million share, and the recommended salt factor
    * ceil(max_cnt / avg_cnt) — all integer arithmetic, so the report is
    * engine-exact. Shape: one groupBy (partial-aggregated), a k=5
    * bounded top-k (TakeOrderedAndProject — no global sort), and a
    * broadcast of the 1-row stats. This is the pre-flight check a 100 TB
    * join runs BEFORE choosing plain/salted/AQE-skew execution. [oracle]
    */
  def q59_skew_report(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir).lineitem
      .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    counts.orderBy(col("cnt").desc, col("l_suppkey").asc).limit(5)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("l_suppkey").asc)).cast("long"))
      .crossJoin(broadcast(stats))
      .select(col("rank"), col("l_suppkey"), col("cnt"),
        expr("(cnt * 1000000) div n_rows").as("share_ppm"),
        col("n_keys"), col("max_cnt"),
        expr("(max_cnt * n_keys + n_rows - 1) div n_rows").as("salt_factor"))
      .orderBy("rank")
  }

  /** q30_cube — full CUBE grouping sets with grouping_id: every
    * (status × priority) margin in one pass. Spark plans this as a single
    * Expand + hash aggregate — rows ×4, still one shuffle (the grouping-
    * sets shape that replaces 4 separate scans at 100 TB).
    */
  def q30_cube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(18, 4))), 2)
          .cast("double").as("revenue"))
      .orderBy(col("gid").asc,
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** q31_agg_breadth — the wide aggregate surface: exact median, argmin/
    * argmax (min_by/max_by over a collision-free integer key — 100·balance
    * concatenated with the unique custkey — so ties are impossible and the
    * result is engine-independent), filtered counts, boolean aggregates,
    * bitwise aggregates, a deterministic manual mode (highest count, ties
    * to lowest value: the two-level groupBy shape that distributes), and
    * an ordered string sample.
    */
  def q31_agg_breadth(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    val balKey = (round(col("c_acctbal") * 100, 0).cast("long") * 1000000L + col("c_custkey"))
    val main = c.groupBy("c_mktsegment").agg(
      count(lit(1)).as("n"),
      round(expr("median(c_acctbal)"), 4).as("median_bal"),
      min_by(col("c_name"), balKey).as("poorest_name"),
      max_by(col("c_name"), balKey).as("richest_name"),
      expr("count_if(c_acctbal > 0)").as("n_pos"),
      expr("bool_and(c_acctbal > 0)").as("all_pos"),
      expr("bool_or(c_acctbal < 0)").as("any_neg"),
      expr("bit_and(c_custkey)").as("key_and"),
      expr("bit_or(c_custkey)").as("key_or"),
      expr("bit_xor(c_custkey)").as("key_xor"),
      concat_ws("|", slice(sort_array(collect_list(col("c_name"))), 1, 3)).as("first_names"))
    val mode = c.groupBy("c_mktsegment", "c_nationkey").agg(count(lit(1)).as("cnt"))
      .groupBy("c_mktsegment")
      .agg(max_by(col("c_nationkey"), col("cnt") * 1000000L - col("c_nationkey")).as("mode_nation"))
    main.join(mode, Seq("c_mktsegment")).orderBy("c_mktsegment")
  }

  /** q32_arrays — array-function surface over tokenized documents:
    * distinct/sort/slice/contains/position/negative-index/intersect.
    * Pure narrow projection (the 100 TB shape: no shuffle at all).
    */
  def q32_arrays(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("toks", expr(graft.ops.TextOps.TOKENS))
      .withColumn("uniq", sort_array(array_distinct(col("toks"))))
      .select(
        col("doc_id"),
        size(col("uniq")).cast("long").as("n_uniq"),
        element_at(col("uniq"), 1).as("first_tok"),
        element_at(col("toks"), -1).as("last_tok"),
        concat_ws(" ", slice(col("uniq"), 1, 5)).as("top5"),
        array_contains(col("toks"), "the").as("has_the"),
        array_position(col("toks"), "data").cast("long").as("pos_data"),
        size(array_intersect(col("uniq"), array(lit("data"), lit("table"), lit("query"))))
          .cast("long").as("n_kw"))
      .orderBy("doc_id")

  /** q33_regexp — regular-expression surface: extract (group), global
    * replace, extract_all count, rlike, and try_cast of an extracted
    * group. Patterns are POSIX-basic so Java (Spark) and RE2-style
    * (DuckDB) semantics agree.
    */
  def q33_regexp(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part.selectExpr(
      "p_partkey",
      "regexp_extract(p_name, '([a-z]+)$', 1) AS last_word",
      "regexp_replace(p_name, '[aeiou]', '') AS no_vowels",
      "CAST(size(regexp_extract_all(p_name, '[a-z]+', 0)) AS BIGINT) AS n_words",
      "p_brand RLIKE '[0-9][0-9]' AS brand_2digit",
      "TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num"
    ).orderBy("p_partkey")

  /** q34_window_frames — value window functions with explicit frames:
    * first/last/nth over rows frames and a 30-day RANGE frame over epoch
    * micros (the time-decayed running total; range frames need a single
    * numeric ordering key in both engines). Money stays in the decimal
    * discipline inside the frame sum.
    */
  def q34_window_frames(spark: SparkSession, dir: String): DataFrame = {
    val wRows = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wGrow = wRows.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFull = wRows.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRange = Window.partitionBy("o_custkey").orderBy(col("us"))
      .rangeBetween(-30L * 86400 * 1000000, 0)
    Tables(spark, dir).orders
      .withColumn("us", unix_micros(col("o_orderdate").cast("timestamp")))
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(wGrow).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(wFull).as("second_price"),
        round(sum(col("o_totalprice").cast(DecimalType(18, 4))).over(wRange), 2)
          .cast("double").as("sum_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q36_json_struct — schema'd JSON parsing: from_json with an explicit
    * schema (JsonToStructs: parse once into a typed struct, then typed
    * field access) vs q19's per-path get_json_object. At scale the
    * explicit schema is the difference between one parse per row and one
    * parse per extracted path — and it never triggers schema inference.
    */
  def q36_json_struct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .withColumn("p", from_json(col("props"), StructType(Seq(
        StructField("k", LongType)))))
      .groupBy("event_type")
      .agg(
        count(col("p.k")).as("n_k"),
        sum(col("p.k")).as("sum_k"),
        min(col("p.k")).as("min_k"),
        max(col("p.k")).as("max_k"))
      .orderBy("event_type")

  /** q37_unpivot — melt wide columns to (metric, value) rows: Spark's
    * native unpivot (one Expand, one scan — the columnar-to-long reshape
    * that otherwise costs one scan per metric) then a per-metric profile.
    */
  def q37_unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .select("l_returnflag", "l_quantity", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric", "value")
      .groupBy("l_returnflag", "metric")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 4))), 4).cast("double").as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .orderBy("l_returnflag", "metric")

  /** q44_numeric — numeric-function surface restricted to IEEE-exact
    * operations (abs/sign/ceil/floor/sqrt — correctly rounded per
    * IEEE 754 — plus exact multiply and non-negative modulus), so every
    * output is bit-identical cross-engine without any tolerance.
    */
  def q44_numeric(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem.selectExpr(
      "l_orderkey", "l_linenumber",
      "abs(l_discount - 0.05) AS disc_dev",
      "CAST(sign(l_quantity - 25) AS BIGINT) AS qty_side",
      "CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil",
      "CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor",
      "sqrt(l_quantity) AS qty_sqrt",
      "l_quantity * l_quantity AS qty_sq",
      "pmod(l_orderkey, 7) AS key_mod7"
    ).orderBy("l_orderkey", "l_linenumber")

  /** q43_retention — cohort retention: users grouped by first-activity
    * week, counted in each subsequent week they return. Two aggregates on
    * the same key (user) then one distinct count per (cohort, offset) —
    * the cohort table is user-sized, the distinct set is bounded by
    * users × active-weeks. Week truncation is Monday-based in both
    * engines.
    */
  def q43_retention(spark: SparkSession, dir: String): DataFrame =
    // one scan: the cohort week is a per-user window minimum instead of a
    // separate aggregate joined back (which would scan events twice)
    Tables(spark, dir).events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .withColumn("cohort_week",
        min("week").over(Window.partitionBy("user_id")))
      .select(col("user_id"), col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "week_offset")

  /** q42_native_topk — q8's top-3-per-segment computed by the custom
    * whole-operator extension (graft.plans.TopKPerGroup: logical node →
    * planner strategy → partial/final bounded-heap SparkPlan) instead of
    * a window function. Same rows as the window formulation — the oracle
    * is the row_number query — but the shuffle carries at most
    * k·map-partitions rows per group instead of every row.
    */
  def q42_native_topk(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val joined = t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
    graft.plans.TopKPerGroup
      .topKPerGroup(joined, Seq("c_mktsegment"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .orderBy(col("c_mktsegment").asc, col("o_totalprice").desc, col("o_orderkey").asc)
  }

  /** q41_sql_text — the SQL-string surface: the exact text a PowerSQL
    * user writes (CTE + join + window + aggregate) executed verbatim by
    * spark.sql over the registered sources — same string runs on DuckDB
    * as the oracle. Demonstrates frontend parity, not just DataFrame
    * parity: Catalyst's SQL parser IS the engine's second entry point
    * (the model engine routes every .sql file through it).
    */
  def q41_sql_text(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).register(Seq("orders","customer"))
    spark.sql(SQL_TEXT)
  }

  /** Runs unchanged on Spark AND DuckDB. */
  val SQL_TEXT: String =
    """WITH seg_orders AS (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_totalprice > 100000
      |)
      |SELECT c_mktsegment,
      |  COUNT(*) AS n_top,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),2) AS DOUBLE) AS top_revenue
      |FROM seg_orders WHERE rn <= 100
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q40_funnel — event funnel: per user, the first view, the first
    * click at-or-after that view, the first purchase at-or-after that
    * click; output is the stage-conversion count row. Each stage is one
    * groupBy on user_id — the stage joins are all on the same key, so on
    * a cluster the first shuffle's partitioning carries through (and the
    * per-stage aggregates shrink the data before every join). The
    * standard product-analytics sequence query, expressed as joins
    * instead of per-user event-list collection.
    */
  def q40_funnel(spark: SparkSession, dir: String): DataFrame = {
    // ONE scan, ONE user-keyed shuffle: the three stage timestamps are
    // per-user window minima computed back-to-back over the same
    // partitioning (each later stage conditions on the previous stage's
    // column), then a per-user collapse and a single global count row.
    // The join-chain formulation reads the events table once per stage —
    // at 100 TB that is 3 scans and 3 shuffles for the same answer.
    val w = Window.partitionBy("user_id")
    Tables(spark, dir).events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("v1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("c1", min(when(col("event_type") === "click" && col("ts") >= col("v1"), col("ts"))).over(w))
      .withColumn("p1", min(when(col("event_type") === "purchase" && col("ts") >= col("c1"), col("ts"))).over(w))
      .groupBy("user_id")
      .agg(min("v1").as("v1"), min("c1").as("c1"), min("p1").as("p1"))
      .agg(
        count(col("v1")).as("n_viewed"),
        count(col("c1")).as("n_clicked_after_view"),
        count(col("p1")).as("n_purchased_after_click"))
  }

  /** q39_histogram — fixed-width value histogram with cumulative counts:
    * bucket = floor(value / width) is a narrow map, the histogram is one
    * tiny groupBy, and the cumulative distribution is a window over the
    * bucket axis (bucket count ≪ rows, so the window is driver-cheap at
    * any scale). All-integer output.
    */
  def q39_histogram(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).orders
      .select(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("cum_n", sum("n").over(w))
      .orderBy("bucket")
  }

  /** q38_dates — date/interval arithmetic breadth: day and month offsets
    * (month addition clamps to month end in both engines), month
    * boundaries, day differences, day-of-week, quarter. All pure narrow
    * projections over the scan.
    */
  def q38_dates(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders.selectExpr(
      "o_orderkey",
      "CAST(o_orderdate AS DATE) AS d",
      "date_add(CAST(o_orderdate AS DATE), 30) AS plus30",
      "add_months(CAST(o_orderdate AS DATE), 3) AS plus3m",
      "last_day(CAST(o_orderdate AS DATE)) AS month_end",
      "CAST(datediff(DATE'1998-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_to_98",
      "CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow",
      "CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr"
    ).orderBy("o_orderkey")

  /** q35_salted_join — skew-safe salted join: every fact row gets one of
    * 8 salts, the dim side is replicated across all 8, and the join key
    * becomes (key, salt) — a hot orderkey's rows now land on 8 reducers
    * instead of one. Result is identical to the unsalted join (the oracle
    * IS the plain join), which is the point: salting changes the
    * partitioning, never the semantics. AQE's skew split does this
    * adaptively; explicit salting is for when a key is so hot a single
    * split can't hold it.
    */
  def q35_salted_join(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val salts = 8
    val fact = t.lineitem.withColumn(
      "salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts)).cast("int"))
    val dim = t.orders.withColumn(
      "salt", explode(array((0 until salts).map(lit): _*)))
    fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey") && fact("salt") === dim("salt"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice").cast(DecimalType(18, 4))), 2)
          .cast("double").as("total_price"))
      .orderBy("o_orderpriority")
  }

  /** q53_try_arith — error-safe arithmetic under ANSI mode (Spark 4's
    * default, and this engine's): `try_divide` / `try_multiply` return
    * NULL where strict evaluation would kill the 100 TB job (divide by
    * zero, long overflow). Row-level semantics preserved in the output;
    * the oracle reproduces each NULL with explicit CASE guards, proving
    * the try-family's null contract exactly. [oracle]
    */
  def q53_try_arith(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem.selectExpr(
        "l_orderkey", "l_linenumber",
        // NULL where discount = 0, IEEE-exact division elsewhere
        "round(try_divide(l_quantity, l_discount), 6) AS qty_per_disc",
        // NULL where the multiply overflows long (every orderkey >= 2)
        "try_multiply(l_orderkey, 9223372036854775807L) AS overflow_probe")
      .orderBy("l_orderkey", "l_linenumber")

  /** q54_listagg — ordered string aggregation (listagg WITHIN GROUP,
    * SQL:2016): the distinct statuses per priority as one deterministic
    * comma-joined string. Spark 4's listagg vs DuckDB's string_agg —
    * same contract, both ORDER BY'd inside the aggregate so the result
    * is engine-independent. [oracle]
    */
  def q54_listagg(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).register(Seq("orders"))
    spark.sql(
      """SELECT o_orderpriority,
        |  listagg(o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** q52_bloom_semi — the explicit bloom-pre-filtered semi-join: build a
    * bloom filter over the small side's join keys (one aggregate — an
    * O(bits) sketch, no driver collect), broadcast it, pre-filter the
    * BIG side with codegen'd `might_contain`, and exact-verify the
    * survivors with the real semi-join. At 100 TB this is the pattern
    * that keeps a selective semi-join from shuffling the fact table:
    * ~all non-matching rows die in the narrow scan-side filter (false
    * positives only cost verify work, never wrong rows — the exact join
    * removes them). Result provably ≡ the plain semi-join, which is
    * exactly what the oracle checks. [oracle]
    */
  def q52_bloom_semi(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bigOrders = t.orders.filter(col("o_totalprice") > 200000)
      .select(col("o_orderkey"))
    // the sketch itself is one distributed aggregate; only the finished
    // O(numBits) filter (~50 KB) lands on the driver and re-enters the
    // plan as a LITERAL — might_contain requires a constant bloom side,
    // and a literal is exactly how Spark's own runtime filter injects it
    val bf: Array[Byte] = bigOrders
      .agg(graft.functions.HashExpressions.bloomFilterAgg(
        xxhash64(col("o_orderkey")), 50000L, 400000L).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    t.lineitem
      .filter(graft.functions.HashExpressions.mightContain(
        lit(bf), xxhash64(col("l_orderkey"))))
      .join(bigOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), money(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** q66_countmin — the count-min sketch stat API as an oracle-checked
    * entry (q17b/q45's invariant-oracle pattern applied to the last
    * spec-only sketch): one distributed pass builds the mergeable CMS
    * over l_returnflag (`df.stat.countMinSketch` — partial sketches
    * merge associatively, the only frequency-estimate shape that works
    * at 100 TB), then each heavy hitter's estimate is checked against
    * the CMS guarantee: exact ≤ estimate ≤ exact + ε·N. The oracle pins
    * the exact counts (engine-independent) and the bound verdict as a
    * literal — a sketch regression breaks the hash even though the
    * estimates themselves are hash-seed-dependent. Driver-side state is
    * the finished O(k) sketch + 3 group rows, never data. [oracle:
    * exact side + literal bound]
    */
  def q66_countmin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
    val eps = 0.001
    val cms = li.stat.countMinSketch("l_returnflag", eps, 0.99, 42)
    val exact = li.groupBy("l_returnflag").agg(count(lit(1)).as("n_exact"))
      .collect().map(r => (r.getString(0), r.getLong(1))) // 3 rows, O(k)
    val n = exact.map(_._2).sum
    exact.toSeq.map { case (k, ex) =>
      val est = cms.estimateCount(k)
      (k, ex, est >= ex && est <= ex + (eps * n).toLong + 1)
    }.toDF("l_returnflag", "n_exact", "bound_ok").orderBy("l_returnflag")
  }

  /** Oracle for q66: exact frequencies + the pinned bound verdict. */
  val q66_oracle: String =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS bound_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q51_resample — time-series regularization: aggregate events onto an
    * hourly grid, MATERIALIZE the gaps (sequence+explode per user — rows
    * that don't exist in the source), and forward-fill each gap with the
    * last observed value (`last(_, ignoreNulls)` over an unbounded
    * preceding frame). The resample-then-fill contract every downstream
    * time-series consumer (feature windows, charts, anomaly scoring)
    * assumes. Scale shape: one groupBy to hourly cells, the grid fan-out
    * is per-user metadata (2 longs → explode), the fill is one window
    * over the user's own partition. [oracle]
    */
  def q51_resample(spark: SparkSession, dir: String): DataFrame = {
    val perHour = Tables(spark, dir).events
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) DIV 3600000000").as("h"),
        col("value"))
      .groupBy("user_id", "h")
      .agg(count(lit(1)).as("n_events"), money(col("value")).as("hour_value"))
    val grid = perHour.groupBy("user_id")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perHour, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("hour_value"), ignoreNulls = true).over(w).as("filled_value"))
      .orderBy("user_id", "h")
  }

  /** q50_window_countd — DISTINCT aggregation over windows, which no
    * engine supports natively (`COUNT(DISTINCT) OVER` is rejected by
    * Spark AND DuckDB): composed from plain windows instead. The
    * first-occurrence trick — flag the first (user, type) row via
    * row_number, then a running SUM of flags is the running distinct
    * count and its partition total is the overall distinct count. All
    * three windows share one user_id shuffle. The oracle computes the
    * total through an independent path (COUNT(DISTINCT) + join). [oracle]
    */
  def q50_window_countd(spark: SparkSession, dir: String): DataFrame = {
    val wFirst = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us").asc, col("event_id").asc)
    val wRun = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
    val wAll = Window.partitionBy("user_id")
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        eventMicros(col("ts")).as("us"))
      .withColumn("first_seen",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .select(col("user_id"), col("event_id"), col("event_type"),
        sum("first_seen").over(wRun).as("run_distinct_types"),
        sum("first_seen").over(wAll).as("total_distinct_types"))
      .orderBy("user_id", "event_id")
  }

  /** q49_maps — the MapType surface (q32's sibling for maps):
    * map_from_arrays construction, map_concat extension, map explode
    * back to rows, and entry pruning. The pruning runs as a relational
    * filter AFTER the explode rather than a map_filter lambda before it
    * — the two are row-for-row identical (explode∘filter ≡
    * filter∘explode on the same predicate), but higher-order-function
    * lambdas evaluate INTERPRETED per map entry (guide §4.1's "prefer
    * built-ins" is about exactly this), while the post-explode filter
    * stays inside whole-stage codegen; measured 1.90 → 1.50 s at sf0.1
    * (r14, min-of-2). The oracle needs no map type at all: the exploded result is
    * checked against a flat UNION ALL formulation, proving the map path
    * computes exactly the relational answer. [oracle]
    */
  def q49_maps(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val charges = map_from_arrays(
      array(lit("base"), lit("disc"), lit("tax")),
      array(col("l_extendedprice"),
        col("l_extendedprice") * col("l_discount"),
        col("l_extendedprice") * col("l_tax")))
    t.lineitem
      .select(explode(
        map_concat(charges, map(lit("qty"), col("l_quantity")))).as(Seq("component", "v")))
      .filter(col("v") > 0)
      .groupBy("component")
      .agg(count(lit(1)).as("n"), money(col("v")).as("total"))
      .orderBy("component")
  }

  /** q48_scd2 — slowly-changing-dimension type-2 history build: collapse
    * each user's event stream into versioned validity intervals, opening
    * a new version only when the tracked attribute (event_type) actually
    * changes. lag() detects changes, lead() closes intervals, the open
    * interval is the current version — the standard dimension-history
    * derivation warehouses run nightly. Two windows over ONE shuffle
    * (both partition by user_id with the same ordering, so the second
    * window reuses the first's sort). Timestamps emitted as epoch micros
    * (BIGINT) per the cross-engine discipline. [oracle]
    */
  def q48_scd2(spark: SparkSession, dir: String): DataFrame =
    scd2Frame(spark, dir).orderBy("user_id", "version")

  /** The SCD2 derivation WITHOUT the presentation sort — shared by q48
    * (which adds the ORDER BY) and q61 (which joins it: the frame leaves
    * here hash-partitioned on user_id from the window shuffle, so the
    * temporal join consumes it with no further exchange — a global sort
    * in the middle would range-repartition it for nothing).
    */
  def scd2Frame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        eventMicros(col("ts")).as("us"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_us", lead("us", 1).over(w))
      .select(col("user_id"), col("version"), col("event_type"),
        col("us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** q47_exists — the CORRELATED subquery family q11 (uncorrelated
    * scalar) doesn't cover: correlated EXISTS, correlated NOT EXISTS,
    * and a correlated scalar COUNT per outer row. ONE query text runs
    * verbatim on Spark and DuckDB (q41's frontend-parity discipline).
    * Catalyst decorrelates all three into joins — EXISTS → left-semi,
    * NOT EXISTS → left-anti, scalar COUNT → aggregate + left outer — so
    * the executed plan is three hash joins against one orders scan
    * each, never a per-row subquery loop (the thing that cannot scale).
    */
  def q47_exists(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).register(Seq("customer","orders"))
    spark.sql(EXISTS_TEXT)
  }

  /** Runs unchanged on Spark AND DuckDB. */
  val EXISTS_TEXT: String =
    """SELECT c.c_custkey, c.c_name,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      |                    AND o.o_totalprice < 10000)
      |ORDER BY c.c_custkey""".stripMargin

  /** q46_grouping_sets — EXPLICIT grouping sets: the non-hierarchical
    * combination ((flag, status), (flag), (status)) that neither ROLLUP
    * (q15, prefix-hierarchical) nor CUBE (q30, all subsets) expresses.
    * DataFrame API has no grouping-sets verb, so this rides the SQL
    * frontend — one scan, one Expand (3 replicas), one shuffle, partial
    * aggregation before it, exactly like rollup/cube. NULL group keys
    * ordered NULLS FIRST explicitly so engines agree.
    */
  def q46_grouping_sets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).register(Seq("lineitem"))
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id() AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** q45_quantile_sketch — mergeable quantile sketch (percentile_approx,
    * the KLL/GK-family operator): at 100 TB exact percentiles would sort
    * or multi-pass the data, the sketch is one partial-aggregated pass.
    * Like q17b the sketch internals differ per engine, so the entry emits
    * the engine-independent RANK-ERROR invariant: for each p in
    * {0.5, 0.9, 0.99} the returned value v must satisfy
    * rank(< v)/n ≤ p + 1/accuracy AND rank(≤ v)/n ≥ p − 1/accuracy
    * (the open/closed bracket makes the check tie-safe). The oracle
    * computes the exact group sizes and pins the bounds TRUE. [oracle]
    */
  /** q71_seq_pattern — MATCH_RECOGNIZE-lite: each user's event history
    * collapses to a journey STRING (one char per event, deterministic
    * (ts, event_id) order) and sequence questions become regexes over
    * it — full-funnel `v.*c.*p`, purchase-before-any-view `^[^vc]*p`,
    * consecutive-error pairs, view→click adjacency. The regex engine is
    * the pattern matcher SQL's MATCH_RECOGNIZE compiles to anyway;
    * composing it from collect_list + rlike/regexp_count keeps the
    * whole thing inside Catalyst (no custom state machine, codegen'd
    * regex per row).
    *
    * Scale shape: ONE shuffle — the window and the groupBy both hash on
    * user_id, so Catalyst plans a single exchange. The 2000-event cap
    * bounds the AGGREGATION ITSELF, not just the output string: each
    * user's events are cut to the first 2000 by (ts, event_id) with a
    * row_number BEFORE collect_list, so the per-user aggregation buffer
    * holds ≤ 2000 structs and a pathological million-event user cannot
    * blow executor memory. One char per event makes first-2000-events
    * ≡ first-2000-chars — the pinned cap semantics are unchanged, and
    * the oracle applies the same pre-aggregation cut. [oracle]
    */
  def q71_seq_pattern(spark: SparkSession, dir: String): DataFrame = {
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val journeys = Tables(spark, dir).events
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= 2000)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("c")).as("e"))
      .groupBy("user_id")
      .agg(array_join(
        transform(array_sort(collect_list(col("e"))), x => x.getField("c")),
        "").as("j"))
    journeys.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("j").rlike("v.*c.*p"), 1L).otherwise(0L)).as("full_funnel"),
      sum(when(col("j").rlike("^[^vc]*p"), 1L).otherwise(0L)).as("blind_purchase"),
      sum(when(col("j").rlike("ee"), 1L).otherwise(0L)).as("users_error_pair"),
      sum(expr("regexp_count(j, 'ee')")).cast("long").as("error_pairs"),
      sum(expr("regexp_count(j, 'vc')")).cast("long").as("view_then_click"),
      max(length(col("j"))).cast("long").as("longest_journey"))
  }

  def q45_quantile_sketch(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val acc = 1000
    val eps = 1.0 / acc
    val ps = Seq(0.5, 0.9, 0.99)
    val approx = t.lineitem.groupBy("l_returnflag")
      .agg(percentile_approx(
        col("l_extendedprice"),
        array(ps.map(lit): _*), lit(acc)).as("ap"))
    // one more scan computes the exact rank bracket of each sketch value
    val withRanks = t.lineitem.join(broadcast(approx), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        ps.indices.flatMap { i =>
          Seq(
            sum(when(col("l_extendedprice") < element_at(col("ap"), i + 1), 1L)
              .otherwise(0L)).as(s"lt$i"),
            sum(when(col("l_extendedprice") <= element_at(col("ap"), i + 1), 1L)
              .otherwise(0L)).as(s"le$i"))
        }: _*)
    withRanks.select(
        col("l_returnflag") +: col("n_rows") +: ps.zipWithIndex.map { case (p, i) =>
          ((col(s"lt$i").cast("double") / col("n_rows") <= p + eps) &&
            (col(s"le$i").cast("double") / col("n_rows") >= p - eps))
            .as(s"p${(p * 100).toInt}_ok")
        }: _*)
      .orderBy("l_returnflag")
  }

  /** q73_ordered_set — the ordered-set aggregate family
    * (`percentile_disc` / `percentile_cont` / `mode`, SQL:2008 WITHIN
    * GROUP) per return flag. Spark has no disc/mode ordered-set aggs,
    * so both are computed from a VALUE HISTOGRAM: groupBy (flag,
    * quantity) collapses the fact table to ≤ |flags|·|distinct qty|
    * rows (≈150 at any SF — TPC-H quantity is 1..50), and the window
    * passes (cumulative counts for percentile_disc's "least value with
    * cume_dist ≥ p", frequency ranking for mode with a min-value tie
    * break) run on that tiny frame — never a window over the fact
    * table. percentile_cont(0.5) is Spark's exact `percentile`, which
    * also partial-aggregates as a value-count map. The disc cut uses
    * integer cross-multiplication (cum·10 ≥ tot·9), not a float
    * cume_dist, so the cut row is engine-exact. [oracle]
    */
  def q73_ordered_set(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val hist = t.lineitem
      .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      .agg(count(lit(1)).as("cnt"))
      .persistTracked
    val wCum = Window.partitionBy("l_returnflag").orderBy("qty")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("l_returnflag")
    val cum = hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("tot", sum("cnt").over(wTot))
    val disc = cum.filter(col("cum") * 10 >= col("tot") * 9)
      .groupBy("l_returnflag").agg(min("qty").as("p90_qty_disc"))
    val mode = hist
      .withColumn("rn", row_number().over(Window.partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("qty").asc)))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("qty").as("mode_qty"))
    val cont = t.lineitem.groupBy("l_returnflag").agg(
      count(lit(1)).as("n_rows"),
      round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
      round(expr("percentile(l_quantity, 0.25)"), 6).as("p25_qty"))
    cont.join(disc, Seq("l_returnflag")).join(mode, Seq("l_returnflag"))
      .select("l_returnflag", "n_rows", "median_qty", "p25_qty",
        "p90_qty_disc", "mode_qty")
      .orderBy("l_returnflag")
  }
}
