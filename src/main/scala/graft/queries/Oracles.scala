package graft.queries

/** DuckDB oracle SQL for every oracle-checked `SparkEntry.queries` entry.
  *
  * Discipline (SURVEY §4): identical column aliases to the Spark side;
  * money aggregates via exact DECIMAL(18,4) sums rounded to 2 then cast
  * DOUBLE; integer sums cast to BIGINT (DuckDB SUM(BIGINT) is HUGEINT,
  * which pandas would degrade to float); timestamps cast to microsecond
  * TIMESTAMP before arithmetic (DuckDB reads the ns-parquet as
  * TIMESTAMP_NS); deterministic global ORDER BY with full tiebreaks.
  */
object Oracles {

  private val MONEY_Q = "CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))),2) AS DOUBLE)"

  val relational: Map[String, String] = Map(
    "q30_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),2) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q31_agg_breadth" ->
      """WITH m AS (
        |  SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt
        |  FROM customer GROUP BY 1, 2),
        |mode_t AS (
        |  SELECT c_mktsegment,
        |    arg_max(c_nationkey, cnt * 1000000 - c_nationkey) AS mode_nation
        |  FROM m GROUP BY 1),
        |agg AS (
        |  SELECT c_mktsegment,
        |    COUNT(*) AS n,
        |    round(median(c_acctbal), 4) AS median_bal,
        |    arg_min(c_name, CAST(round(c_acctbal * 100, 0) AS BIGINT) * 1000000 + c_custkey) AS poorest_name,
        |    arg_max(c_name, CAST(round(c_acctbal * 100, 0) AS BIGINT) * 1000000 + c_custkey) AS richest_name,
        |    COUNT(*) FILTER (WHERE c_acctbal > 0) AS n_pos,
        |    bool_and(c_acctbal > 0) AS all_pos,
        |    bool_or(c_acctbal < 0) AS any_neg,
        |    CAST(bit_and(c_custkey) AS BIGINT) AS key_and,
        |    CAST(bit_or(c_custkey) AS BIGINT) AS key_or,
        |    CAST(bit_xor(c_custkey) AS BIGINT) AS key_xor,
        |    array_to_string(list_sort(array_agg(c_name))[1:3], '|') AS first_names
        |  FROM customer GROUP BY 1)
        |SELECT agg.*, mode_t.mode_nation
        |FROM agg JOIN mode_t USING (c_mktsegment)
        |ORDER BY c_mktsegment""".stripMargin,

    "q32_arrays" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS uniq
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(uniq) AS BIGINT) AS n_uniq,
        |  uniq[1] AS first_tok,
        |  toks[-1] AS last_tok,
        |  array_to_string(uniq[1:5], ' ') AS top5,
        |  list_contains(toks, 'the') AS has_the,
        |  CAST(list_position(toks, 'data') AS BIGINT) AS pos_data,
        |  CAST(len(list_intersect(uniq, ['data', 'table', 'query'])) AS BIGINT) AS n_kw
        |FROM t ORDER BY doc_id""".stripMargin,

    "q33_regexp" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
        |  CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
        |  regexp_matches(p_brand, '[0-9][0-9]') AS brand_2digit,
        |  TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q34_window_frames" ->
      """WITH t AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS us
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
        |  last_value(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        |  nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY us
        |    RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS sum_30d
        |FROM t ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q36_json_struct" ->
      """SELECT event_type,
        |  COUNT(CAST(props ->> '$.k' AS BIGINT)) AS n_k,
        |  CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(props ->> '$.k' AS BIGINT)) AS min_k,
        |  MAX(CAST(props ->> '$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q37_unpivot" ->
      """SELECT l_returnflag, metric, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_v,
        |  MIN(value) AS min_v,
        |  MAX(value) AS max_v
        |FROM (SELECT l_returnflag, l_quantity, l_discount, l_tax FROM lineitem)
        |  UNPIVOT (value FOR metric IN (l_quantity, l_discount, l_tax))
        |GROUP BY l_returnflag, metric
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q41_sql_text" -> graft.queries.Relational.SQL_TEXT,

    "q44_numeric" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  CAST(sign(l_quantity - 25) AS BIGINT) AS qty_side,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  l_quantity * l_quantity AS qty_sq,
        |  ((l_orderkey % 7) + 7) % 7 AS key_mod7
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q43_retention" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
        |  FROM events),
        |cohorts AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id),
        |act AS (SELECT DISTINCT e.user_id, c.cohort_week,
        |          CAST(date_diff('day', c.cohort_week, e.week) // 7 AS BIGINT) AS week_offset
        |        FROM e JOIN cohorts c ON e.user_id = c.user_id)
        |SELECT cohort_week, week_offset, COUNT(*) AS n_active
        |FROM act GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q42_native_topk" ->
      """WITH ranked AS (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, o_orderkey, o_totalprice
        |FROM ranked WHERE rn <= 3
        |ORDER BY c_mktsegment ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,

    "q71_seq_pattern" ->
      """WITH fe AS (
        |  SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS c,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events),
        |j AS (
        |  SELECT user_id,
        |         string_agg(c, '' ORDER BY ts, event_id) AS j
        |  FROM fe WHERE rn <= 2000 GROUP BY user_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN regexp_matches(j, 'v.*c.*p') THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel,
        |  CAST(SUM(CASE WHEN regexp_matches(j, '^[^vc]*p') THEN 1 ELSE 0 END) AS BIGINT) AS blind_purchase,
        |  CAST(SUM(CASE WHEN regexp_matches(j, 'ee') THEN 1 ELSE 0 END) AS BIGINT) AS users_error_pair,
        |  CAST(SUM(len(regexp_extract_all(j, 'ee'))) AS BIGINT) AS error_pairs,
        |  CAST(SUM(len(regexp_extract_all(j, 'vc'))) AS BIGINT) AS view_then_click,
        |  CAST(MAX(length(j)) AS BIGINT) AS longest_journey
        |FROM j""".stripMargin,

    "q40_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, MIN(ts) AS v1 FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS c1 FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS p1 FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c1 GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
        |       (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
        |       (SELECT COUNT(*) FROM p) AS n_purchased_after_click""".stripMargin,

    "q39_histogram" ->
      """WITH h AS (
        |  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, COUNT(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT bucket, n,
        |  CAST(SUM(n) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
        |FROM h ORDER BY bucket""".stripMargin,

    "q38_dates" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q35_salted_join" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_items,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))),2) AS DOUBLE) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $MONEY_Q AS sum_qty,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_base_price,
         |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_join_broadcast" ->
      """SELECT c_mktsegment,
        |  COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),2) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q4_join_shuffle" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_items,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))),2) AS DOUBLE) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q5_outer_join" ->
      """SELECT c_custkey,
        |  COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),2) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q6_semi_anti" ->
      """SELECT * FROM (
        |  SELECT 'with_orders' AS cohort, COUNT(*) AS n FROM customer c
        |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  UNION ALL
        |  SELECT 'without_orders' AS cohort, COUNT(*) AS n FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |) ORDER BY cohort""".stripMargin,

    "q7_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 25""".stripMargin,

    "q8_window_rank" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |) WHERE rn <= 3
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q9_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS DOUBLE) AS running_total,
        |  LAG(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q10_setops" ->
      """SELECT * FROM (
        |  SELECT 'union' AS op, nationkey FROM (
        |    SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |    UNION SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |  UNION ALL
        |  SELECT 'intersect' AS op, nationkey FROM (
        |    SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |    INTERSECT SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |  UNION ALL
        |  SELECT 'except' AS op, nationkey FROM (
        |    SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |    EXCEPT SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |) ORDER BY op, nationkey""".stripMargin,

    "q11_cte_subquery" ->
      """WITH stats AS (SELECT AVG(c_acctbal) AS a FROM customer)
        |SELECT c_custkey, c_name, c_acctbal
        |FROM customer, stats
        |WHERE c_acctbal > a
        |ORDER BY c_custkey""".stripMargin,

    "q12_case_string" ->
      """SELECT p_partkey,
        |  CASE WHEN p_size < 10 THEN 'small'
        |       WHEN p_size < 30 THEN 'medium'
        |       ELSE 'large' END AS size_class,
        |  UPPER(p_brand) AS brand_uc,
        |  SUBSTRING(p_name, 1, 8) AS name_prefix,
        |  CONCAT_WS('/', p_brand, p_type) AS brand_type,
        |  p_type LIKE '%a%' AS has_a
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q13_date" ->
      """SELECT date_trunc('month', CAST(ts AS TIMESTAMP)) AS month, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q14_pivot" ->
      s"""SELECT l_linestatus,
         |  CAST(ROUND(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,4)) END),2) AS DOUBLE) AS qty_a,
         |  CAST(ROUND(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,4)) END),2) AS DOUBLE) AS qty_n,
         |  CAST(ROUND(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,4)) END),2) AS DOUBLE) AS qty_r
         |FROM lineitem
         |GROUP BY l_linestatus
         |ORDER BY l_linestatus""".stripMargin,

    "q15_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  COUNT(*) AS n,
         |  $MONEY_Q AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q16_having" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        |  CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(18,4))),2) AS DOUBLE) AS shelf_value
        |FROM part
        |GROUP BY p_brand
        |HAVING COUNT(*) > 2
        |ORDER BY p_brand""".stripMargin,

    "q17_countd" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // the try-family's NULLs reproduced with explicit CASE guards
    "q53_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount = 0 THEN NULL
        |       ELSE round(l_quantity / l_discount, 6) END AS qty_per_disc,
        |  CASE WHEN l_orderkey >= 2 THEN NULL
        |       ELSE l_orderkey * 9223372036854775807 END AS overflow_probe
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q54_listagg" ->
      """SELECT o_orderpriority,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // oracle = the PLAIN semi-join: proves the bloom pre-filter changes
    // the plan, never the result
    "q52_bloom_semi" ->
      s"""SELECT l_returnflag, COUNT(*) AS n, $MONEY_Q AS sum_qty
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000)
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,

    "q61_temporal_join" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC) AS prev_type
        |  FROM events),
        |chg AS (
        |  SELECT user_id, event_id, event_type, us FROM seq
        |  WHERE prev_type IS NULL OR prev_type <> event_type),
        |dim AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER w AS BIGINT) AS version,
        |    event_type AS dim_type,
        |    us AS valid_from_us,
        |    LEAD(us, 1) OVER w AS valid_to_us
        |  FROM chg
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
        |facts AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events)
        |SELECT f.user_id, d.dim_type,
        |  COUNT(*) AS n_events, MAX(d.version) AS max_version
        |FROM facts f JOIN dim d ON d.user_id = f.user_id
        |WHERE f.us >= d.valid_from_us
        |  AND (d.valid_to_us IS NULL OR f.us < d.valid_to_us)
        |GROUP BY f.user_id, d.dim_type
        |ORDER BY f.user_id, d.dim_type""".stripMargin,

    "q60_variant" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(SUM(user_id) AS BIGINT) AS sum_user,
        |  CAST(0 AS BIGINT) AS n_miss,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q59_skew_report" ->
      """WITH c AS (
        |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    CAST(MAX(cnt) AS BIGINT) AS max_cnt
        |  FROM c),
        |top AS (
        |  SELECT l_suppkey, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, l_suppkey ASC) AS BIGINT) AS rank
        |  FROM c)
        |SELECT rank, l_suppkey, cnt,
        |  (cnt * 1000000) // n_rows AS share_ppm,
        |  n_keys, max_cnt,
        |  (max_cnt * n_keys + n_rows - 1) // n_rows AS salt_factor
        |FROM top, s WHERE rank <= 5 ORDER BY rank""".stripMargin,

    "q58_sliding_window" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        |  FROM events),
        |w AS (
        |  SELECT event_type, value,
        |    ((us // 900000000) - k) * 900000000 AS ws
        |  FROM e, (SELECT unnest(range(0, 4)) AS k))
        |SELECT ws, event_type, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS total
        |FROM w GROUP BY ws, event_type
        |ORDER BY ws, event_type""".stripMargin,

    "q51_resample" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h, value
        |  FROM events),
        |ph AS (
        |  SELECT user_id, h, COUNT(*) AS n_events,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS hour_value
        |  FROM e GROUP BY user_id, h),
        |bounds AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM ph GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM bounds)
        |SELECT g.user_id, g.h,
        |  CAST(COALESCE(ph.n_events, 0) AS BIGINT) AS n_events,
        |  last_value(ph.hour_value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.h ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM grid g LEFT JOIN ph ON ph.user_id = g.user_id AND ph.h = g.h
        |ORDER BY g.user_id, g.h""".stripMargin,

    "q50_window_countd" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC) = 1
        |      THEN 1 ELSE 0 END AS first_seen
        |  FROM events),
        |run AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(SUM(first_seen) OVER (PARTITION BY user_id
        |      ORDER BY us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run_distinct_types
        |  FROM seq),
        |tot AS (
        |  SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS total_distinct_types
        |  FROM events GROUP BY user_id)
        |SELECT r.user_id, r.event_id, r.event_type,
        |  r.run_distinct_types, t.total_distinct_types
        |FROM run r JOIN tot t ON t.user_id = r.user_id
        |ORDER BY r.user_id, r.event_id""".stripMargin,

    "q49_maps" ->
      """WITH comp AS (
        |  SELECT 'base' AS component, l_extendedprice AS v FROM lineitem
        |  UNION ALL SELECT 'disc', l_extendedprice * l_discount FROM lineitem
        |  UNION ALL SELECT 'tax', l_extendedprice * l_tax FROM lineitem
        |  UNION ALL SELECT 'qty', l_quantity FROM lineitem)
        |SELECT component, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(v AS DECIMAL(18,4))),2) AS DOUBLE) AS total
        |FROM comp WHERE v > 0
        |GROUP BY component ORDER BY component""".stripMargin,

    "q48_scd2" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC) AS prev_type
        |  FROM events),
        |chg AS (
        |  SELECT user_id, event_id, event_type, us FROM seq
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  event_type,
        |  us AS valid_from_us,
        |  LEAD(us, 1) OVER w AS valid_to_us,
        |  (LEAD(us, 1) OVER w IS NULL) AS is_current
        |FROM chg
        |WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
        |ORDER BY user_id, version""".stripMargin,

    "q46_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  COUNT(*) AS n,
         |  $MONEY_Q AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
         |ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    // invariant oracle: exact group sizes + the sketch's rank-error
    // guarantee pinned TRUE — a quantile-sketch regression (wrong value,
    // broken merge) pushes a rank outside ±1/accuracy and breaks the hash
    // ordered-set aggregate family off the same value histogram: the
    // disc cut is integer cross-multiplied, cont is quantile_cont
    "q73_ordered_set" ->
      """WITH hist AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT l_returnflag, qty, cnt,
        |    SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY qty
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM hist),
        |disc AS (
        |  SELECT l_returnflag, MIN(qty) AS p90_qty_disc FROM cum
        |  WHERE cum * 10 >= tot * 9 GROUP BY 1),
        |md AS (
        |  SELECT l_returnflag, qty AS mode_qty FROM (
        |    SELECT l_returnflag, qty,
        |      row_number() OVER (PARTITION BY l_returnflag
        |        ORDER BY cnt DESC, qty ASC) AS rn
        |    FROM hist) WHERE rn = 1),
        |cont AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |    round(quantile_cont(l_quantity, 0.25), 6) AS p25_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT c.l_returnflag, n_rows, median_qty, p25_qty, p90_qty_disc,
        |  mode_qty
        |FROM cont c JOIN disc USING (l_returnflag) JOIN md USING (l_returnflag)
        |ORDER BY c.l_returnflag""".stripMargin,

    "q45_quantile_sketch" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // invariant oracle: DuckDB computes the exact distinct side and pins
    // the HLL error bound to literal TRUE — the hash breaks unless every
    // Spark group satisfies |approx − exact| ≤ 3·rsd·exact
    "q17b_approx_countd" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
        |  TRUE AS parts_within_bound,
        |  TRUE AS supps_within_bound
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q18_star_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))),2) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q19_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q20_sessionize" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC) AS prev_us
        |  FROM events
        |), marked AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 30*60*1000000 THEN 1 ELSE 0 END AS is_break
        |  FROM seq
        |), sessions AS (
        |  SELECT user_id,
        |    SUM(is_break) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked
        |)
        |SELECT user_id,
        |  CAST(MAX(session_id) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM sessions
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q29_scalar_funcs" ->
      """SELECT p_partkey,
        |  reverse(p_brand) AS brand_rev,
        |  lpad(p_brand, 12, '.') AS brand_pad,
        |  repeat(left(p_type, 2), 3) AS type_rep,
        |  CAST(instr(p_name, 'a') AS BIGINT) AS a_pos,
        |  split_part(p_type, ' ', 1) AS type_first,
        |  translate(p_brand, 'ab', 'xy') AS brand_tr,
        |  nullif(p_size, 10) AS size_nn,
        |  greatest(p_size, 25) AS size_hi,
        |  least(p_size, 25) AS size_lo
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q28_window_ranks" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drank,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  PERCENT_RANK() OVER w AS prank,
        |  CUME_DIST() OVER w AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_mktsegment, drank, c_custkey""".stripMargin,

    "q22_stats" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 2) AS median_qty,
        |  ROUND(quantile_cont(l_quantity, 0.95), 2) AS p95_qty,
        |  ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q21_stream_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
  )
}
