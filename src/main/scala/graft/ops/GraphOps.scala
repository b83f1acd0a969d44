package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over relational data: iterative algorithms expressed
  * as DataFrame loops (join → aggregate → checkpoint per round), the
  * same shape as d6's connected components.
  *
  * PageRank here is INTEGER-ARITHMETIC: ranks are micro-units (1e6 =
  * 1.0), per-edge contributions use floor division, and damping is
  * `(85 * sum) div 100`. Integer sums are order-independent, so the
  * result is bit-identical across partitionings, retries, AND engines —
  * which is what lets an iterative float-free PageRank be hash-checked
  * against a DuckDB recursive CTE. (Float PageRank is shuffle-order-
  * dependent and could only carry an invariant oracle.)
  */
object GraphOps {

  /** The nation-level trade graph: src = customer's nation, dst =
    * supplier's nation, weight = lineitem count. The heavy part at scale
    * is THIS aggregation (two fact joins + groupBy); the iteration then
    * runs on the contracted graph.
    */
  def tradeEdges(t: Tables): DataFrame =
    t.lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(t.orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        Seq("l_orderkey"))
      .join(t.customer.select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").cast("long").as("src")), Seq("o_custkey"))
      .join(t.supplier.select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey").cast("long").as("dst")), Seq("l_suppkey"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))

  /** g1_pagerank — 10 rounds of damped weighted PageRank on the trade
    * graph. Each round is one join + one aggregate on the (src, dst, w)
    * edge table; `localCheckpoint` cuts the growing lineage (d6's rule
    * for iterative frames — on a production cluster prefer
    * `checkpoint(dir)` for executor-loss tolerance). Dangling-node mass
    * is dropped and absentee nodes keep the base term — both engines
    * apply the identical integer formula, so ranks hash-match. [oracle:
    * DuckDB recursive CTE, same integer recurrence]
    */
  def g1_pagerank(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ew = tradeEdges(t)
      .withColumn("wsum", sum(col("w")).over(Window.partitionBy("src")))
      .localCheckpoint(true) // contracted graph: tiny, reused every round
    val nodes = t.nation.select(col("n_nationkey").cast("long").as("nation"))
      .localCheckpoint(true)
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (i <- 0 until 10) {
      val totals = ew.join(ranks, col("src") === col("nation"))
        .select(col("dst"), expr("(r * w) div wsum").as("term"))
        .groupBy("dst").agg(sum(col("term")).as("total"))
      ranks = nodes
        .join(totals.withColumnRenamed("dst", "nation"), Seq("nation"), "left")
        .select(col("nation"),
          (lit(150000L) + expr("(85 * coalesce(total, 0L)) div 100")).as("r"))
      // checkpoint every 3rd round: plan depth stays bounded without
      // paying a materialization job per iteration
      if (i % 3 == 2 || i == 9) ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("nation"), col("r").as("pagerank")).orderBy("nation")
  }

  /** g2_triangles — per-node triangle counts on the (undirected) trade
    * graph: how many closed trade triples each nation participates in —
    * the clustering/cohesion statistic next to g1's centrality. Shape:
    * edges are ORIENTED by node id (a < b, each undirected edge kept
    * once), and triangles enumerate as the oriented 3-path
    * e(a,b) ⋈ e(b,c) ⋈ e(a,c) with a < b < c — each triangle found
    * exactly once, never 6 rotations; the heavy work at 100 TB is the
    * same contracted-edge aggregation g1 checkpoints, and the triangle
    * joins run on the contracted graph. All-integer → hash-exact
    * cross-engine. [oracle]
    */
  def g2_triangles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ed = tradeEdges(t)
      .localCheckpoint(true) // contracted: reused by threshold + edge set
    // only HEAVY lanes qualify — the 25-nation graph is near complete
    // otherwise and every statistic degenerates to C(n-1, 2). The cut is
    // the exact 75th percentile of lane weights (NOT a literal tuned to
    // one SF): exact linear interpolation over integer weights is
    // bit-identical to DuckDB's quantile_cont (fractions are powers of
    // 1/4, exactly representable), so both engines keep the same edges
    // at EVERY scale factor and the entry is never empty. The 1-row
    // collect is O(1) driver state, same class as the bloom literal.
    val thr = ed.agg(expr("percentile(w, 0.75)").as("thr")).first().getDouble(0)
    val und = ed.filter(col("w") >= thr)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true) // contracted: reused by three join branches
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("nation"))
      .groupBy("nation").agg(count(lit(1)).as("n_triangles"))
      .orderBy("nation")
  }

  /** DuckDB mirror of g2: identical orientation, 3-path join, and the
    * same exact-interpolated 75th-percentile heavy-lane cut.
    *
    * edw/e are MATERIALIZED and the threshold is a window (not a scalar
    * subquery): with plain CTEs DuckDB re-inlines the 4-way lineitem
    * join into every one of the 5 references, and at sf1 the planner's
    * expansion spilled >70 GB of temp before dying — the same query
    * shape that is instant when each CTE is evaluated once.
    */
  val g2_oracle: String =
    """WITH edw AS MATERIALIZED (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |ed AS (
      |  SELECT src, dst FROM (
      |    SELECT src, dst, w, quantile_cont(w, 0.75) OVER () AS thr FROM edw)
      |  WHERE w >= thr),
      |e AS MATERIALIZED (
      |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      |  FROM ed WHERE src <> dst),
      |tri AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |n AS (
      |  SELECT x AS nation FROM tri
      |  UNION ALL SELECT y FROM tri
      |  UNION ALL SELECT z FROM tri)
      |SELECT CAST(nation AS BIGINT) AS nation,
      |       CAST(COUNT(*) AS BIGINT) AS n_triangles
      |FROM n GROUP BY nation ORDER BY nation""".stripMargin

  /** g3_shortest_path — hop distances from nation 0 over the HEAVY-lane
    * directed trade graph (g2's exact 75th-percentile cut, so the graph
    * is sparse enough for distances > 1 at every SF): 8 bounded
    * Bellman-Ford rounds of `dist' = min(dist, min_incoming(dist_src+1))`
    * with 999 as the unreachable sentinel. A FIXED round count (g1's
    * discipline) makes the result a deterministic integer recurrence —
    * identical across partitionings, retries, and engines — rather than
    * a convergence race; 8 rounds cover any diameter the 25-node
    * contracted graph can have. Shape: the heavy work is the one
    * contracted-edge aggregation (checkpointed, reused all rounds);
    * each round is a join + min-aggregate on the contracted graph, the
    * frontier never touches fact tables. [oracle: DuckDB recursive CTE,
    * same recurrence]
    */
  def g3_shortest_path(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ew = tradeEdges(t).localCheckpoint(true)
    val thr = ew.agg(expr("percentile(w, 0.75)").as("thr")).first().getDouble(0)
    val ed = ew.filter(col("w") >= thr).filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct().localCheckpoint(true)
    val nodes = t.nation.select(col("n_nationkey").cast("long").as("nation"))
      .localCheckpoint(true)
    var dist = nodes.withColumn("dist",
      when(col("nation") === 0, lit(0L)).otherwise(lit(999L)))
    for (i <- 0 until 8) {
      val cand = ed.join(dist, col("src") === col("nation"))
        .select(col("dst"), (col("dist") + 1).as("c"))
        .groupBy("dst").agg(min(col("c")).as("cand"))
      dist = dist.join(cand.withColumnRenamed("dst", "nation"), Seq("nation"), "left")
        .select(col("nation"),
          least(col("dist"), coalesce(col("cand"), lit(999L))).as("dist"))
      if (i % 3 == 2 || i == 7) dist = dist.localCheckpoint(true)
    }
    dist.select(col("nation"), col("dist")).orderBy("nation")
  }

  /** DuckDB mirror of g3: same heavy-lane cut and the same bounded
    * min-relaxation recurrence (g2's MATERIALIZED-edge discipline).
    */
  val g3_oracle: String =
    """WITH RECURSIVE
      |edw AS MATERIALIZED (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |e AS MATERIALIZED (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst, w, quantile_cont(w, 0.75) OVER () AS thr FROM edw)
      |  WHERE w >= thr AND src <> dst),
      |d AS (
      |  SELECT 0 AS iter, n_nationkey AS nation,
      |    CAST(CASE WHEN n_nationkey = 0 THEN 0 ELSE 999 END AS BIGINT) AS dist
      |  FROM nation
      |  UNION ALL
      |  SELECT d.iter + 1, d.nation,
      |    LEAST(d.dist, COALESCE(u.cand, 999)) AS dist
      |  FROM d LEFT JOIN (
      |    SELECT e.dst, MIN(d2.dist + 1) AS cand
      |    FROM d d2 JOIN e ON e.src = d2.nation GROUP BY e.dst) u
      |    ON u.dst = d.nation
      |  WHERE d.iter < 8
      |)
      |SELECT CAST(nation AS BIGINT) AS nation, dist
      |FROM d WHERE iter = 8 ORDER BY nation""".stripMargin

  /** g4_components — connected components of the UNDIRECTED heavy-lane
    * trade graph (g2's exact 75th-percentile cut): which nations form
    * connected trading blocs once thin lanes are dropped, with each
    * component labeled by its minimum nation id and sized. Completes
    * the graph family: centrality (g1), cohesion (g2), reachability
    * (g3), connectivity (g4).
    *
    * Algorithm: 24 bounded min-label relaxation rounds — label' =
    * min(label, min over neighbors' labels). The min label travels one
    * hop per round, and 24 rounds cover the worst-case diameter of a
    * 25-node graph, so the FIXED round count (g1/g3's discipline) is a
    * complete, deterministic integer recurrence — hash-exact against a
    * recursive CTE, unlike a convergence loop. Shape: the heavy work is
    * the one contracted-edge aggregation; every round is a join + min
    * aggregate on the ≤ 25-node contracted graph. (Corpus-scale
    * component labeling — millions of nodes, unbounded diameter — is
    * d6's star-contraction labeler; this is the contracted-graph
    * variant where bounded label-prop is both sufficient and exactly
    * mirrorable.) [oracle: recursive CTE]
    */
  def g4_components(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ew = tradeEdges(t).localCheckpoint(true)
    val thrRow = ew.agg(expr("percentile(w, 0.75)").as("thr")).first()
    val thr = if (thrRow.isNullAt(0)) Double.MaxValue else thrRow.getDouble(0)
    val eh = ew.filter(col("w") >= thr).filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val sym = eh.select(col("src").as("u"), col("dst").as("v"))
      .union(eh.select(col("dst").as("u"), col("src").as("v")))
      .distinct().localCheckpoint(true)
    val nodes = t.nation.select(col("n_nationkey").cast("long").as("nation"))
      .localCheckpoint(true)
    var lab = nodes.withColumn("label", col("nation"))
    for (i <- 0 until 24) {
      val cand = sym.join(lab, col("u") === col("nation"))
        .select(col("v"), col("label"))
        .groupBy("v").agg(min(col("label")).as("cand"))
      lab = lab.join(cand.withColumnRenamed("v", "nation"), Seq("nation"), "left")
        .select(col("nation"),
          least(col("label"), coalesce(col("cand"), col("label"))).as("label"))
      if (i % 4 == 3 || i == 23) lab = lab.localCheckpoint(true)
    }
    val sizes = lab.groupBy("label").agg(count(lit(1)).as("component_size"))
    lab.join(sizes, Seq("label"))
      .select(col("nation"), col("label").as("component"), col("component_size"))
      .orderBy("nation")
  }

  /** DuckDB mirror of g4: same heavy-lane cut, symmetrized edges, and
    * 24-round min-label recurrence (g2's MATERIALIZED-edge discipline).
    */
  val g4_oracle: String =
    """WITH RECURSIVE
      |edw AS MATERIALIZED (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |eh AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst, w, quantile_cont(w, 0.75) OVER () AS thr FROM edw)
      |  WHERE w >= thr AND src <> dst),
      |e AS MATERIALIZED (
      |  SELECT src AS u, dst AS v FROM eh
      |  UNION
      |  SELECT dst AS u, src AS v FROM eh),
      |l AS (
      |  SELECT 0 AS iter, n_nationkey AS nation,
      |    CAST(n_nationkey AS BIGINT) AS label
      |  FROM nation
      |  UNION ALL
      |  SELECT l.iter + 1, l.nation,
      |    LEAST(l.label, COALESCE(c.cand, l.label)) AS label
      |  FROM l LEFT JOIN (
      |    SELECT e.v, MIN(l2.label) AS cand
      |    FROM l l2 JOIN e ON e.u = l2.nation GROUP BY e.v) c
      |    ON c.v = l.nation
      |  WHERE l.iter < 24
      |),
      |fin AS (SELECT nation, label FROM l WHERE iter = 24),
      |sz AS (SELECT label, COUNT(*) AS component_size FROM fin GROUP BY label)
      |SELECT CAST(f.nation AS BIGINT) AS nation, f.label AS component,
      |  CAST(sz.component_size AS BIGINT) AS component_size
      |FROM fin f JOIN sz USING (label) ORDER BY nation""".stripMargin

  val g1_oracle: String =
    """WITH RECURSIVE
      |e AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |      JOIN customer c ON o.o_custkey = c.c_custkey
      |      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |      GROUP BY 1, 2),
      |ew AS (SELECT src, dst, w, SUM(w) OVER (PARTITION BY src) AS wsum FROM e),
      |nodes AS (SELECT n_nationkey AS nation FROM nation),
      |pr AS (
      |  SELECT 0 AS iter, nation, CAST(1000000 AS BIGINT) AS r FROM nodes
      |  UNION ALL
      |  SELECT p.iter + 1, p.nation,
      |    CAST(150000 + (85 * COALESCE(s.total, 0)) // 100 AS BIGINT) AS r
      |  FROM pr p LEFT JOIN (
      |    SELECT ew.dst, SUM((pr2.r * ew.w) // ew.wsum) AS total
      |    FROM pr pr2 JOIN ew ON ew.src = pr2.nation GROUP BY ew.dst) s
      |    ON s.dst = p.nation
      |  WHERE p.iter < 10
      |)
      |SELECT CAST(nation AS BIGINT) AS nation, r AS pagerank
      |FROM pr WHERE iter = 10 ORDER BY nation""".stripMargin
}
