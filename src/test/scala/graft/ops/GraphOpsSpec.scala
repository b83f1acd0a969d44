package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  test("g1_pagerank: integer arithmetic makes reruns bit-identical; mass bounded") {
    val a = GraphOps.g1_pagerank(spark, sfDir).collect()
    val b = GraphOps.g1_pagerank(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "integer PageRank must be deterministic across runs")
    val n = a.length
    val mass = a.map(_.getLong(1)).sum
    // damping + floor division only LOSE mass vs the n·1e6 start; the
    // base term keeps every rank ≥ 150000
    assert(a.forall(_.getLong(1) >= 150000L))
    assert(mass <= n * 1000000L + n, s"rank mass grew: $mass > ${n * 1000000L}")
  }

  test("g2_triangles: distribution-derived cut keeps the entry non-empty at the smoke SF") {
    // the r5 regression: a literal w>=120 threshold emptied the oriented
    // edge set at sf0.001 and broke the driver's rows>0 smoke gate. The
    // 75th-percentile cut must yield triangles at EVERY SF the harness
    // runs — pinned here at the smallest one.
    val rows = GraphOps.g2_triangles(spark, sfDir).collect()
    assert(rows.nonEmpty, "g2 must return rows at sf0.001")
    // triangle counts are per-node incidences: each triangle contributes
    // exactly 3, so the total is divisible by 3 and positive
    val total = rows.map(_.getLong(1)).sum
    assert(total > 0 && total % 3 == 0, s"incidence total $total not 3·k")
  }

  test("g3: source is zero, distances respect edge relaxation at fixpoint") {
    val dist = GraphOps.g3_shortest_path(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist(0L) == 0L, "source nation must be at distance 0")
    assert(dist.values.forall(d => d >= 0 && (d <= 8 || d == 999L)),
      s"8 rounds bound every reachable distance: $dist")
    // fixpoint: no heavy-lane edge can still relax (8 rounds >= the
    // 25-node contracted graph's diameter, so Bellman-Ford converged)
    val t = Tables(spark, sfDir)
    val ew = GraphOps.tradeEdges(t)
    val thr = ew.agg(expr("percentile(w, 0.75)")).first().getDouble(0)
    val edges = ew.filter(col("w") >= thr)
      .filter(col("src") =!= col("dst")).select("src", "dst").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for ((s, d) <- edges if dist(s) < 999L)
      assert(dist(d) <= dist(s) + 1,
        s"edge $s->$d still relaxes: ${dist(s)} + 1 < ${dist(d)}")
  }

  test("g4: labels are a fixpoint over the symmetric heavy-lane edges") {
    val lab = GraphOps.g4_components(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(lab.nonEmpty)
    // component label = the min nation id of the component => every
    // label labels itself
    lab.values.foreach { case (c, _) => assert(lab(c)._1 == c,
      s"component label $c is not its own label: ${lab(c)}") }
    // sizes account every node exactly once
    assert(lab.values.groupBy(_._1).forall { case (c, ms) =>
      ms.head._2 == ms.size }, s"component sizes wrong: $lab")
    assert(lab.values.map(_._1).toSet.size ==
      lab.values.map(_._1).toSeq.distinct.size)
    // 24 rounds converged: both endpoints of every heavy edge agree
    val t = Tables(spark, sfDir)
    val ew = GraphOps.tradeEdges(t)
    val thr = ew.agg(expr("percentile(w, 0.75)")).first().getDouble(0)
    ew.filter(col("w") >= thr).filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct().collect()
      .foreach { r =>
        assert(lab(r.getLong(0))._1 == lab(r.getLong(1))._1,
          s"edge ${r.getLong(0)}-${r.getLong(1)} spans two components")
      }
  }

  test("tradeEdges out-weights cover every customer nation that ordered") {
    val t = Tables(spark, sfDir)
    val edges = GraphOps.tradeEdges(t)
    val srcNations = edges.select("src").distinct().count()
    assert(srcNations > 0)
    // weights total = lineitem rows that joined through to both dims
    val wTotal = edges.agg(sum("w")).collect().head.getLong(0)
    assert(wTotal <= t.lineitem.count())
  }
}
