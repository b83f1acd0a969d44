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
