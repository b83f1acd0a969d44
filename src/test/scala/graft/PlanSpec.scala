package graft

import graft.queries.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits (SURVEY §5): these lock in the *shape* that makes
  * the queries scale — filters and projections reaching the parquet scan,
  * dims broadcast, aggregates partial, top-k never globally sorting —
  * so a regression that silently de-optimizes a plan fails CI, not a
  * 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** number of physical nodes of the given name (counted from the
    * formatted-explain detail headers, one per node)
    */
  private def nodeCount(plan: String, name: String): Int =
    plan.linesIterator.count(_.trim.matches(s"\\(\\d+\\) $name( .*)?"))

  test("q2: predicates and projection are pushed into the parquet scan") {
    val plan = formatted(Relational.q2_filter_project(spark, sfDir))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range must reach the scan")
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!readSchema.contains("l_returnflag") && !readSchema.contains("l_tax"),
      s"scan must prune unused columns, got $readSchema")
  }

  test("q3: dimension join is a broadcast join, no shuffle of the fact side") {
    val plan = formatted(Relational.q3_join_broadcast(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q1: aggregation is partial (map-side) before the shuffle, codegen'd") {
    val df = Relational.q1_agg(spark, sfDir)
    val plan = formatted(df)
    assert(nodeCount(plan, "HashAggregate") >= 2, "expect partial + final HashAggregate")
    assert(plan.contains("partial_sum"), "map-side partial aggregation required")
    df.collect() // materialize so AQE finalizes the plan
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "agg pipeline must run inside whole-stage codegen (the *(n) markers)")
  }

  test("q7: global top-k plans TakeOrderedAndProject, not a full sort") {
    val plan = formatted(Relational.q7_topk(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Exchange rangepartitioning"), "no global sort for top-k")
  }

  test("q18: star join broadcasts all dims; single fact-fact shuffle join") {
    val plan = formatted(Relational.q18_star_revenue(spark, sfDir))
    assert(nodeCount(plan, "BroadcastHashJoin") >= 3,
      "customer/nation/region joins must broadcast")
  }

  test("text ops are narrow: only the output sort shuffles") {
    val plan = formatted(graft.ops.TextOps.t2_quality(spark, sfDir))
    assert(nodeCount(plan, "Exchange") <= 1,
      "per-row scoring must not shuffle (only the final ORDER BY may)")
  }

  test("dedup LSH never degenerates into a cartesian product") {
    val plan = formatted(graft.ops.Dedup.d2_dedup_minhash(spark, sfDir))
    assert(!plan.contains("CartesianProduct"))
  }

  test("ANN brute-force broadcasts the query side") {
    val plan = formatted(graft.ops.Similarity.s1_ann_topk(spark, sfDir))
    assert(plan.contains("Broadcast"), "query set must broadcast, corpus scanned once")
  }
}
