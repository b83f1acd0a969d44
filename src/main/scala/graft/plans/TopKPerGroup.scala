package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, Descending, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension showcase (SURVEY §3 strategy (c)): top-k rows
  * per group as a FIRST-CLASS physical operator instead of the
  * window-function formulation.
  *
  * Why it matters at 100 TB: `row_number() OVER (PARTITION BY g ORDER BY
  * v) <= k` shuffles EVERY row of every group, then fully sorts each
  * group just to discard all but k rows. This operator keeps a bounded
  * heap of k rows per group — O(groups·k) memory, no sort — and runs
  * TWICE: a partial pass before the shuffle (the "combiner": each map
  * task forwards at most k rows per group) and a final pass after it.
  * The shuffle therefore carries ≤ k·partitions rows per group instead
  * of the group's full population — for top-3-of-millions that is a
  * ~10⁵× shuffle reduction.
  *
  * Wiring: custom logical node (`TopKPerGroupNode`) → planner strategy
  * (`TopKPerGroupStrategy`, injected via `spark.experimental
  * .extraStrategies`) → physical `TopKPerGroupExec` whose
  * `requiredChildDistribution` makes Spark insert the one hash exchange.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, s, k, child) =>
      val partial = TopKPerGroupExec(g, s, k, planLater(child), partial = true)
      TopKPerGroupExec(g, s, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** The final pass demands co-located groups — Spark plans the single
    * hash exchange; the partial pass runs wherever the data already is.
    * An EMPTY group list is the GLOBAL top-k: one logical group, so the
    * final pass demands `AllTuples` (a single-partition exchange carrying
    * only the ≤ k·partitions partial survivors — the same shape as
    * TakeOrderedAndProject, with a heap instead of a sort).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, s, childOut, kk) = (groupExprs, sortOrder, child.output, k)
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(g, childOut)
      val ordering = GenerateOrdering.generate(s, childOut)
      // head of each heap = the WORST retained row (last under the sort
      // order), so admission is a single O(1) peek + O(log k) replace
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ordering.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), pq)
        }
        if (pq.size < kk) pq.add(row.copy())
        else if (ordering.compare(row, pq.peek()) < 0) { pq.poll(); pq.add(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Optimizer rule (the Rule[LogicalPlan] extension point): rewrites the
  * window idiom `... row_number() OVER (PARTITION BY g ORDER BY s) AS rn
  * WHERE rn <= k` into TopKPerGroupNode — but ONLY when the rank column
  * itself is projected away, so the rewrite is semantics-preserving.
  * Users keep writing the familiar window formulation; the plan they get
  * is the bounded-heap operator. (Spark's own InferWindowGroupLimit
  * reduces rows entering the window since 3.5, but still sorts every
  * group and runs the window; this rewrite removes the sort+window
  * entirely.) DEFAULT-ON for graft sessions (GraftSession.init /
  * GraftExtensions) under the QueryGen differential fuzz gate; foreign
  * sessions opt in via TopKPerGroup.enableAutoRewrite(spark).
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {
  private def limit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        Filter(cond, Window(
          Seq(alias @ Alias(WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)), _)),
          _, _, child, _)))
        if !projectList.exists(_.references.contains(alias.toAttribute)) =>
      limit(cond, alias.toAttribute) match {
        // An empty PARTITION BY is the GLOBAL top-k: the operator now
        // handles it natively (empty grouping → partial per-partition
        // heaps + one AllTuples merge of ≤ k·partitions rows), so the
        // single most common interactive shape — `row_number() <= k`
        // over the whole input — no longer falls back to a
        // single-partition WindowExec.
        case Some(k) if k >= 1 && order.nonEmpty =>
          // InferWindowGroupLimit may already have slid a WindowGroupLimit
          // under the Window; the heap operator subsumes it — unwrap.
          val base = child match {
            case WindowGroupLimit(_, _, _, _, grandChild) => grandChild
            case other => other
          }
          Project(projectList, TopKPerGroupNode(part, order, k, base))
        case _ => p
      }
  }
}

object TopKPerGroup {

  /** Opt-in automatic rewrite: window row_number top-k filters plan into
    * the native operator from here on (idempotent).
    */
  def enableAutoRewrite(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(TopKWindowRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKWindowRewrite
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
  }

  /** Top-k rows per group. `orderBy` is (column, ascending); ordering
    * should be total (include a unique tiebreak column) for deterministic
    * results. An EMPTY `groupCols` computes the GLOBAL top-k (partial
    * heaps per partition, one single-partition merge of the survivors).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    val child = GraftColumnShim.logicalPlan(df)
    def attr(n: String) = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"no column '$n' in ${child.output.map(_.name).mkString(", ")}"))
    val g = groupCols.map(attr(_).asInstanceOf[Expression])
    val s = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    GraftColumnShim.ofRows(spark, TopKPerGroupNode(g, s, k, child))
  }
}
