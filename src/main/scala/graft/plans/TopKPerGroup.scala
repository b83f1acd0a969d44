package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, Descending, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
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
    val spillThreshold = conf.getConfString(
      "spark.graft.topk.spillThresholdBytes", TopKPerGroupExec.DefaultSpillThreshold.toString).toLong
    child.execute().mapPartitions(
      TopKPerGroupExec.process(_, g, s, childOut, kk, spillThreshold),
      preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** The per-partition top-k-per-group kernel, shared by the partial and
  * final passes. The hash-of-heaps fast path holds ≤ k rows per group;
  * its footprint is O(groups·k), which at very high group cardinality
  * could exceed task memory — so retained bytes are tracked exactly
  * (UnsafeRow sizes) and, past `spark.graft.topk.spillThresholdBytes`
  * (default 256 MiB/task), the heaps SPILL as a group-key-sorted run and
  * the map restarts empty. Runs are k-way merged by key at the end, one
  * group at a time — top-k is a semilattice merge (top-k of per-run
  * top-ks = the true top-k), so correctness is unaffected and merge
  * memory is O(k·runs + stream buffers) regardless of group count.
  */
object TopKPerGroupExec {

  val DefaultSpillThreshold: Long = 256L << 20

  private final class RunReader(val file: java.io.File, numFields: Int) {
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(file), 1 << 16))
    var key: Array[Byte] = _
    var rows: Array[UnsafeRow] = _
    /** Loads the next (key, rows) block; false (and closes) at EOF. */
    def advance(): Boolean = {
      val kl = try in.readInt() catch {
        case _: java.io.EOFException => in.close(); key = null; return false
      }
      key = new Array[Byte](kl); in.readFully(key)
      rows = Array.fill(in.readInt()) {
        val rl = in.readInt()
        val b = new Array[Byte](rl); in.readFully(b)
        val r = new UnsafeRow(numFields); r.pointTo(b, rl); r
      }
      true
    }
  }

  // scalastyle:off method.length
  def process(
      iter: Iterator[InternalRow],
      groupExprs: Seq[Expression],
      sortOrder: Seq[SortOrder],
      childOut: Seq[Attribute],
      k: Int,
      spillThreshold: Long): Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    val groupProj = UnsafeProjection.create(groupExprs, childOut)
    val toUnsafe = UnsafeProjection.create(childOut, childOut)
    val ordering = GenerateOrdering.generate(sortOrder, childOut)
    // head of each heap = the WORST retained row (last under the sort
    // order), so admission is a single O(1) peek + O(log k) replace
    val worstFirst = new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(b, a)
    }
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
    val spills = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
    var retainedBytes = 0L

    // group keys order + equality both operate on canonical UnsafeRow
    // bytes (one projection produced every key), so an unsigned
    // lexicographic byte compare is a valid grouping order for the runs
    def flush(): Unit = if (!heaps.isEmpty) {
      val entries = heaps.entrySet().iterator().asScala.map { e =>
        (e.getKey.getBytes, e.getValue.iterator().asScala.map(_.getBytes).toArray)
      }.toArray.sortWith((a, b) => java.util.Arrays.compareUnsigned(a._1, b._1) < 0)
      val f = java.io.File.createTempFile("graft-topk-spill-", ".run")
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 16))
      try {
        entries.foreach { case (keyBytes, rowsBytes) =>
          out.writeInt(keyBytes.length); out.write(keyBytes)
          out.writeInt(rowsBytes.length)
          rowsBytes.foreach { rb => out.writeInt(rb.length); out.write(rb) }
        }
      } finally out.close()
      spills += f
      heaps.clear()
      retainedBytes = 0L
    }

    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => spills.foreach(_.delete()))

    while (iter.hasNext) {
      val row = iter.next()
      val u = row match { case ur: UnsafeRow => ur; case other => toUnsafe(other) }
      val key = groupProj(u)
      var pq = heaps.get(key)
      if (pq == null) {
        pq = new java.util.PriorityQueue[UnsafeRow](k + 1, worstFirst)
        val kc = key.copy()
        heaps.put(kc, pq)
        retainedBytes += kc.getSizeInBytes
      }
      if (pq.size < k) {
        val c = u.copy(); pq.add(c); retainedBytes += c.getSizeInBytes
      } else if (ordering.compare(u, pq.peek()) < 0) {
        retainedBytes -= pq.poll().getSizeInBytes
        val c = u.copy(); pq.add(c); retainedBytes += c.getSizeInBytes
      }
      if (retainedBytes > spillThreshold) flush()
    }

    if (spills.isEmpty) {
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    } else {
      flush() // uniform inputs: everything merges from sorted runs
      val readers = spills.map(new RunReader(_, childOut.length)).filter(_.advance())
      val byKey = new java.util.PriorityQueue[RunReader](math.max(readers.size, 1),
        (a: RunReader, b: RunReader) => java.util.Arrays.compareUnsigned(a.key, b.key))
      readers.foreach(byKey.add)
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!out.hasNext && !byKey.isEmpty) nextGroup()
          out.hasNext
        }
        override def next(): InternalRow = { hasNext; out.next() }
        private def nextGroup(): Unit = {
          val heap = new java.util.PriorityQueue[UnsafeRow](k + 1, worstFirst)
          def admit(rs: Array[UnsafeRow]): Unit = rs.foreach { r =>
            if (heap.size < k) heap.add(r)
            else if (ordering.compare(r, heap.peek()) < 0) { heap.poll(); heap.add(r) }
          }
          val first = byKey.poll()
          val gkey = first.key // advance() replaces .key; this ref stays valid
          admit(first.rows)
          if (first.advance()) byKey.add(first)
          while (!byKey.isEmpty && java.util.Arrays.equals(byKey.peek().key, gkey)) {
            val r = byKey.poll()
            admit(r.rows)
            if (r.advance()) byKey.add(r)
          }
          out = heap.iterator().asScala
        }
      }
    }
  }
  // scalastyle:on method.length
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
    // commuted literal-first spellings of the same bounds
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: AttributeReference) if a.semanticEquals(rn) => Some(k - 1)
    // rn = 1 (either side) — the latest-per-key idiom; row_number() is
    // always ≥ 1 so equality to 1 IS the top-1 bound (k > 1 is a slice,
    // not a top-k, and stays on the window plan)
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: AttributeReference) if a.semanticEquals(rn) => Some(1)
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
