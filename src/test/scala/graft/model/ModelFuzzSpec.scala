package graft.model

import graft.SparkSpec
import graft.fuzz.ModelGen

/** Fuzz family 6 (VERDICT r11 item 6): random model DAGs checked against
  * independent oracles computed in THIS spec from the generator's
  * ground-truth edges — no engine code path on the oracle side.
  *
  *   - dependency extraction (the Catalyst scoped-CTE walk) vs the
  *     template's factual references;
  *   - Selector.expand vs a fixpoint-iteration closure oracle (Selector
  *     itself uses a DFS stack — different algorithm, same answer);
  *   - topoLevels: parents strictly earlier, every model exactly once;
  *     deliberately-cyclic draws must throw;
  *   - full-DAG Catalyst analysis (`check`) on acyclic draws.
  *
  * The Spark-resolution facts the templates rely on (self-shadow CTE
  * body reads the catalog table; later siblings are not in scope) are
  * asserted VALUE-level in the first test, so a Spark behavior change
  * breaks loudly here rather than silently invalidating ground truth.
  */
class ModelFuzzSpec extends SparkSpec {

  private val seeds: Seq[Long] = 201L to 212L

  private lazy val engine = new ModelEngine(spark)

  test("model fuzz: the seeded draws regenerate bit-identically") {
    assert(ModelGen.digest(seeds) ==
      "608aabfdf80104f3a57205647978fb7e72d4391e98cc202d58724f51354f376f",
      "ModelGen drifted — DAG/selector coverage changed; update the pin deliberately")
  }

  test("model fuzz: Spark resolves the shadowing templates the way ground truth assumes") {
    import spark.implicits._
    Seq((1L, 10L)).toDF("k", "v").createOrReplaceTempView("fz_p1")
    // self-shadow: body's fz_p1 = the view, main query = the CTE
    val selfShadow = spark.sql(
      "WITH fz_p1 AS (SELECT k, v FROM fz_p1) SELECT k, v + 1 AS v FROM fz_p1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(selfShadow == Seq((1L, 11L)))
    // sibling-shadow: c1 sees the real view (the later CTE is not in scope)
    val sibling = spark.sql(
      "WITH c1 AS (SELECT k, v FROM fz_p1), fz_p1 AS (SELECT k, v + 5 AS v FROM c1) " +
        "SELECT k, v FROM fz_p1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sibling == Seq((1L, 15L)))
  }

  // ---------------------------------------------------------------- oracles

  /** Fixpoint closure over ground-truth edges (Selector uses a DFS). */
  private def fix(next: Map[String, Seq[String]], start: Set[String]): Set[String] = {
    var cur = start
    var prev = Set.empty[String]
    while (cur != prev) {
      prev = cur
      cur = cur ++ cur.flatMap(m => next.getOrElse(m, Nil))
    }
    cur
  }

  private def invert(deps: Map[String, Seq[String]]): Map[String, Seq[String]] =
    deps.toSeq.flatMap { case (m, ps) => ps.map(_ -> m) }.groupMap(_._1)(_._2)

  private def oracleExpand(deps: Map[String, Seq[String]], expr: String,
      modified: Set[String]): Set[String] = {
    val children = invert(deps)
    expr.split(",").map(_.trim).filter(_.nonEmpty).flatMap { tok =>
      val up = tok.startsWith("+")
      val down = tok.endsWith("+") && tok.length > 1
      val core = tok.stripPrefix("+").stripSuffix("+")
      val bases = if (core == "state:modified") modified.filter(deps.contains) else Set(core)
      bases.flatMap { b =>
        Set(b) ++
          (if (up) fix(deps, Set(b)) else Set.empty) ++
          (if (down) fix(children, Set(b)) else Set.empty)
      }
    }.toSet
  }

  // ------------------------------------------------------------------ fuzz

  test("model fuzz: dependency extraction, selector algebra, topo schedule on 12 random DAGs") {
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v").createOrReplaceTempView("src_a")
    Seq((2L, 200L), (3L, 300L), (4L, 400L)).toDF("k", "v").createOrReplaceTempView("src_b")

    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var cyclicSeen = 0
    for (seed <- seeds) {
      val d = ModelGen.draw(seed)
      val stmts = d.models.map(_.stmt)
      val truth = d.trueDepMap

      // 1. Catalyst reference walk vs ground truth
      val got = engine.dependencies(stmts)
      for (m <- d.models) {
        val g = got.getOrElse(m.stmt.name, Nil)
        val t = truth(m.stmt.name)
        if (g != t)
          failures += s"seed=$seed deps(${m.stmt.name}) [${m.template}]: engine=$g truth=$t sql=${m.stmt.query}"
      }

      // 2. Selector.expand vs the fixpoint oracle (over ground truth so a
      // deps bug cannot cancel a selector bug)
      for (sel <- d.selectors) {
        val e = Selector.expand(truth, sel, d.modified)
        val o = oracleExpand(truth, sel, d.modified)
        if (e != o)
          failures += s"seed=$seed selector '$sel' mod=${d.modified}: engine=${e.toSeq.sorted} oracle=${o.toSeq.sorted}"
      }

      // 3. topo schedule / cycle detection + 4. whole-DAG analysis
      if (d.cyclic) {
        cyclicSeen += 1
        val ex = intercept[IllegalStateException](engine.topoLevels(got))
        assert(ex.getMessage.contains("Cycle"), s"seed=$seed: wrong cycle error: ${ex.getMessage}")
      } else {
        val levels = engine.topoLevels(got)
        val flat = levels.flatten
        if (flat.sorted != d.models.map(_.stmt.name).sorted)
          failures += s"seed=$seed topo covers ${flat.size}/${d.models.size} models"
        val levelOf = levels.zipWithIndex.flatMap { case (l, i) => l.map(_ -> i) }.toMap
        for (m <- d.models; p <- truth(m.stmt.name))
          if (levelOf(p) >= levelOf(m.stmt.name))
            failures += s"seed=$seed topo: parent $p not before ${m.stmt.name}"

        val schemas = engine.check(stmts)
        for ((n, st) <- schemas if st.fieldNames.toSeq != Seq("k", "v"))
          failures += s"seed=$seed check($n): unexpected schema $st"
      }
    }
    assert(cyclicSeen > 0, "seed range drew no cyclic DAG — widen the range")
    assert(failures.isEmpty, s"${failures.size} divergences:\n${failures.mkString("\n")}")
  }
}
