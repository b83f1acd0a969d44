package graft.fuzz

import graft.model.{ModelStatement, ViewModel}

/** Model-DAG differential fuzzing (VERDICT r11 item 6): the selector
  * algebra (a7/a8/a9) and the Catalyst-walk dependency extractor were
  * proven only by fixture specs and one pinned diamond. This generator
  * draws random model projects — depths, diamonds, CTE shadowing in all
  * its scoping corners, subquery references, set-ops — and carries the
  * GROUND-TRUTH dependency edges alongside each drawn SQL text, so a
  * spec can check, independently of any engine code path:
  *
  *   - `ModelEngine.dependencies` == the generator's known edges (the
  *     Catalyst reference walk vs what the template factually references);
  *   - `Selector.expand` == an independent closure oracle computed in the
  *     spec from the ground-truth edges;
  *   - `topoLevels` is a valid level schedule (every parent strictly
  *     earlier), or throws on the deliberately-cyclic draws.
  *
  * The SQL templates are all ANALYZABLE (uniform (k BIGINT, v BIGINT)
  * schema over two source views src_a/src_b), so non-cyclic draws also
  * run through `check` — Catalyst analysis of the whole drawn DAG.
  *
  * Scoping semantics the templates pin down (verified against Spark's
  * own resolution — see ModelFuzzSpec):
  *   - `WITH x AS (SELECT .. FROM x)` — the body's x is the CATALOG
  *     table (non-recursive WITH), so x IS a dependency even though the
  *     name is CTE-bound downstream;
  *   - `WITH c1 AS (.. FROM p), p AS (.. FROM c1) SELECT .. FROM p` —
  *     c1's body sees the real p (later siblings are not in scope), the
  *     main query sees the CTE p; dependency = {p};
  *   - `WITH c1 AS (..), c2 AS (.. FROM c1)` — earlier siblings ARE in
  *     scope; c1 is not a dependency.
  */
object ModelGen {

  import QueryGen.Rng

  /** One drawn model: the statement plus the template's factual
    * upstream MODEL references (source views excluded, as
    * ModelEngine.dependencies excludes non-model references).
    */
  final case class GenModel(stmt: ModelStatement, trueDeps: Set[String], template: String)

  final case class Draw(
      seed: Long,
      models: Seq[GenModel],
      selectors: Seq[String],
      modified: Set[String],
      cyclic: Boolean) {
    def trueDepMap: Map[String, Seq[String]] =
      models.map(m => m.stmt.name -> m.trueDeps.toSeq.sorted).toMap
  }

  private val Sources = Seq("src_a", "src_b")

  /** Pick up to n distinct elements (draw order deterministic). */
  private def pickDistinct[T](rng: Rng, xs: Seq[T], n: Int): Seq[T] = {
    val pool = xs.toBuffer
    (0 until math.min(n, pool.size)).map { _ =>
      pool.remove(rng.nextInt(pool.size))
    }.toSeq
  }

  /** Build one model body over the chosen parents (model names and/or
    * sources). Returns (sql, trueModelDeps, templateTag). `others` are
    * model names that are NOT parents — shadow-name material.
    */
  private def body(rng: Rng, parents: Seq[String], modelParents: Set[String],
      others: Seq[String]): (String, Set[String], String) = {
    val deps = modelParents
    parents match {
      case Seq() =>
        val s = Sources(rng.nextInt(2))
        (s"SELECT k, v FROM $s", Set.empty, "source")
      case Seq(p) =>
        rng.nextInt(5) match {
          case 0 =>
            (s"SELECT k, v + ${rng.nextInt(9)} AS v FROM $p", deps, "plain")
          case 1 if others.nonEmpty =>
            // CTE named after a NON-parent model: must not become an edge
            val o = others(rng.nextInt(others.size))
            (s"WITH $o AS (SELECT k, v FROM $p) SELECT k, v FROM $o",
              deps, "shadow_other")
          case 2 =>
            // CTE shadowing the parent ITSELF, body reads the real table:
            // the dependency must survive (global subtraction drops it)
            (s"WITH $p AS (SELECT k, v FROM $p) SELECT k, v + 1 AS v FROM $p",
              deps, "self_shadow")
          case 3 =>
            // chained CTEs: earlier sibling in scope for the later body
            (s"WITH c1 AS (SELECT k, v FROM $p), c2 AS (SELECT k, v + 1 AS v FROM c1) " +
              "SELECT k, v FROM c2", deps, "cte_chain")
          case _ =>
            // later sibling shadows the parent; the earlier body reads the
            // real table (later siblings are not in scope)
            (s"WITH c1 AS (SELECT k, v FROM $p), $p AS (SELECT k, v + 5 AS v FROM c1) " +
              s"SELECT k, v FROM $p", deps, "sibling_shadow")
        }
      case Seq(p1, p2) =>
        rng.nextInt(4) match {
          case 0 =>
            (s"SELECT a.k AS k, a.v + b.v AS v FROM $p1 a JOIN $p2 b ON a.k = b.k",
              deps, "join")
          case 1 =>
            (s"SELECT k, v FROM $p1 UNION ALL SELECT k, v FROM $p2", deps, "union")
          case 2 =>
            // subquery-expression reference: IN
            (s"SELECT k, v FROM $p1 WHERE k IN (SELECT k FROM $p2)", deps, "in_subq")
          case _ =>
            // subquery-expression reference: EXISTS, inside a CTE body
            (s"WITH f AS (SELECT k, v FROM $p1 t WHERE EXISTS " +
              s"(SELECT 1 FROM $p2 u WHERE u.k = t.k)) SELECT k, v FROM f",
              deps, "exists_cte")
        }
      case ps =>
        val froms = ps.map(p => s"SELECT k, v FROM $p").mkString(" UNION ALL ")
        (froms, deps, "union_n")
    }
  }

  def draw(seed: Long): Draw = {
    val rng = new Rng(seed)
    val n = 8 + rng.nextInt(13) // 8..20 models
    val names = (1 to n).map(i => f"m$i%02d")
    val models = scala.collection.mutable.ArrayBuffer.empty[GenModel]
    names.zipWithIndex.foreach { case (name, i) =>
      val earlier = names.take(i)
      val nParents = if (i == 0) 0 else rng.nextInt(math.min(i, 3)) + (if (rng.chance(80)) 1 else 0)
      val parents = pickDistinct(rng, earlier, nParents)
      val others = names.filterNot(x => x == name || parents.contains(x))
      val (sql, deps, tmpl) = body(rng, parents, parents.toSet, others)
      models += GenModel(ViewModel(name, sql), deps, tmpl)
    }

    // ~1/4 of draws get a deliberate cycle: a<b where b already descends
    // from a (or is made to), then a is mutated to also read b.
    val cyclic = rng.chance(25)
    if (cyclic) {
      val a = rng.nextInt(n - 1)
      val b = a + 1 + rng.nextInt(n - 1 - a)
      val nb = names(b)
      // ensure b -> a edge exists (b depends on a)
      val gb = models(b)
      if (!gb.trueDeps.contains(names(a))) {
        val sql = s"SELECT k, v FROM (${gb.stmt.query}) zz WHERE k IN (SELECT k FROM ${names(a)})"
        models(b) = GenModel(ViewModel(nb, sql), gb.trueDeps + names(a), gb.template + "+cyc_edge")
      }
      val ga = models(a)
      val sql = s"SELECT k, v FROM (${ga.stmt.query}) zz WHERE k IN (SELECT k FROM $nb)"
      models(a) = GenModel(ViewModel(names(a), sql), ga.trueDeps + nb, ga.template + "+cycle")
    }

    // selector expressions: 4 tokens over real model names with random
    // closures, sometimes comma-joined, plus one state:modified form
    val selectors = (0 until 4).map { _ =>
      def tok(): String = {
        val m = names(rng.nextInt(n))
        (rng.chance(50), rng.chance(50)) match {
          case (true, true)  => s"+$m+"
          case (true, false) => s"+$m"
          case (false, true) => s"$m+"
          case _             => m
        }
      }
      if (rng.chance(40)) s"${tok()},${tok()}" else tok()
    } :+ (rng.nextInt(3) match {
      case 0 => "state:modified"
      case 1 => "state:modified+"
      case _ => "+state:modified+"
    })

    // modified set: random members plus one foreign name expand must drop
    val modified = pickDistinct(rng, names, 1 + rng.nextInt(4)).toSet + "not_a_model"

    Draw(seed, models.toSeq, selectors, modified, cyclic)
  }

  /** Seed-pin digest over everything a draw contains (same discipline as
    * OpGen.digest): any generator change shifts this and must be
    * re-pinned deliberately.
    */
  def digest(seeds: Seq[Long]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    seeds.foreach { s =>
      val d = draw(s)
      md.update(s"$s|cyclic=${d.cyclic}|sel=${d.selectors.mkString(";")}|mod=${d.modified.toSeq.sorted.mkString(",")}\n".getBytes("UTF-8"))
      d.models.foreach { m =>
        md.update(s"${m.stmt.name}[${m.template}]{${m.trueDeps.toSeq.sorted.mkString(",")}}: ${m.stmt.query}\n".getBytes("UTF-8"))
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }
}
