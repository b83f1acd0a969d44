package graft.model

/** dbt-style graph selection over the model DAG (public dbt semantics:
  * `m` = just m, `+m` = m plus every ancestor, `m+` = m plus every
  * descendant, `+m+` = both; a comma-separated list unions selections).
  * This is the build-only-what-changed lever: on a 500-model project a
  * `--select changed_model+` run rebuilds one branch instead of the
  * whole DAG, with unselected upstream models re-attached from their
  * materialized state.
  */
object Selector {

  /** Expand a selector expression into the set of model names, given the
    * parent-dependency map from [[ModelEngine.dependencies]].
    */
  def expand(deps: Map[String, Seq[String]], expr: String): Set[String] =
    expand(deps, expr, Set.empty)

  /** Expansion with state awareness: the token `state:modified` selects
    * every model in `modified` (from [[ModelEngine.modifiedSince]] — an
    * edited or baseline-unknown definition), and takes the same
    * `+`-prefix/suffix closures as a named model, applied per member:
    * `state:modified+` is dbt's slim-CI build set — everything a CI run
    * must rebuild and retest after a diff. An empty `modified` set makes
    * the token select nothing (no edits → no CI work), never an error.
    */
  def expand(deps: Map[String, Seq[String]], expr: String,
             modified: Set[String]): Set[String] = {
    val children: Map[String, Seq[String]] =
      deps.toSeq
        .flatMap { case (m, parents) => parents.map(_ -> m) }
        .groupMap(_._1)(_._2)
    def closure(start: String, next: String => Seq[String]): Set[String] = {
      val seen = scala.collection.mutable.Set(start)
      val stack = scala.collection.mutable.Stack(start)
      while (stack.nonEmpty) {
        val cur = stack.pop()
        next(cur).foreach(n => if (seen.add(n)) stack.push(n))
      }
      seen.toSet
    }
    expr.split(",").map(_.trim).filter(_.nonEmpty).flatMap { tok =>
      val up = tok.startsWith("+")
      val down = tok.endsWith("+") && tok.length > 1
      val core = tok.stripPrefix("+").stripSuffix("+")
      val bases: Set[String] =
        if (core == "state:modified") modified.filter(deps.contains)
        else {
          require(deps.contains(core), s"unknown model in --select: $core")
          Set(core)
        }
      bases.flatMap { name =>
        var s = Set(name)
        if (up) s ++= closure(name, n => deps.getOrElse(n, Nil))
        if (down) s ++= closure(name, n => children.getOrElse(n, Nil))
        s
      }
    }.toSet
  }
}
