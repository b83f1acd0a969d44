package graft.fuzz

/** Deterministic differential-fuzz query generator (SURVEY §2 fuzz
  * gate). 140 hand-written oracle entries can only catch the bug
  * classes somebody thought to write an entry for; this generator
  * samples the SUPPORTED SQL surface — scans, filters, expressions,
  * inner/left joins and 3-table chains, aggregates, HAVING, windows
  * (ranks, framed running sums, LAG), set operations, scalar/IN
  * subqueries, correlated [NOT] EXISTS, CTEs — q41-discipline VERBATIM
  * text: the
  * identical query string runs on Spark and on DuckDB and must produce
  * identical rows.
  *
  * Determinism rules the grammar enforces so a divergence is always a
  * real engine bug, never an underspecified query:
  *   - integer + varchar columns only (no doubles: float summation
  *     order is engine-defined; no timestamps: writer-convention seam
  *     is covered by its own entries);
  *   - int leaves are CAST to BIGINT so arithmetic never overflows a
  *     32-bit lane in one engine and promotes in the other;
  *   - every output column is explicitly aliased c0..cN on both sides
  *     of the text (the cross-engine compare is by column NAME);
  *   - every ORDER BY key carries NULLS FIRST (Spark's ASC default;
  *     DuckDB's is NULLS LAST) and orders by ALL output columns before
  *     any LIMIT, so the kept prefix is content-deterministic;
  *   - window ORDER BY always ends with the table's unique key — rank
  *     functions see a total order.
  *
  * The RNG is splitmix64 (stable bit-for-bit across JVMs; no
  * java.util.Random whose stream is only contractually stable) so the
  * committed corpus regenerates identically anywhere.
  */
object QueryGen {

  final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(n: Int): Int = Math.floorMod(nextLong(), n.toLong).toInt
    def pick[T](xs: Seq[T]): T = xs(nextInt(xs.size))
    def chance(pct: Int): Boolean = nextInt(100) < pct
  }

  final case class Tbl(name: String, intCols: Seq[String],
      strCols: Seq[String], unique: Seq[String])

  val tables: Seq[Tbl] = Seq(
    Tbl("nation", Seq("n_nationkey", "n_regionkey"), Seq("n_name"), Seq("n_nationkey")),
    Tbl("region", Seq("r_regionkey"), Seq("r_name"), Seq("r_regionkey")),
    Tbl("customer", Seq("c_custkey", "c_nationkey"), Seq("c_name", "c_mktsegment"), Seq("c_custkey")),
    Tbl("orders", Seq("o_orderkey", "o_custkey"), Seq("o_orderstatus", "o_orderpriority"), Seq("o_orderkey")),
    Tbl("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
      Seq("l_returnflag", "l_linestatus"), Seq("l_orderkey", "l_linenumber")),
    Tbl("supplier", Seq("s_suppkey", "s_nationkey"), Seq("s_name"), Seq("s_suppkey")),
    Tbl("part", Seq("p_partkey", "p_size"), Seq("p_name", "p_brand"), Seq("p_partkey")))

  private def tbl(name: String): Tbl = tables.find(_.name == name).get

  /** (left, right, join condition) over real foreign keys. */
  val joins: Seq[(Tbl, Tbl, String)] = Seq(
    (tbl("customer"), tbl("nation"), "c_nationkey = n_nationkey"),
    (tbl("supplier"), tbl("nation"), "s_nationkey = n_nationkey"),
    (tbl("nation"), tbl("region"), "n_regionkey = r_regionkey"),
    (tbl("orders"), tbl("customer"), "o_custkey = c_custkey"),
    (tbl("lineitem"), tbl("orders"), "l_orderkey = o_orderkey"),
    (tbl("lineitem"), tbl("part"), "l_partkey = p_partkey"),
    (tbl("lineitem"), tbl("supplier"), "l_suppkey = s_suppkey"))

  /** A FROM source: its SQL text, the columns in scope, a unique key. */
  final case class Src(sql: String, intCols: Seq[String], strCols: Seq[String],
      unique: Seq[String])

  private def source(r: Rng): Src =
    if (r.chance(45)) {
      val (a, b, on) = r.pick(joins)
      val jt = if (r.chance(30)) "LEFT JOIN" else "JOIN"
      // LEFT JOIN makes the right side nullable — still fine: NULLS
      // FIRST ordering and NULL-safe canonicalization cover it
      val two = Src(s"${a.name} $jt ${b.name} ON $on",
        a.intCols ++ b.intCols, a.strCols ++ b.strCols,
        a.unique ++ b.unique)
      // 3-table chain when a second FK continues from the right table
      // (lineitem→orders→customer, customer→nation→region, …): INNER
      // only — a LEFT chain's null-extended middle would make the second
      // ON condition engine-trickier than the bug class is worth
      val next = joins.filter { case (x, _, _) => x.name == b.name }
      if (jt == "JOIN" && next.nonEmpty && r.chance(40)) {
        val (_, c, on2) = r.pick(next)
        Src(s"${two.sql} JOIN ${c.name} ON $on2",
          two.intCols ++ c.intCols, two.strCols ++ c.strCols,
          two.unique ++ c.unique)
      } else two
    } else {
      val t = r.pick(tables)
      Src(t.name, t.intCols, t.strCols, t.unique)
    }

  private def intLeaf(r: Rng, s: Src): String =
    s"CAST(${r.pick(s.intCols)} AS BIGINT)"

  private def intExpr(r: Rng, s: Src, depth: Int = 0): String =
    if (depth >= 2 || r.chance(45)) intLeaf(r, s)
    else r.nextInt(5) match {
      case 0 => s"(${intExpr(r, s, depth + 1)} + ${intExpr(r, s, depth + 1)})"
      case 1 => s"(${intExpr(r, s, depth + 1)} * ${1 + r.nextInt(9)})"
      case 2 => s"(${intLeaf(r, s)} % ${2 + r.nextInt(97)})"
      case 3 => s"(CASE WHEN ${pred(r, s, 1)} THEN ${intExpr(r, s, depth + 1)} ELSE ${intExpr(r, s, depth + 1)} END)"
      case _ => s"COALESCE(NULLIF(${intLeaf(r, s)}, ${r.nextInt(30)}), ${r.nextInt(10)})"
    }

  private def strExpr(r: Rng, s: Src): String = {
    val c = r.pick(s.strCols)
    r.nextInt(4) match {
      case 0 => c
      case 1 => s"UPPER($c)"
      case 2 => s"SUBSTR($c, 1, ${1 + r.nextInt(6)})"
      case _ => s"(LOWER($c) || '_${('a' + r.nextInt(26)).toChar}')"
    }
  }

  private def pred(r: Rng, s: Src, depth: Int = 0): String =
    if (depth >= 2 || r.chance(50)) r.nextInt(5) match {
      case 0 => s"${intLeaf(r, s)} ${r.pick(Seq("<", "<=", ">", ">=", "=", "<>"))} ${r.nextInt(2000)}"
      case 1 => s"${intLeaf(r, s)} BETWEEN ${r.nextInt(500)} AND ${500 + r.nextInt(3000)}"
      case 2 => s"${intLeaf(r, s)} IN (${Seq.fill(2 + r.nextInt(4))(r.nextInt(300)).mkString(", ")})"
      case 3 => s"${r.pick(s.strCols)} LIKE '%${('a' + r.nextInt(26)).toChar}%'"
      case _ => s"${intLeaf(r, s)} % ${2 + r.nextInt(9)} = ${r.nextInt(2)}"
    }
    else r.nextInt(3) match {
      case 0 => s"(${pred(r, s, depth + 1)} AND ${pred(r, s, depth + 1)})"
      case 1 => s"(${pred(r, s, depth + 1)} OR ${pred(r, s, depth + 1)})"
      case _ => s"(NOT ${pred(r, s, depth + 1)})"
    }

  private def aggExpr(r: Rng, s: Src): String = r.nextInt(6) match {
    case 0 => "COUNT(*)"
    case 1 => s"COUNT(${r.pick(s.intCols ++ s.strCols)})"
    case 2 => s"COUNT(DISTINCT ${r.pick(s.intCols ++ s.strCols)})"
    case 3 => s"SUM(${intExpr(r, s, 1)})"
    case 4 => s"MIN(${if (r.chance(50)) intExpr(r, s, 1) else strExpr(r, s)})"
    case _ => s"MAX(${if (r.chance(50)) intExpr(r, s, 1) else strExpr(r, s)})"
  }

  private def orderByAll(n: Int): String =
    s"ORDER BY ${(0 until n).map(i => s"c$i NULLS FIRST").mkString(", ")}"

  private def limit(r: Rng): String =
    if (r.chance(55)) s" LIMIT ${20 + r.nextInt(180)}" else ""

  /** Form 1: scan → filter → expression projection. */
  private def scanQuery(r: Rng, s: Src): String = {
    val n = 2 + r.nextInt(3)
    val cols = (0 until n).map { i =>
      val e = if (r.chance(60)) intExpr(r, s) else strExpr(r, s)
      s"$e AS c$i"
    }
    val where = if (r.chance(75)) s" WHERE ${pred(r, s)}" else ""
    s"SELECT ${cols.mkString(", ")} FROM ${s.sql}$where ${orderByAll(n)}${limit(r)}"
  }

  /** Form 2: aggregate (grouped or global) with optional HAVING. */
  private def aggQuery(r: Rng, s: Src): String = {
    val ng = r.nextInt(3) // 0 = global aggregate
    val gexprs = (0 until ng).map(_ => if (r.chance(60)) strExpr(r, s) else intExpr(r, s, 1))
    val na = 1 + r.nextInt(3)
    val aggs = (0 until na).map(_ => aggExpr(r, s))
    val cols = (gexprs ++ aggs).zipWithIndex.map { case (e, i) => s"$e AS c$i" }
    val where = if (r.chance(60)) s" WHERE ${pred(r, s)}" else ""
    val group = if (ng > 0) s" GROUP BY ${gexprs.mkString(", ")}" else ""
    val having = if (ng > 0 && r.chance(40)) s" HAVING COUNT(*) > ${r.nextInt(3)}" else ""
    s"SELECT ${cols.mkString(", ")} FROM ${s.sql}$where$group$having ${orderByAll(ng + na)}${limit(r)}"
  }

  /** Form 3: window functions over a single table (total order via the
    * unique key so rank/row_number are content-deterministic).
    */
  private def windowQuery(r: Rng): String = {
    val t = r.pick(tables)
    val s = Src(t.name, t.intCols, t.strCols, t.unique)
    val part = r.pick(t.strCols ++ t.intCols)
    val ord = s"${intLeaf(r, s)} NULLS FIRST, ${t.unique.map(u => s"$u NULLS FIRST").mkString(", ")}"
    val wfn = r.nextInt(6) match {
      case 0 => s"ROW_NUMBER() OVER (PARTITION BY $part ORDER BY $ord)"
      case 1 => s"RANK() OVER (PARTITION BY $part ORDER BY $ord)"
      case 2 => s"DENSE_RANK() OVER (PARTITION BY $part ORDER BY $ord)"
      case 3 => s"SUM(${intLeaf(r, s)}) OVER (PARTITION BY $part)"
      // framed running sum / lag over the total order: the frame sees a
      // deterministic row sequence, so the prefix sums are content-exact
      case 4 => s"SUM(${intLeaf(r, s)}) OVER (PARTITION BY $part ORDER BY $ord " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
      case _ => s"LAG(${intLeaf(r, s)}, 1) OVER (PARTITION BY $part ORDER BY $ord)"
    }
    val keys = t.unique.zipWithIndex.map { case (u, i) => s"$u AS c$i" }
    val n = t.unique.size + 1
    val where = if (r.chance(60)) s" WHERE ${pred(r, s)}" else ""
    s"SELECT ${keys.mkString(", ")}, $wfn AS c${n - 1} FROM ${t.name}$where ${orderByAll(n)}${limit(r)}"
  }

  /** Form 4: set operation between two shape-compatible selects. */
  private def setopQuery(r: Rng): String = {
    val t = r.pick(tables)
    val s = Src(t.name, t.intCols, t.strCols, t.unique)
    def side(): String = {
      val i = intExpr(r, s, 1); val st = strExpr(r, s)
      s"SELECT $i AS c0, $st AS c1 FROM ${t.name} WHERE ${pred(r, s)}"
    }
    val op = r.pick(Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
    s"SELECT c0, c1 FROM (${side()} $op ${side()}) u ${orderByAll(2)}${limit(r)}"
  }

  /** Form 5: scalar- or IN-subquery (Catalyst decorrelation surface). */
  private def subqueryQuery(r: Rng): String = {
    val (a, b, on) = r.pick(joins)
    val Array(lk, rk) = on.split(" = ")
    val sa = Src(a.name, a.intCols, a.strCols, a.unique)
    val sb = Src(b.name, b.intCols, b.strCols, b.unique)
    val n = 2
    val cols = (0 until n).map { i =>
      val e = if (r.chance(60)) intExpr(r, sa) else strExpr(r, sa)
      s"$e AS c$i"
    }
    val sub = r.nextInt(4) match {
      case 0 =>
        s"$lk IN (SELECT $rk FROM ${b.name} WHERE ${pred(r, sb)})"
      case 1 =>
        s"CAST($lk AS BIGINT) > (SELECT MIN(CAST($rk AS BIGINT)) FROM ${b.name} WHERE ${pred(r, sb)})"
      // correlated [NOT] EXISTS — Catalyst's semi/anti decorrelation path
      case 2 =>
        s"EXISTS (SELECT 1 FROM ${b.name} WHERE $rk = $lk AND ${pred(r, sb)})"
      case _ =>
        s"NOT EXISTS (SELECT 1 FROM ${b.name} WHERE $rk = $lk AND ${pred(r, sb)})"
    }
    val extra = if (r.chance(40)) s" AND ${pred(r, sa)}" else ""
    s"SELECT ${cols.mkString(", ")} FROM ${a.name} WHERE $sub$extra ${orderByAll(n)}${limit(r)}"
  }

  /** One verbatim cross-engine query for `seed`. */
  def generate(seed: Long): String = {
    val r = new Rng(seed * 0x5851f42d4c957f2dL + 0x14057b7ef767814fL)
    val body = r.nextInt(10) match {
      case 0 | 1 | 2 => scanQuery(r, source(r))
      case 3 | 4 | 5 => aggQuery(r, source(r))
      case 6         => windowQuery(r)
      case 7         => setopQuery(r)
      case _         => subqueryQuery(r)
    }
    if (r.chance(25)) {
      // CTE wrapper: same text, exercised through the WITH frontend
      s"WITH q AS ($body) SELECT * FROM q"
    } else body
  }

  /** The committed corpus: seeds 1..n. */
  def corpus(n: Int): Seq[(String, String)] =
    (1 to n).map(i => (f"fz$i%03d", generate(i.toLong)))

  /** The corpus as the JSON text FuzzSpec pins and fuzz_oracle.py
    * consumes (SQL has no control characters, so escaping is \\ and \").
    */
  def corpusJson(n: Int): String =
    corpus(n).map { case (k, v) =>
      "\"" + k + "\": \"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ", ", "}")
}

/** Regenerates the committed fuzz corpus (deliberate-drift tool):
  * `runMain graft.fuzz.FuzzGen src/test/resources/fuzz_corpus.json`.
  */
object FuzzGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/fuzz_corpus.json")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      QueryGen.corpusJson(200).getBytes("UTF-8"))
    println(s"wrote 200-seed corpus to $out")
  }
}
