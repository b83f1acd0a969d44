package graft.model

/** The SQL-model surface of the engine, mirroring what PowerSQL accepts
  * (reference: src/main.rs:144-190): `CREATE [MATERIALIZED] VIEW … AS`,
  * `CREATE TABLE … AS`, and `ASSERT <bool-expr> AS 'message'` test
  * statements. The *query* text itself is later parsed/analyzed by
  * Catalyst, so anything Spark SQL accepts is a valid model body — a
  * strictly wider dialect than the reference's sqlparser-rs subset.
  */
sealed trait ModelStatement {
  def name: String
  def query: String
}

/** `CREATE VIEW name AS query` — logical only, never materialized. */
final case class ViewModel(name: String, query: String) extends ModelStatement

/** `CREATE MATERIALIZED VIEW | CREATE TABLE name AS query` — written to
  * the warehouse as parquet and re-registered so downstream models read
  * the materialized data (reference: src/execute.rs:77-111 drop+recreate).
  */
final case class TableModel(name: String, query: String) extends ModelStatement

/** `ASSERT condition AS 'message'` (reference: src/main.rs:167-190). */
final case class AssertTest(condition: String, message: String)

/** Project config, the powersql.toml surface (reference: src/main.rs:19-28):
  * `[project] name=… models=[dirs] tests=[dirs]`.
  */
final case class Project(name: String, models: Seq[String], tests: Seq[String],
    seeds: Seq[String] = Nil)

object Project {

  /** Minimal TOML-subset reader for the reference's config shape (flat
    * `[project]` table, string + string-array values). No external deps —
    * build.sbt is intentionally closed (zero egress).
    */
  def fromToml(text: String): Project = {
    var name = ""
    var models = Seq.empty[String]
    var tests = Seq.empty[String]
    var seeds = Seq.empty[String]
    var inProject = false
    text.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach {
      case l if l.startsWith("[") =>
        inProject = l == "[project]"
      case l if inProject && l.contains("=") =>
        val Array(k, v) = l.split("=", 2).map(_.trim)
        def strings(s: String): Seq[String] =
          s.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
        k match {
          case "name"   => name = v.stripPrefix("\"").stripSuffix("\"")
          case "models" => models = strings(v)
          case "tests"  => tests = strings(v)
          case "seeds"  => seeds = strings(v)
          case _        => ()
        }
      case _ => ()
    }
    Project(name, models, tests, seeds)
  }

  def load(path: String): Project =
    fromToml(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
}

/** Statement-level front-end: splits a `.sql` file into statements and
  * classifies the three accepted statement kinds. Only the thin outer
  * layer is hand-parsed (comment/quote-aware splitting + the CREATE/ASSERT
  * headers); the query bodies go to Catalyst untouched.
  */
object ModelParser {

  /** Split on `;` at top level — aware of single/double quotes and
    * `--` / multiline comments so literals containing `;` survive.
    */
  def splitStatements(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inS = false; var inD = false; var inLineC = false; var inBlockC = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      val next = if (i + 1 < sql.length) sql.charAt(i + 1) else ' '
      if (inLineC) { if (c == '\n') inLineC = false; cur.append(c) }
      else if (inBlockC) { if (c == '*' && next == '/') { inBlockC = false; cur.append("*/"); i += 1 } else cur.append(c) }
      else if (inS) { if (c == '\'') inS = false; cur.append(c) }
      else if (inD) { if (c == '"') inD = false; cur.append(c) }
      else c match {
        case '\'' => inS = true; cur.append(c)
        case '"'  => inD = true; cur.append(c)
        case '-' if next == '-' => inLineC = true; cur.append(c)
        case '/' if next == '*' => inBlockC = true; cur.append("/*"); i += 1
        case ';' => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(s => stripComments(s).trim.nonEmpty)
  }

  private def stripComments(s: String): String =
    s.replaceAll("(?s)/\\*.*?\\*/", " ").replaceAll("--[^\n]*", " ")

  /** Warehouse-dialect compatibility shim for query bodies. The
    * reference pushes model text through UNPARSED to PostgreSQL/BigQuery
    * (src/execute.rs), so real projects contain types Spark's parser
    * rejects — the reference's own examples/postgres/models/revenue.sql
    * casts to bare `VARCHAR` (PG's unbounded varchar), which Spark only
    * accepts with an explicit length. Rewrites, outside string literals
    * only: bare VARCHAR (no length) → STRING. Length-parameterized
    * VARCHAR(n) is left alone — Spark accepts it natively.
    */
  def sparkCompat(q: String): String =
    rewriteOutsideLiterals(q)(
      _.replaceAll("(?i)\\bVARCHAR\\b(?!\\s*\\()", "STRING"))

  /** Apply `f` to the spans of `sql` outside single-quoted literals.
    * Splitting on every quote alternates outside/inside spans, and SQL's
    * doubled-quote escape ('') just yields empty inside/outside segments
    * — the alternation stays correct.
    */
  private def rewriteOutsideLiterals(sql: String)(f: String => String): String =
    sql.split("'", -1).zipWithIndex
      .map { case (seg, i) => if (i % 2 == 0) f(seg) else seg }
      .mkString("'")

  private val ViewRe =
    "(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?VIEW\\s+([\\w.]+)\\s+AS\\s+(.*)$".r
  private val MatViewRe =
    "(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?MATERIALIZED\\s+VIEW\\s+([\\w.]+)\\s+AS\\s+(.*)$".r
  private val TableRe =
    "(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?TABLE\\s+([\\w.]+)\\s+AS\\s+(.*)$".r
  private val AssertRe =
    "(?is)^\\s*ASSERT\\s+(.*?)\\s+AS\\s+'((?:[^']|'')*)'\\s*$".r

  /** Classify one statement; reference rejects everything else
    * (src/main.rs:159 `unimplemented!`), we raise a descriptive error.
    */
  def parseModel(stmt: String): ModelStatement = stripComments(stmt).trim match {
    case MatViewRe(name, q) => TableModel(name.toLowerCase, sparkCompat(q.trim))
    case TableRe(name, q)   => TableModel(name.toLowerCase, sparkCompat(q.trim))
    case ViewRe(name, q)    => ViewModel(name.toLowerCase, sparkCompat(q.trim))
    case other => throw new IllegalArgumentException(
      s"Only CREATE [MATERIALIZED] VIEW and CREATE TABLE AS are supported as models, got: ${other.take(80)}")
  }

  def parseAssert(stmt: String): AssertTest = stripComments(stmt).trim match {
    case AssertRe(cond, msg) =>
      AssertTest(sparkCompat(cond.trim), msg.replace("''", "'"))
    case other => throw new IllegalArgumentException(
      s"Only ASSERT … AS 'message' statements are supported in test files, got: ${other.take(80)}")
  }

  def parseModelFile(sql: String): Seq[ModelStatement] = splitStatements(sql).map(parseModel)
  def parseTestFile(sql: String): Seq[AssertTest] = splitStatements(sql).map(parseAssert)

  /** Load all `.sql` files under the project's model dirs (reference walks
    * with walkdir: src/main.rs:331-342).
    */
  def loadDir(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else java.nio.file.Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".sql") && java.nio.file.Files.isRegularFile(f))
      .map(f => new String(java.nio.file.Files.readAllBytes(f)))
      .toSeq
  }
}
