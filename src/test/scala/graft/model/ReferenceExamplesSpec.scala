package graft.model

import graft.{GraftCli, SparkSpec}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Golden-parity run of the reference's LITERAL example projects
  * (reference: examples/postgres and examples/bigquery — powersql.toml
  * + models/revenue.sql + tests/data_tests.sql, the acceptance fixtures
  * its ci/postgres.sh container exercises). The files are ingested
  * byte-verbatim — copied, unedited, from the read-only reference tree
  * into a scratch project dir (the `docs` command writes into the
  * project dir, so the tree itself can't be the project root) — and
  * driven through the same check / run / test / docs command sequence
  * the reference's CLI exposes (src/main.rs:29-38, 319-455). This is
  * the "a PowerSQL user points graft at their existing project
  * unchanged" contract, proven on the reference's own project files
  * rather than hand-built mirrors — it would catch dialect drift the
  * mirrors can't (and did: the postgres example's bare `CAST(… AS
  * VARCHAR)` is why ModelParser.sparkCompat exists).
  */
class ReferenceExamplesSpec extends SparkSpec {

  private val RefExamples = "/root/reference/examples"

  /** Byte-verbatim copy of one example project into a temp dir. */
  private def stage(example: String): String = {
    val src = Paths.get(s"$RefExamples/$example")
    assume(Files.isDirectory(src), s"reference examples not present at $src")
    val dst = Files.createTempDirectory(s"graft_ref_${example}_")
    Seq("powersql.toml", "models/revenue.sql", "tests/data_tests.sql")
      .foreach { rel =>
        val from = src.resolve(rel)
        val to = dst.resolve(rel)
        Files.createDirectories(to.getParent)
        Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
        // verbatim means verbatim: the staged bytes ARE the reference's
        assert(java.util.Arrays.equals(Files.readAllBytes(from),
          Files.readAllBytes(to)))
      }
    dst.toString
  }

  private def read(p: String): String = Files.readString(Paths.get(p))

  test("examples/postgres: check, run, test, docs all succeed verbatim") {
    val dir = stage("postgres")
    val wh = s"$dir/wh"
    assert(GraftCli.execute(spark, "check", dir, wh, failFast = false) == 0)
    assert(GraftCli.execute(spark, "run", dir, wh, failFast = false) == 0)
    // both example models are views — run registers them, nothing lands
    // in the warehouse, and the DAG is queryable in-session
    val rpp = spark.sql("SELECT rev, quantity, product_id FROM rev_per_product").collect()
    assert(rpp.length == 1)
    assert(rpp.head.getAs[String]("product_id") == "abc")
    assert(rpp.head.getAs[Long]("quantity") == 1L)
    // all five data tests (referential integrity, sign checks, not-null,
    // the 70%-quantity ratio with its scalar-subquery arithmetic) pass —
    // the reference CI's expected outcome
    assert(GraftCli.execute(spark, "test", dir, wh, failFast = true) == 0)
    assert(GraftCli.execute(spark, "docs", dir, wh, failFast = false) == 0)
    val docs = read(s"$dir/docs/docs.md")
    assert(docs.contains("revenue --> rev_per_product"))
  }

  test("examples/postgres: bare VARCHAR cast type-checks to string") {
    val dir = stage("postgres")
    val models = ModelParser.loadDir(s"$dir/models").flatMap(ModelParser.parseModelFile)
    val engine = new ModelEngine(spark)
    val schemas = engine.check(models)
    // PG's unbounded VARCHAR ≡ Spark string after the compat rewrite
    assert(schemas("revenue")("product_id").dataType ==
      org.apache.spark.sql.types.StringType)
    // the five asserts parse and type to boolean conditions
    val tests = ModelParser.loadDir(s"$dir/tests").flatMap(ModelParser.parseTestFile)
    assert(tests.length == 5)
    engine.checkTests(tests)
  }

  test("examples/bigquery: runs on Spark and renders the reference's BQ jobs") {
    val dir = stage("bigquery")
    val wh = s"$dir/wh"
    assert(GraftCli.execute(spark, "check", dir, wh, failFast = false) == 0)
    assert(GraftCli.execute(spark, "run", dir, wh, failFast = false) == 0)
    // the BQ example materializes rev_per_product as a TABLE
    assert(new java.io.File(s"$wh/rev_per_product").exists())
    val rpp = spark.sql("SELECT product_id, quantity FROM rev_per_product").collect()
    assert(rpp.length == 1 && rpp.head.getAs[String]("product_id") == "my_product")
    assert(GraftCli.execute(spark, "test", dir, wh, failFast = true) == 0)

    // dialect parity: the statements the reference would submit to BQ
    // for exactly these models (execute.rs:207-226 or_replace mutation)
    val models = ModelParser.loadDir(s"$dir/models").flatMap(ModelParser.parseModelFile)
    val bq = BigQueryDialect("proj", "ds")
    val rendered = models.flatMap(bq.refreshStatements)
    assert(rendered.exists(_.startsWith(
      "CREATE OR REPLACE VIEW `proj.ds.revenue` AS ")))
    assert(rendered.exists(_.startsWith(
      "CREATE OR REPLACE TABLE `proj.ds.rev_per_product` AS ")))
    // every data test renders as the query_bool probe (execute.rs:228-238)
    val tests = ModelParser.loadDir(s"$dir/tests").flatMap(ModelParser.parseTestFile)
    assert(tests.length == 3)
    tests.foreach { t =>
      val probe = bq.assertProbe(t)
      assert(probe("useLegacySql") == "false")
      assert(probe("query") == s"SELECT (${t.condition}) AS condition")
    }

    // dry-run contract: no live/emulated BQ exists in this sandbox, so
    // validate each rendered statement structurally — it must match the
    // GoogleSQL DDL subset the reference emits (CREATE OR REPLACE
    // VIEW|TABLE `project.dataset.name` AS <query>) and its query body
    // (shared GoogleSQL/Spark SELECT subset here) must PARSE — a
    // statement that renders unbalanced quotes, a stray semicolon, or a
    // truncated body fails this the way a bq dry_run would
    val DdlRe = "(?s)^CREATE OR REPLACE (VIEW|TABLE) `proj\\.ds\\.[a-z_][a-z0-9_]*` AS (.+)$".r
    val parser = spark.sessionState.sqlParser
    rendered.foreach {
      case DdlRe(_, body) => parser.parsePlan(body) // throws on bad SQL
      case other => fail(s"rendered statement outside the BQ DDL subset: $other")
    }
    tests.foreach(t => parser.parsePlan(bq.assertProbe(t)("query")))
  }

  test("sparkCompat rewrites bare VARCHAR only, never inside literals") {
    assert(ModelParser.sparkCompat("CAST('abc' AS VARCHAR)") == "CAST('abc' AS STRING)")
    assert(ModelParser.sparkCompat("CAST(x AS VARCHAR(10))") == "CAST(x AS VARCHAR(10))")
    assert(ModelParser.sparkCompat("SELECT 'a VARCHAR cast' AS s") == "SELECT 'a VARCHAR cast' AS s")
    assert(ModelParser.sparkCompat("SELECT 'it''s VARCHAR', CAST(y AS varchar)") ==
      "SELECT 'it''s VARCHAR', CAST(y AS STRING)")
  }
}
