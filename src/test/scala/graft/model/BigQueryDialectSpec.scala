package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BigQuery backend's rendered SQL surface against the
  * reference's `BigqueryRunner` (src/execute.rs:133-238) — the
  * no-network half of backend parity, mirroring WarehouseDialectSpec's
  * PG text pins.
  */
class BigQueryDialectSpec extends AnyFunSuite {

  private val bq = BigQueryDialect("my-proj", "analytics")

  test("refresh renders CREATE OR REPLACE — never drop-then-recreate") {
    // execute.rs:207-226: the statement is mutated to or_replace=true;
    // the PG drop pair does not exist on this backend
    assert(bq.dropStatements("daily_revenue").isEmpty)
    assert(bq.refreshStatements(
      TableModel("daily_revenue", "SELECT 1 AS x")) ==
      Seq("CREATE OR REPLACE TABLE `my-proj.analytics.daily_revenue` AS SELECT 1 AS x"))
    assert(bq.refreshStatements(
      ViewModel("rev_view", "SELECT x FROM daily_revenue")) ==
      Seq("CREATE OR REPLACE VIEW `my-proj.analytics.rev_view` AS SELECT x FROM daily_revenue"))
  }

  test("one statement per model: BQ DDL is per-job, not transactional") {
    for (m <- Seq(TableModel("t", "SELECT 1"), ViewModel("v", "SELECT 2")))
      assert(bq.refreshStatements(m).size == 1)
  }

  test("identifiers: backtick quoting, dataset qualification") {
    assert(bq.quoteIdentifier("Daily`Revenue") == "`Daily\\`Revenue`")
    assert(bq.qualified("m1") == "`my-proj.analytics.m1`")
  }

  test("job request carries build_query's exact fields") {
    // execute.rs:144-155: standard SQL + default dataset (+ location)
    assert(bq.queryRequest("SELECT 1") == Map(
      "query" -> "SELECT 1",
      "useLegacySql" -> "false",
      "defaultDataset.projectId" -> "my-proj",
      "defaultDataset.datasetId" -> "analytics"))
    val eu = BigQueryDialect("my-proj", "analytics", Some("EU"))
    assert(eu.queryRequest("SELECT 1")("location") == "EU")
    assert(bq.toString == "BigQueryDialect(my-proj.analytics)")
  }

  test("ASSERT tests render as query_bool's bool probe") {
    // main.rs:430-454 probe shape, run via execute.rs:228-238
    val probe = bq.assertProbe(AssertTest(
      "(SELECT COUNT(*) FROM daily_revenue WHERE x < 0) = 0",
      "no negative revenue"))
    assert(probe("query") ==
      "SELECT ((SELECT COUNT(*) FROM daily_revenue WHERE x < 0) = 0) AS condition")
    assert(probe("useLegacySql") == "false")
  }

  test("parsed model files round-trip through the BQ renderer") {
    // the same .sql files the engine runs on Spark render for BQ —
    // backend choice is a rendering decision, not a parse decision
    val models = ModelParser.parseModelFile(
      """CREATE TABLE base_orders AS SELECT * FROM orders;
        |CREATE VIEW big_orders AS
        |  SELECT * FROM base_orders WHERE o_totalprice > 100""".stripMargin)
    val ddl = models.flatMap(bq.refreshStatements)
    assert(ddl == Seq(
      "CREATE OR REPLACE TABLE `my-proj.analytics.base_orders` AS SELECT * FROM orders",
      "CREATE OR REPLACE VIEW `my-proj.analytics.big_orders` AS SELECT * FROM base_orders WHERE o_totalprice > 100"))
  }
}
