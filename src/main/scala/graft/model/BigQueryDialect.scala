package graft.model

import java.sql.Connection

/** BigQuery rendering of the reference's second backend (reference:
  * src/execute.rs:133-238, `BigqueryRunner`). A live connection needs
  * network + service-account credentials this sandbox lacks, but the
  * backend's OBSERVABLE SQL surface is all rendering, and that is
  * pinned here exactly:
  *
  *   - **No drop-then-recreate.** Where the PG executor drops view/table
  *     CASCADE first (execute.rs:77-92), the BQ executor instead MUTATES
  *     the model's statement to `or_replace = true`
  *     (execute.rs:207-226) — refresh is one atomic
  *     `CREATE OR REPLACE TABLE|VIEW`, so [[dropStatements]] is empty
  *     and [[dropCascade]] a no-op by design, not omission.
  *   - **Dataset-qualified names.** Every job runs with
  *     `default_dataset = (project_id, dataset_id)` and
  *     `use_legacy_sql = false` (execute.rs:144-155, `build_query`);
  *     rendered here as the fully-qualified backtick identifier and the
  *     job-request field map.
  *   - **Per-statement execution.** BQ DDL is not transactional — each
  *     statement is its own job (execute.rs:157-170, `run_query`), and a
  *     failure surfaces per model, not per batch; [[refreshStatements]]
  *     therefore returns exactly ONE statement per model.
  *   - **ASSERT probes** run as plain bool-returning queries
  *     (`query_bool`, execute.rs:228-238) over the same default dataset.
  */
final case class BigQueryDialect(projectId: String, datasetId: String,
    location: Option[String] = None) extends WarehouseDialect {

  /** BigQuery standard SQL quoting: backticks, embedded backticks
    * escaped with a backslash (PG's doubled-quote rule does not apply).
    */
  override def quoteIdentifier(name: String): String =
    "`" + name.replace("`", "\\`") + "`"

  /** `project.dataset.name` under one pair of backticks — the form the
    * default-dataset job config resolves unqualified names to, rendered
    * explicitly so the DDL is self-contained.
    */
  def qualified(name: String): String =
    quoteIdentifier(s"$projectId.$datasetId.$name")

  /** The reference's BQ path never drops (OR REPLACE supersedes). */
  override def dropStatements(name: String): Seq[String] = Seq.empty
  override def dropCascade(conn: Connection, name: String): Unit = ()

  /** The single refresh statement for a model — the rendered form of
    * execute.rs:207-226's `or_replace = true` mutation. ViewModel stays
    * a view; TableModel (our materialization for both `CREATE TABLE AS`
    * and `CREATE MATERIALIZED VIEW` models) lands as a table.
    */
  def refreshStatements(model: ModelStatement): Seq[String] = model match {
    case ViewModel(name, query) =>
      Seq(s"CREATE OR REPLACE VIEW ${qualified(name)} AS $query")
    case TableModel(name, query) =>
      Seq(s"CREATE OR REPLACE TABLE ${qualified(name)} AS $query")
  }

  /** The job-request fields `build_query` sets on every statement
    * (execute.rs:144-155): standard SQL, default dataset, optional
    * location. Rendered as a field map so specs can pin the contract
    * without a client library.
    */
  def queryRequest(sql: String): Map[String, String] =
    Map(
      "query" -> sql,
      "useLegacySql" -> "false",
      "defaultDataset.projectId" -> projectId,
      "defaultDataset.datasetId" -> datasetId) ++
      location.map("location" -> _)

  /** An ASSERT data test as the bool probe `query_bool` runs
    * (execute.rs:228-238; probe shape from main.rs:430-454).
    */
  def assertProbe(test: AssertTest): Map[String, String] =
    queryRequest(s"SELECT (${test.condition}) AS condition")

  override def toString: String =
    s"BigQueryDialect($projectId.$datasetId${location.fold("")("," + _)})"
}
