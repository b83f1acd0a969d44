package graft.model

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The reference's warehouse refresh contract (reference:
  * src/execute.rs:77-111): every model run drops the previous object —
  * dependent views INCLUDED — then recreates, with quoted identifiers.
  * PG semantics are pinned as SQL text (no live PostgreSQL in the
  * sandbox; ci/postgres.sh is the reference recipe) and the CASCADE
  * refresh CONTRACT is proven live on embedded Derby, where the dialect
  * emulates CASCADE by parsing the dependent-view error and recursing.
  */
class WarehouseDialectSpec extends SparkSpec {

  test("Postgres dialect: reference drop semantics as exact SQL text") {
    // reference execute.rs:81 and :89, verbatim shape
    assert(WarehouseDialect.Postgres.dropStatements("my_model") == Seq(
      """DROP VIEW IF EXISTS "my_model" CASCADE""",
      """DROP TABLE IF EXISTS "my_model" CASCADE"""))
    // quoting: mixed case preserved, embedded quote doubled
    assert(WarehouseDialect.Postgres.quoteIdentifier("Daily\"Revenue") ==
      "\"Daily\"\"Revenue\"")
  }

  test("Postgres dialect: Spark maps decimals/timestamps to PG column types") {
    // the CREATE TABLE that lands a model uses Spark's per-database
    // JdbcDialect; pin the mappings a PG warehouse round-trip depends on
    import org.apache.spark.sql.types._
    val pg = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:postgresql://host/db")
    def ddl(t: DataType): String =
      pg.getJDBCType(t).map(_.databaseTypeDefinition).getOrElse(
        org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
          .getCommonJDBCType(t).get.databaseTypeDefinition)
    assert(ddl(DecimalType(18, 4)) == "NUMERIC(18,4)")
    assert(ddl(StringType) == "TEXT")
    assert(ddl(DoubleType) == "FLOAT8")
    // Spark's TimestampType is TZ-aware (instant semantics) → timestamptz;
    // the session-local NTZ variant is what maps to plain TIMESTAMP
    assert(ddl(TimestampType) == "TIMESTAMP WITH TIME ZONE")
    assert(ddl(TimestampNTZType) == "TIMESTAMP")
  }

  test("Derby: view-on-table DAG re-runs cleanly after an upstream type change") {
    Tables(spark, sfDir).registerAll()
    val url = "jdbc:derby:memory:graft_dialect_test;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val sink = TableSink.jdbc(url, props, WarehouseDialect.Derby)
    val engine = new ModelEngine(spark)

    // run 1: a table model lands in the warehouse
    engine.run(ModelParser.parseModelFile(
      """CREATE TABLE dlt_orders AS
        |  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        |  FROM orders WHERE o_totalprice > 400000""".stripMargin), sink)
    val n1 = spark.table("dlt_orders").count()
    assert(n1 > 0)

    // an analyst hand-builds a view ON TOP of the model in the warehouse
    // (exactly what makes PG's bare DROP TABLE refuse on the next run)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      conn.createStatement().execute(
        """CREATE VIEW "dlt_big" AS SELECT "o_orderkey" FROM "dlt_orders"""")
      // Spark's own Overwrite (bare DROP TABLE) fails on the dependency —
      // the gap the dialect seam exists to close
      intercept[Throwable] {
        Tables(spark, sfDir).orders.limit(1)
          .select(col("o_orderkey")).write.mode("overwrite")
          .jdbc(url, "\"dlt_orders\"", props)
      }
    } finally conn.close()

    // run 2: upstream TYPE CHANGE (price becomes a string label) — the
    // dialected sink drops the dependent view, then the table, recreates
    engine.run(ModelParser.parseModelFile(
      """CREATE TABLE dlt_orders AS
        |  SELECT o_orderkey, CAST(o_orderpriority AS STRING) AS price
        |  FROM orders WHERE o_totalprice > 400000""".stripMargin), sink)
    val back = spark.read.jdbc(url, "\"dlt_orders\"", props)
    assert(back.count() == n1)
    assert(back.schema("price").dataType == org.apache.spark.sql.types.StringType,
      "recreated table must carry the new column type")

    // the dependent view is gone (CASCADE semantics), not left dangling
    val conn2 = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn2.getMetaData.getTables(null, null, "dlt_big", null)
      assert(!rs.next(), "dependent view must have been cascade-dropped")
    } finally conn2.close()
  }
}
