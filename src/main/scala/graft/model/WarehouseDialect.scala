package graft.model

import java.sql.Connection

/** Warehouse-specific DDL semantics behind [[TableSink.jdbc]]: how a
  * table model's refresh removes the previous object before recreating
  * it. The reference's PostgreSQL executor does, per model (reference:
  * src/execute.rs:77-111):
  *
  *   DROP VIEW IF EXISTS "name" CASCADE;   -- errors ignored
  *   DROP TABLE IF EXISTS "name" CASCADE;  -- errors ignored
  *   <the model's own CREATE ...>          -- in a transaction
  *
  * i.e. quoted identifiers, and DEPENDENT VIEWS ARE DROPPED (CASCADE) —
  * a warehouse where analysts hand-built views on top of a model keeps
  * refreshing instead of failing on the dependency. Spark's own
  * `DataFrameWriter.jdbc(SaveMode.Overwrite)` issues a bare
  * `DROP TABLE`, which PG refuses when a view depends on the table, so
  * the reference's refresh semantics need this explicit seam.
  *
  * Dialects render the drop DDL ([[dropStatements]], SQL-text testable
  * without a live server) and execute it ([[dropCascade]], tolerating
  * missing-object errors like the reference's `let _ =`). Engines
  * without CASCADE (embedded Derby, the spec harness) emulate it by
  * parsing the dependent-object error and recursing.
  */
trait WarehouseDialect {

  /** `name` → a quoted identifier (embedded quotes doubled) — the
    * reference always quotes, so mixed-case model names round-trip.
    */
  def quoteIdentifier(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** The drop DDL this dialect issues for a model refresh, in order. */
  def dropStatements(name: String): Seq[String]

  /** Remove any prior object named `name`, dependent views included;
    * missing objects are not an error (reference parity).
    */
  def dropCascade(conn: Connection, name: String): Unit
}

object WarehouseDialect {

  /** PostgreSQL — reference execute.rs:77-92 verbatim: view drop, table
    * drop, both IF EXISTS + CASCADE, all failures tolerated.
    */
  object Postgres extends WarehouseDialect {
    override def dropStatements(name: String): Seq[String] = {
      val q = quoteIdentifier(name)
      Seq(s"DROP VIEW IF EXISTS $q CASCADE", s"DROP TABLE IF EXISTS $q CASCADE")
    }
    override def dropCascade(conn: Connection, name: String): Unit =
      dropStatements(name).foreach { sql =>
        val st = conn.createStatement()
        try st.execute(sql)
        catch { case _: java.sql.SQLException => () } // reference ignores
        finally st.close()
      }
    override def toString: String = "WarehouseDialect.Postgres"
  }

  /** Derby (the embedded spec harness): no IF EXISTS, no CASCADE —
    * equivalent semantics are emulated: a failed drop naming a
    * dependent view ("... because VIEW 'X' is dependent on that
    * object") drops that view first and retries; drops of objects that
    * don't exist are tolerated. Proves the CASCADE refresh CONTRACT
    * (view-on-table DAG re-runs cleanly after an upstream change) on an
    * engine the sandbox can actually start.
    */
  object Derby extends WarehouseDialect {
    override def dropStatements(name: String): Seq[String] =
      Seq(s"DROP VIEW ${quoteIdentifier(name)}",
        s"DROP TABLE ${quoteIdentifier(name)}")

    private val DependentView =
      """VIEW '"?([^']+?)"?' is dependent""".r.unanchored

    override def dropCascade(conn: Connection, name: String): Unit =
      drop(conn, name, depth = 0)

    private def drop(conn: Connection, name: String, depth: Int): Unit = {
      require(depth < 64, s"view dependency chain too deep at $name")
      for (sql <- dropStatements(name)) {
        var retry = true
        // retries bounded per STATEMENT, not just recursion depth: if a
        // dependent view's drop keeps failing for a non-dependency reason
        // (lock, permission) the same statement would otherwise respin
        // forever on the same dependent-view message
        var retriesLeft = 64
        while (retry && retriesLeft > 0) {
          retry = false
          retriesLeft -= 1
          val st = conn.createStatement()
          try st.execute(sql)
          catch {
            case e: java.sql.SQLException =>
              e.getMessage match {
                case DependentView(dep) =>
                  drop(conn, dep, depth + 1) // CASCADE emulation
                  retry = true
                case _ => () // missing object etc: IF EXISTS emulation
              }
          } finally st.close()
        }
      }
    }
    override def toString: String = "WarehouseDialect.Derby"
  }
}
