package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialization target for `CREATE TABLE` models: write the model's
  * result, then hand back a frame READING the materialized copy (so
  * downstream models consume the stored table, not the live plan —
  * lineage is cut at every materialization boundary).
  *
  * The reference's whole purpose is landing models in an external
  * warehouse (reference: src/execute.rs:52-76 PostgreSQL, :175-180
  * BigQuery); `TableSink.jdbc` is that surface on Spark's public
  * `DataFrameWriter.jdbc`, while `TableSink.parquet` is the lakehouse
  * default.
  */
trait TableSink {
  def materialize(spark: SparkSession, name: String, df: DataFrame): DataFrame
}

object TableSink {

  /** Parquet warehouse: one directory per table model. */
  def parquet(warehouse: String): TableSink = new TableSink {
    override def materialize(spark: SparkSession, name: String, df: DataFrame): DataFrame = {
      val path = s"$warehouse/$name"
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    override def toString: String = s"TableSink.parquet($warehouse)"
  }

  /** JDBC warehouse: each table model becomes a database table
    * (overwritten per run, the reference's refresh semantics —
    * src/execute.rs:56-60 drops and recreates). Works against anything
    * with a JDBC driver on the classpath; specs exercise it with
    * embedded Derby.
    */
  def jdbc(url: String, properties: java.util.Properties = new java.util.Properties()): TableSink =
    new TableSink {
      override def materialize(spark: SparkSession, name: String, df: DataFrame): DataFrame = {
        df.write.mode("overwrite").jdbc(url, name, properties)
        spark.read.jdbc(url, name, properties)
      }
      override def toString: String = s"TableSink.jdbc($url)"
    }
}
