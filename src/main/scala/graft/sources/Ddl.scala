package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Warehouse DDL parity (load_to_bigquery.py:15-23 creates tables iff
  * absent; :116 drops the staging table after the merge). */
object Ddl {

  /** CREATE TABLE IF NOT EXISTS with an explicit schema (parquet). */
  def ensureTable(spark: SparkSession, name: String, schema: StructType): Unit =
    if (!spark.catalog.tableExists(name))
      spark.sql(s"CREATE TABLE IF NOT EXISTS $name (${schema.toDDL}) USING parquet")

  def dropTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")
}
