package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Inventory

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's shipped config query shape
    * (`config/data_lake_config.json:4`): projection + BETWEEN range
    * predicate, here over lineitem.l_shipdate (pushed to the parquet scan).
    */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date"),
        col("l_quantity"), col("l_extendedprice"))
      .filter(col("ship_date").between("1996-01-01", "1996-12-31"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Inventory.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (probabilistic/engine-internal) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Inventory.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
