package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module inventories; every key with an
  * `oracleSql` entry is hash-checked against DuckDB on the same parquet.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Demo-equivalent aggregate (examples/demo.rs:26 shape) over events. */
  def entry(spark: SparkSession): DataFrame =
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("value") > 1)
      .agg(round(avg("value"), 2).as("avg_value"), count(lit(1)).as("cnt"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Inventory.queries ++
      graft.queries.CacheQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Inventory.oracle ++
      graft.queries.CacheQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.EventQueries.oracle ++
      graft.queries.StreamQueries.oracle
}
