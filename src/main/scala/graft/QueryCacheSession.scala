package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.exec.IncrementalAggExecutor

/** User-facing facade (reference: with_query_cache on a
  * SessionStateBuilder, src/lib.rs:74-87, examples/demo.rs:68-84).
  *
  * {{{
  * val qcs = QueryCacheSession(spark,
  *   QueryCacheConfig(new MemoryQueryCache(), defaultTemporalColumn = "ts"))
  * val out = qcs.sql("SELECT avg(value), count(*) FROM events WHERE value > 1")
  * }}}
  *
  * Every query runs through the caching decision procedure; queries that
  * don't qualify execute vanilla (the decision is in `config.log`).
  */
final class QueryCacheSession(val spark: SparkSession, val config: QueryCacheConfig) {
  private val executor = new IncrementalAggExecutor(config)

  def sql(sqlText: String): DataFrame = run(spark.sql(sqlText))

  def run(df: DataFrame): DataFrame = executor.run(df)

  /** Run `f` as ONE refresh cycle: all warm runs inside it share a single
    * persisted delta scan per fact table (see [[graft.exec.SharedDelta]]).
    * Use around a dashboard batch — N views over one fact table read its
    * append once instead of N times, and all see the same snapshot. */
  def refreshCycle[A](f: => A): A = graft.exec.SharedDelta.withCycle(f)

  /** Operational view of the cache: one row per live entry (fingerprint,
    * watermark, sources, pending repairs, size, chain length — see
    * [[graft.cache.QueryCache.describe]]). Pair with `config.cache.stats`
    * for the hit/miss/bail counters. */
  def describeCache(): DataFrame = config.cache.describe(spark)
}

object QueryCacheSession {
  def apply(spark: SparkSession, config: QueryCacheConfig): QueryCacheSession =
    new QueryCacheSession(spark, config)
}
