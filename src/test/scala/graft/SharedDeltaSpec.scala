package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.scalatest.funsuite.AnyFunSuite

import graft.cache.MemoryQueryCache
import graft.exec.SharedDelta
import graft.log.RecordingLog
import graft.sources.Tables

/** Refresh-cycle shared delta scans: N warm views over one fact table
  * read its append ONCE per cycle. Differential correctness vs vanilla,
  * the in-memory substitution plan pin, the lagging-view bypass, the
  * row-view hookup, and cycle-end unpersist hygiene. */
class SharedDeltaSpec extends AnyFunSuite {
  import TestSparkSession._

  private def eventsFull: DataFrame = Tables.events(spark, sf0001)

  private def split(): (DataFrame, DataFrame, Long) = {
    val ev = eventsFull
    val s = ev.selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
      .first().getLong(0)
    (ev.filter(col("ts") < timestamp_micros(lit(s))),
      ev.filter(col("ts") >= timestamp_micros(lit(s))), s)
  }

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    def k(r: Row) = r.toSeq.map {
      case d: Double => f"$d%.6f"
      case x => String.valueOf(x)
    }.mkString("|")
    val (ra, rb) = (a.collect().sortBy(k), b.collect().sortBy(k))
    assert(ra.map(k).toSeq == rb.map(k).toSeq,
      s"\ngot:  ${ra.toSeq}\nwant: ${rb.toSeq}")
  }

  private def q1(df: DataFrame): DataFrame = df.filter(col("value") > 1)
    .groupBy(date_trunc("hour", col("ts")).as("hour"))
    .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))

  private def q2(df: DataFrame): DataFrame = df
    .groupBy(date_trunc("day", col("ts")).as("day"))
    .agg(max("value").as("max_value"), count(lit(1)).as("cnt"))

  test("two warm aggregates in one cycle share one delta scan, equal vanilla") {
    val (early, late, splitUs) = split()
    val work = tmpDir("shdelta_two")
    early.write.mode("overwrite").parquet(work)
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    val cold = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs), log = log))
    cold.run(q1(spark.read.parquet(work))).collect()
    cold.run(q2(spark.read.parquet(work))).collect()
    late.write.mode("append").parquet(work)
    val warm = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", log = log))
    val (a1, a2) = warm.refreshCycle {
      val r1 = warm.run(q1(spark.read.parquet(work))).collect()
      val r2 = warm.run(q2(spark.read.parquet(work))).collect()
      // the shared delta was persisted AND materialized (the warm runs
      // actually scanned the in-memory copy, not just registered it)
      assert(spark.sparkContext.getRDDStorageInfo
          .exists(_.numCachedPartitions > 0),
        "shared delta never materialized in the block manager")
      (r1, r2)
    }
    assert(log.messages.count(_.contains("shared delta: registered scan")) == 1,
      log.messages.filter(_.contains("shared delta")))
    assert(log.messages.count(
      _.contains("shared delta scan: append read served")) == 2,
      log.messages.filter(_.contains("shared delta")))
    val full = spark.read.parquet(work)
    assertSameRows(spark.createDataFrame(
      java.util.Arrays.asList(a1: _*), q1(full).schema), q1(full))
    assertSameRows(spark.createDataFrame(
      java.util.Arrays.asList(a2: _*), q2(full).schema), q2(full))
  }

  test("a lagging view (older watermark) bypasses the shared scan, stays correct") {
    val (early, late, splitUs) = split()
    val work = tmpDir("shdelta_lag")
    early.write.mode("overwrite").parquet(work)
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    // view A checkpoints at splitUs, view B at an EARLIER watermark.
    // strict mode throughout: a capture `now` below the data's max is
    // only sound when the capture scan is bounded at ts < now (S1)
    QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs),
      strictUpperBound = true,
      log = log)).run(q1(spark.read.parquet(work))).collect()
    QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts",
      overrideNowMicros = Some(splitUs - 3600L * 1000000L),
      strictUpperBound = true,
      log = log)).run(q2(spark.read.parquet(work))).collect()
    late.write.mode("append").parquet(work)
    val warm = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", strictUpperBound = true, log = log))
    val (a1, a2) = warm.refreshCycle {
      (warm.run(q1(spark.read.parquet(work))).collect(),
        warm.run(q2(spark.read.parquet(work))).collect())
    }
    assert(log.messages.exists(_.contains("bypassing shared scan")),
      log.messages.filter(_.contains("shared delta")))
    val full = spark.read.parquet(work)
    assertSameRows(spark.createDataFrame(
      java.util.Arrays.asList(a1: _*), q1(full).schema), q1(full))
    assertSameRows(spark.createDataFrame(
      java.util.Arrays.asList(a2: _*), q2(full).schema), q2(full))
  }

  test("row view and aggregate share one cycle delta") {
    val (early, late, splitUs) = split()
    val work = tmpDir("shdelta_rows")
    early.write.mode("overwrite").parquet(work)
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    def rowQ(df: DataFrame): DataFrame =
      df.filter(col("value") > 3).select(col("event_id"), col("value"))
    val cold = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs), log = log))
    cold.run(q1(spark.read.parquet(work))).collect()
    cold.run(rowQ(spark.read.parquet(work))).collect()
    late.write.mode("append").parquet(work)
    val warm = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", log = log))
    // the row view runs FIRST: its needed column set (event_id, value,
    // ts) covers the aggregate's (ts, value), so both share
    val (a2, a1) = warm.refreshCycle {
      (warm.run(rowQ(spark.read.parquet(work))).collect(),
        warm.run(q1(spark.read.parquet(work))).collect())
    }
    assert(log.messages.count(
      _.contains("shared delta scan: append read served")) == 2,
      log.messages.filter(_.contains("shared delta")))
    val full = spark.read.parquet(work)
    assertSameRows(spark.createDataFrame(
      java.util.Arrays.asList(a1: _*), q1(full).schema), q1(full))
    assertSameRows(spark.createDataFrame(
      java.util.Arrays.asList(a2: _*), rowQ(full).schema), rowQ(full))
  }

  test("a view needing a column outside the registered delta bypasses, stays correct") {
    val (early, late, splitUs) = split()
    val work = tmpDir("shdelta_cols")
    early.write.mode("overwrite").parquet(work)
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    def qType(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val cold = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs), log = log))
    cold.run(q1(spark.read.parquet(work))).collect()
    cold.run(qType(spark.read.parquet(work))).collect()
    late.write.mode("append").parquet(work)
    val warm = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", log = log))
    val (a1, a2) = warm.refreshCycle {
      // q1 registers {ts, value}; qType needs event_type — not there
      (warm.run(q1(spark.read.parquet(work))).collect(),
        warm.run(qType(spark.read.parquet(work))).collect())
    }
    assert(log.messages.exists(_.contains("lacks a needed column")),
      log.messages.filter(_.contains("shared delta")))
    val full = spark.read.parquet(work)
    assertSameRows(spark.createDataFrame(
      java.util.Arrays.asList(a1: _*), q1(full).schema), q1(full))
    assertSameRows(spark.createDataFrame(
      java.util.Arrays.asList(a2: _*), qType(full).schema), qType(full))
  }

  test("sharing reduces fact-table file bytes read across a 3-view refresh") {
    def fileBytesRead(): Long = {
      val s = org.apache.hadoop.fs.GlobalStorageStatistics.INSTANCE.get("file")
      if (s == null) 0L else s.getLong("bytesRead").longValue()
    }
    val (early, late, splitUs) = split()
    val work = tmpDir("shdelta_bytes")
    early.write.mode("overwrite").parquet(work)
    def q3(df: DataFrame): DataFrame = df.filter(col("value") > 2)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(min("value").as("min_value"))
    val views: Seq[DataFrame => DataFrame] = Seq(q1, q2, q3)
    def coldBuild(): MemoryQueryCache = {
      val c = new MemoryQueryCache()
      val s = QueryCacheSession(spark, QueryCacheConfig(c,
        defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs)))
      views.foreach(v => s.run(v(spark.read.parquet(work))).collect())
      c
    }
    val (cacheA, cacheB) = (coldBuild(), coldBuild())
    late.write.mode("append").parquet(work)
    // leg A: three private delta scans; leg B: one shared scan. All
    // three views consume only (ts, value), so the registered width
    // equals the private scans' pruned width — the byte delta is purely
    // the two avoided re-reads.
    val warmA = QueryCacheSession(spark, QueryCacheConfig(cacheA,
      defaultTemporalColumn = "ts"))
    val b0 = fileBytesRead()
    views.foreach(v => warmA.run(v(spark.read.parquet(work))).collect())
    val unshared = fileBytesRead() - b0
    val warmB = QueryCacheSession(spark, QueryCacheConfig(cacheB,
      defaultTemporalColumn = "ts"))
    val b1 = fileBytesRead()
    warmB.refreshCycle {
      views.foreach(v => warmB.run(v(spark.read.parquet(work))).collect())
    }
    val shared = fileBytesRead() - b1
    assert(shared < unshared,
      s"shared refresh read $shared file bytes, unshared read $unshared")
  }

  test("cycle end unpersists the shared deltas") {
    val (early, late, splitUs) = split()
    val work = tmpDir("shdelta_unp")
    early.write.mode("overwrite").parquet(work)
    val cache = new MemoryQueryCache()
    val cold = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs)))
    cold.run(q1(spark.read.parquet(work))).collect()
    late.write.mode("append").parquet(work)
    val warm = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts"))
    val before = spark.sparkContext.getPersistentRDDs.size
    warm.refreshCycle {
      warm.run(q1(spark.read.parquet(work))).collect()
      assert(spark.sparkContext.getPersistentRDDs.size > before,
        "shared delta was not persisted inside the cycle")
    }
    // unpersist is async (blocking=false): poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (spark.sparkContext.getPersistentRDDs.size > before &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "shared delta still persisted after the cycle")
  }

  test("outside a cycle nothing is shared or registered") {
    val (early, late, splitUs) = split()
    val work = tmpDir("shdelta_off")
    early.write.mode("overwrite").parquet(work)
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    val cold = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs), log = log))
    cold.run(q1(spark.read.parquet(work))).collect()
    late.write.mode("append").parquet(work)
    val warm = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", log = log))
    assertSameRows(warm.run(q1(spark.read.parquet(work))),
      q1(spark.read.parquet(work)))
    assert(!log.messages.exists(_.contains("shared delta")), log.messages)
  }
}
