package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cache.{MemoryQueryCache, ParquetQueryCache}
import graft.log.RecordingLog
import graft.sources.Tables

/** REPAIR RANGES (`cache.repairRange`) — a declared historical rewrite
  * (backfill / correction / INSERT OVERWRITE of a partition) repaired at
  * bucket grain (aggregate state) or row grain (materialized views)
  * instead of invalidateForTable's whole-entry drop + full re-scan.
  *
  * The scaffold mirrors CacheQueries.corruptRepairWarm: the working
  * copy's day-D slice is first written CORRUPTED (a third of the rows
  * missing, values skewed), the query caches over it, the slice is then
  * REPLACED with the true rows, and a repair range is declared — warm
  * answers must equal the query over the PRISTINE table, which they can
  * only do if the stale buckets/rows were actually replaced. */
class RepairSpec extends AnyFunSuite {
  import TestSparkSession._

  private def eventsFull: DataFrame = Tables.events(spark, sf0001)
  private val dayUs = 86400000000L

  /** (work, splitUs, dayStartUs, dayEndUs, rewrite()): history written as
    * base (range-partitioned by ts so parquet stats can prune the repair
    * window) + a corrupted day-D dir; `rewrite()` replaces day-D with the
    * true rows and appends the tail — the INSERT OVERWRITE moment. */
  private def corruptScaffold(tag: String)
      : (String, Long, Long, Long, () => Unit) = {
    val ev = eventsFull
    val splitUs = ev
      .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
      .first().getLong(0)
    val p30 = ev
      .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.3) AS LONG)")
      .first().getLong(0)
    val dayStart = p30 - java.lang.Math.floorMod(p30, dayUs)
    val dayEnd = dayStart + dayUs
    val work = tmpDir(tag)
    val splitTs = timestamp_micros(lit(splitUs))
    val inDay = col("ts") >= timestamp_micros(lit(dayStart)) &&
      col("ts") < timestamp_micros(lit(dayEnd))
    ev.filter(col("ts") < splitTs && !inDay)
      .repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
      .write.parquet(s"$work/base")
    ev.filter(col("ts") < splitTs && inDay && col("event_id") % 3 =!= 0)
      .withColumn("value", col("value") * 2 + 1)
      .write.parquet(s"$work/day")
    (work, splitUs, dayStart, dayEnd, () => {
      val fs = new Path(work)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(s"$work/day"), true)
      ev.filter(col("ts") < splitTs && inDay).write.parquet(s"$work/day")
      ev.filter(col("ts") >= splitTs).write.parquet(s"$work/rest")
    })
  }

  private def readWork(work: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(work)

  private def cfg(cache: graft.cache.QueryCache, log: RecordingLog,
      now: Option[Long] = None): QueryCacheConfig =
    QueryCacheConfig(cache, defaultTemporalColumn = "ts",
      overrideNowMicros = now, log = log)

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val (ra, rb) = (a.collect(), b.collect())
    assert(ra.length == rb.length, s"row counts: ${ra.length} vs ${rb.length}")
    def k(r: Row) = r.toSeq.map {
      case d: Double => f"$d%.6f"
      case x => String.valueOf(x)
    }.mkString("|")
    val (sa, sb) = (ra.sortBy(k), rb.sortBy(k))
    sa.zip(sb).foreach { case (x, y) =>
      x.toSeq.zip(y.toSeq).foreach {
        case (u: Double, v: Double) =>
          assert(math.abs(u - v) <= 1e-9 * math.max(1.0, math.abs(v)),
            s"$u != $v in rows $x vs $y")
        case (u, v) => assert(String.valueOf(u) == String.valueOf(v),
          s"$u != $v in rows $x vs $y")
      }
    }
  }

  private def withRecordsRead[T](f: => T): (T, Long) = {
    val recs = new java.util.concurrent.atomic.LongAdder
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recs.add(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val out =
      try { val v = f; Thread.sleep(1000); v }
      finally spark.sparkContext.removeSparkListener(listener)
    (out, recs.sum())
  }

  test("bucket-grain repair: warm equals vanilla over the rewritten " +
      "table, scan bounded to the window + append") {
    def q(df: DataFrame) = df.filter(col("value") > 1)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
        min("value").as("min_value"), max("value").as("max_value"))
    val (work, splitUs, dayStart, dayEnd, rewrite) = corruptScaffold("rday")
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log, Some(splitUs)))
      .run(q(readWork(work))).collect()
    rewrite()
    assert(cache.repairRange(work, dayStart, dayEnd) == 1)
    val ev = eventsFull
    val windowRows = ev.filter(
      col("ts") >= timestamp_micros(lit(dayStart)) &&
        col("ts") < timestamp_micros(lit(dayEnd))).count()
    val lateRows =
      ev.filter(col("ts") >= timestamp_micros(lit(splitUs))).count()
    val baseRows = ev.filter(col("ts") < timestamp_micros(lit(splitUs)))
      .count() - ev.filter(col("ts") < timestamp_micros(lit(splitUs)) &&
        col("ts") >= timestamp_micros(lit(dayStart)) &&
        col("ts") < timestamp_micros(lit(dayEnd))).count()
    val (warm, recs) = withRecordsRead {
      val df = QueryCacheSession(spark, cfg(cache, log))
        .run(q(readWork(work)))
      df.collect()
      df
    }
    assert(log.messages.exists(
      _.contains("repairing 1 declared rewrite range(s) at bucket grain")),
      log.messages)
    assert(log.messages.count(_.startsWith("cache hit")) == 1, log.messages)
    // the repaired warm run reads the rewritten window + the append; the
    // 8-way range-partitioned base can contribute at most a couple of
    // straddling files' row groups, never the whole history
    assert(recs <= windowRows + lateRows + baseRows / 2,
      s"repair run scanned $recs rows (window=$windowRows late=$lateRows " +
        s"base=$baseRows) — history was rescanned")
    assertSameRows(warm, q(ev))
    // consumed: a second warm run must hit WITHOUT repairing again
    val log2 = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log2)).run(q(readWork(work)))
      .collect()
    assert(!log2.messages.exists(_.contains("repairing")), log2.messages)
    assert(log2.messages.count(_.startsWith("cache hit")) == 1, log2.messages)
  }

  test("tumbling-window bucket repair: warm equals vanilla") {
    def q(df: DataFrame) = df.filter(col("value") > 1)
      .groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
    val (work, splitUs, dayStart, dayEnd, rewrite) = corruptScaffold("rwin")
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log, Some(splitUs)))
      .run(q(readWork(work))).collect()
    rewrite()
    assert(cache.repairRange(work, dayStart, dayEnd) == 1)
    val warm = QueryCacheSession(spark, cfg(cache, log))
      .run(q(readWork(work)))
    assert(log.messages.exists(
      _.contains("repairing 1 declared rewrite range(s) at bucket grain")),
      log.messages)
    assertSameRows(warm, q(eventsFull))
  }

  test("overlapping declarations coalesce into one repair span") {
    def q(df: DataFrame) = df.filter(col("value") > 1)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val (work, splitUs, dayStart, dayEnd, rewrite) = corruptScaffold("rmerge")
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log, Some(splitUs)))
      .run(q(readWork(work))).collect()
    rewrite()
    // two overlapping declarations (an operator repairing twice) — the
    // run must coalesce them: one span, no double re-read
    assert(cache.repairRange(work, dayStart, dayStart + dayUs / 2) == 1)
    assert(cache.repairRange(work, dayStart + dayUs / 4, dayEnd) == 1)
    val warm = QueryCacheSession(spark, cfg(cache, log))
      .run(q(readWork(work)))
    assert(log.messages.exists(
      _.contains("repairing 1 declared rewrite range(s) at bucket grain")),
      log.messages)
    assertSameRows(warm, q(eventsFull))
  }

  test("grouping-set repair: full-grain buckets dropped + re-expanded, " +
      "warm equals vanilla, scan bounded to the window + append") {
    def q(df: DataFrame) = df.filter(col("value") > 1)
      .rollup(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
        max("value").as("max_value"))
    val (work, splitUs, dayStart, dayEnd, rewrite) = corruptScaffold("rgset")
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log, Some(splitUs)))
      .run(q(readWork(work))).collect()
    rewrite()
    assert(cache.repairRange(work, dayStart, dayEnd) == 1)
    val ev = eventsFull
    val windowRows = ev.filter(
      col("ts") >= timestamp_micros(lit(dayStart)) &&
        col("ts") < timestamp_micros(lit(dayEnd))).count()
    val lateRows =
      ev.filter(col("ts") >= timestamp_micros(lit(splitUs))).count()
    val baseRows = ev.filter(col("ts") < timestamp_micros(lit(splitUs)))
      .count() - windowRows
    val (warm, recs) = withRecordsRead {
      val df = QueryCacheSession(spark, cfg(cache, log))
        .run(q(readWork(work)))
      df.collect()
      df
    }
    // the grouping-set path engaged (not a silent loud rebuild — the
    // oracle alone passes on vanilla by design)
    assert(log.messages.exists(
      _.contains("through the grouping-set full grain")), log.messages)
    assert(log.messages.count(_.startsWith("cache hit")) == 1, log.messages)
    // scan bound: window + append + at most straddling row groups of the
    // range-partitioned base — never the whole history re-expanded.
    // (Expand triples raw rows ABOVE the scan; recordsRead counts the
    // scan, so the bound needs no ×3.)
    assert(recs <= windowRows + lateRows + baseRows / 2,
      s"grouping-set repair scanned $recs rows (window=$windowRows " +
        s"late=$lateRows base=$baseRows) — history was rescanned")
    assertSameRows(warm, q(ev))
    // consumed: a second warm run hits without repairing
    val log2 = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log2)).run(q(readWork(work)))
      .collect()
    assert(!log2.messages.exists(_.contains("repairing")), log2.messages)
    assert(log2.messages.count(_.startsWith("cache hit")) == 1, log2.messages)
  }

  test("session-window repair: state-derived cut window dropped + " +
      "re-scanned, warm equals vanilla, scan bounded") {
    def q(df: DataFrame) = df.filter(col("value") > 1)
      .groupBy(session_window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
        max("value").as("max_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("event_type"), col("cnt"), col("sum_value"), col("max_value"))
    val (work, splitUs, dayStart, dayEnd, rewrite) = corruptScaffold("rsess")
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log, Some(splitUs)))
      .run(q(readWork(work))).collect()
    rewrite()
    assert(cache.repairRange(work, dayStart, dayEnd) == 1)
    val ev = eventsFull
    // the cut window [Q, C) hugs the day: Q is the last session break
    // before it, C the first break after dayEnd + gap — both inside a
    // day's slack on this corpus (30-min gaps at ~dozens of events/day/
    // type break constantly)
    val windowRows = ev.filter(
      col("ts") >= timestamp_micros(lit(dayStart - dayUs)) &&
        col("ts") < timestamp_micros(lit(dayEnd + dayUs))).count()
    val lateRows =
      ev.filter(col("ts") >= timestamp_micros(lit(splitUs))).count()
    val baseRows = ev.filter(col("ts") < timestamp_micros(lit(splitUs)))
      .count()
    val (warm, recs) = withRecordsRead {
      val df = QueryCacheSession(spark, cfg(cache, log))
        .run(q(readWork(work)))
      df.collect()
      df
    }
    assert(log.messages.exists(_.contains("at session grain")), log.messages)
    assert(log.messages.count(_.startsWith("cache hit")) == 1, log.messages)
    assert(recs <= windowRows + lateRows + baseRows / 2,
      s"session repair scanned $recs rows (window=$windowRows " +
        s"late=$lateRows base=$baseRows) — history was rescanned")
    assertSameRows(warm, q(ev))
    // consumed: a second warm run hits without repairing
    val log2 = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log2)).run(q(readWork(work)))
      .collect()
    assert(!log2.messages.exists(_.contains("repairing")), log2.messages)
    assert(log2.messages.count(_.startsWith("cache hit")) == 1, log2.messages)
  }

  test("temporal twin: keys-only grouped repair at bucket grain via the " +
      "(day × keys) twin, scan bounded, warm equals vanilla") {
    def q(df: DataFrame) = df.filter(col("value") > 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
        min("value").as("min_value"), max("value").as("max_value"))
    val (work, splitUs, dayStart, dayEnd, rewrite) = corruptScaffold("rtwin2")
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    def tcfg(now: Option[Long] = None) =
      cfg(cache, log, now).withTemporalTwin("day")
    QueryCacheSession(spark, tcfg(Some(splitUs)))
      .run(q(readWork(work))).collect()
    assert(log.messages.exists(_.contains("temporal twin: answered via")),
      log.messages)
    rewrite()
    // the twin's entry carries the work-table source paths, so the
    // declared rewrite marks it like any directly-cached query
    assert(cache.repairRange(work, dayStart, dayEnd) == 1)
    val ev = eventsFull
    val windowRows = ev.filter(
      col("ts") >= timestamp_micros(lit(dayStart)) &&
        col("ts") < timestamp_micros(lit(dayEnd))).count()
    val lateRows =
      ev.filter(col("ts") >= timestamp_micros(lit(splitUs))).count()
    val baseRows = ev.filter(col("ts") < timestamp_micros(lit(splitUs)))
      .count() - windowRows
    val (warm, recs) = withRecordsRead {
      val df = QueryCacheSession(spark, tcfg()).run(q(readWork(work)))
      df.collect()
      df
    }
    // the twin repaired at bucket grain — the shape that rebuilds loudly
    // without it
    assert(log.messages.exists(
      _.contains("repairing 1 declared rewrite range(s) at bucket grain")),
      log.messages)
    assert(!log.messages.exists(_.contains("no droppable bucket key")),
      log.messages)
    assert(recs <= windowRows + lateRows + baseRows / 2,
      s"twin repair scanned $recs rows (window=$windowRows late=$lateRows " +
        s"base=$baseRows) — history was rescanned")
    assertSameRows(warm, q(ev))
  }

  test("no droppable bucket key (no-group-by): loud rebuild, correct") {
    def q(df: DataFrame) = df.filter(col("value") > 1)
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
        min("value").as("min_value"))
    val (work, splitUs, dayStart, dayEnd, rewrite) = corruptScaffold("rnog")
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log, Some(splitUs)))
      .run(q(readWork(work))).collect()
    rewrite()
    assert(cache.repairRange(work, dayStart, dayEnd) == 1)
    val warm = QueryCacheSession(spark, cfg(cache, log))
      .run(q(readWork(work)))
    assert(log.messages.exists(
      _.contains("no droppable bucket key")), log.messages)
    assert(log.messages.count(_.startsWith("cache miss")) == 2, log.messages)
    assertSameRows(warm, q(eventsFull))
    // the rebuild consumed the repair: the next run hits normally
    val log2 = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log2)).run(q(readWork(work)))
      .collect()
    assert(log2.messages.count(_.startsWith("cache hit")) == 1, log2.messages)
  }

  test("subsumption probes skip a repair-pending twin") {
    // warm HOUR state exists but carries a pending repair — a DAY query
    // must NOT regrain from it (it would bake the stale buckets into a
    // fresh entry); it runs as a plain miss and is still correct
    def hourly(df: DataFrame) = df.filter(col("value") > 1)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
    def daily(df: DataFrame) = df.filter(col("value") > 1)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
    val (work, splitUs, dayStart, dayEnd, rewrite) = corruptScaffold("rtwin")
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log, Some(splitUs)))
      .run(hourly(readWork(work))).collect()
    rewrite()
    assert(cache.repairRange(work, dayStart, dayEnd) == 1)
    val log2 = new RecordingLog
    val day = QueryCacheSession(spark, cfg(cache, log2))
      .run(daily(readWork(work)))
    assert(!log2.messages.exists(_.contains("regrain hit")), log2.messages)
    assertSameRows(day, daily(eventsFull))
    // the hour entry itself still repairs on its own next run
    val log3 = new RecordingLog
    val hour = QueryCacheSession(spark, cfg(cache, log3))
      .run(hourly(readWork(work)))
    assert(log3.messages.exists(_.contains("repairing")), log3.messages)
    assertSameRows(hour, hourly(eventsFull))
  }

  test("durable sidecars: the mark survives fresh handles, is applied, " +
      "and is cleared after the repairing run") {
    def q(df: DataFrame) = df.filter(col("value") > 1)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
    val (work, splitUs, dayStart, dayEnd, rewrite) = corruptScaffold("rdur")
    val cacheDir = tmpDir("rdur-cache")
    val log = new RecordingLog
    QueryCacheSession(spark,
      cfg(new ParquetQueryCache(cacheDir), log, Some(splitUs)))
      .run(q(readWork(work))).collect()
    rewrite()
    // declared through a FRESH handle: the durable sweep finds the entry
    // by its persisted source paths and writes a sidecar file
    assert(new ParquetQueryCache(cacheDir)
      .repairRange(work, dayStart, dayEnd) == 1)
    def sidecars(): Seq[String] = {
      val root = new Path(cacheDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(_.isDirectory).toSeq.flatMap(d =>
        fs.listStatus(d.getPath).map(_.getPath.getName)
          .filter(n => n.startsWith("repair-") && n.endsWith(".json")))
    }
    assert(sidecars().size == 1, sidecars())
    val log2 = new RecordingLog
    val warm = QueryCacheSession(spark,
      cfg(new ParquetQueryCache(cacheDir), log2))
      .run(q(readWork(work)))
    warm.collect()
    assert(log2.messages.exists(
      _.contains("repairing 1 declared rewrite range(s) at bucket grain")),
      log2.messages)
    assertSameRows(warm, q(eventsFull))
    assert(sidecars().isEmpty, sidecars())
  }

  test("row-grain repair of a materialized view; pruned temporal column " +
      "rebuilds loudly") {
    def view(df: DataFrame) = df
      .filter(col("value") > 50 && col("event_type") =!= "error")
      .select(col("event_id"), col("ts"), col("value"))
    val (work, splitUs, dayStart, dayEnd, rewrite) = corruptScaffold("rrow")
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log, Some(splitUs)))
      .run(view(readWork(work))).collect()
    rewrite()
    assert(cache.repairRange(work, dayStart, dayEnd) == 1)
    val log2 = new RecordingLog
    val warm = QueryCacheSession(spark, cfg(cache, log2))
      .run(view(readWork(work)))
    assert(log2.messages.exists(
      _.contains("repairing 1 declared rewrite range(s) at row grain")),
      log2.messages)
    assertSameRows(warm, view(eventsFull))

    // pruned ts: the state can't identify the window's rows — rebuild
    def slim(df: DataFrame) = df
      .filter(col("value") > 50 && col("event_type") =!= "error")
      .select(col("event_id"), col("value"))
    val (work2, splitUs2, dayStart2, dayEnd2, rewrite2) =
      corruptScaffold("rrow2")
    val cache2 = new MemoryQueryCache()
    val log3 = new RecordingLog
    QueryCacheSession(spark, cfg(cache2, log3, Some(splitUs2)))
      .run(slim(readWork(work2))).collect()
    rewrite2()
    assert(cache2.repairRange(work2, dayStart2, dayEnd2) == 1)
    val log4 = new RecordingLog
    val warm2 = QueryCacheSession(spark, cfg(cache2, log4))
      .run(slim(readWork(work2)))
    assert(log4.messages.exists(
      _.contains("projection pruned the temporal column")), log4.messages)
    assertSameRows(warm2, slim(eventsFull))
  }

  test("repairs flow through factorized-join twins: the temporal twin " +
      "bucket-repairs, the partner twin rebuilds loudly, one warm run") {
    val ev = eventsFull
    val splitUs = ev
      .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
      .first().getLong(0)
    val p30 = ev
      .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.3) AS LONG)")
      .first().getLong(0)
    val dayStart = p30 - java.lang.Math.floorMod(p30, dayUs)
    val dayEnd = dayStart + dayUs
    val base = tmpDir("rfact")
    val splitTs = timestamp_micros(lit(splitUs))
    val inDay = col("ts") >= timestamp_micros(lit(dayStart)) &&
      col("ts") < timestamp_micros(lit(dayEnd))
    def part(t: String) = ev.filter(col("event_type") === t)
      .select(col("ts"), col("user_id"), col("value"))
    // both fact tables get a CORRUPTED day (rows missing, values skewed)
    for ((t, w) <- Seq(("click", s"$base/a"), ("purchase", s"$base/b"))) {
      part(t).filter(col("ts") < splitTs && !inDay).write.parquet(s"$w/base")
      part(t).filter(col("ts") < splitTs && inDay &&
          pmod(col("user_id"), lit(3)) =!= 0)
        .withColumn("value", col("value") * 2 + 1)
        .write.parquet(s"$w/day")
    }
    def rd(w: String) =
      spark.read.option("recursiveFileLookup", "true").parquet(w)
    def q(a: DataFrame, b: DataFrame) = a
      .join(b, a("user_id") === b("user_id"), "inner")
      .groupBy(date_trunc("hour", a("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"), sum(a("value")).as("sum_click"),
        min(b("value")).as("min_purchase"))
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log, Some(splitUs)))
      .run(q(rd(s"$base/a"), rd(s"$base/b"))).collect()
    assert(log.messages.exists(_.startsWith("factorized join: answered")),
      log.messages)
    // INSERT OVERWRITE both days with the truth + append both tails
    val fs = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for ((t, w) <- Seq(("click", s"$base/a"), ("purchase", s"$base/b"))) {
      fs.delete(new Path(s"$w/day"), true)
      part(t).filter(col("ts") < splitTs && inDay).write.parquet(s"$w/day")
      part(t).filter(col("ts") >= splitTs).write.parquet(s"$w/rest")
    }
    // one declaration per rewritten table: the hour-bucketed click twin
    // repairs at bucket grain, the key-only purchase twin has no bucket
    // to drop and rebuilds loudly — both automatic, one warm run
    assert(cache.repairRange(s"$base/a", dayStart, dayEnd) == 1)
    assert(cache.repairRange(s"$base/b", dayStart, dayEnd) == 1)
    val log2 = new RecordingLog
    val warm = QueryCacheSession(spark, cfg(cache, log2))
      .run(q(rd(s"$base/a"), rd(s"$base/b")))
    assert(log2.messages.exists(_.startsWith("factorized join: answered")),
      log2.messages)
    assert(log2.messages.exists(
      _.contains("repairing 1 declared rewrite range(s) at bucket grain")),
      log2.messages)
    assert(log2.messages.exists(_.contains("no droppable bucket key")),
      log2.messages)
    // vanilla over the rewritten work dirs (= the pristine full tables
    // by construction; part() twice off `ev` would be a self-join)
    assertSameRows(warm, q(rd(s"$base/a"), rd(s"$base/b")))
  }

  test("ranges wholly at/after the watermark are consumed for free") {
    def q(df: DataFrame) = df.filter(col("value") > 1)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    // clean scaffold (no corruption): the declared range sits in the
    // append region, which the delta scan re-reads anyway
    val ev = eventsFull
    val splitUs = ev
      .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
      .first().getLong(0)
    val work = tmpDir("rfree")
    ev.filter(col("ts") < timestamp_micros(lit(splitUs)))
      .write.mode("overwrite").parquet(work)
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log, Some(splitUs)))
      .run(q(spark.read.parquet(work))).collect()
    ev.filter(col("ts") >= timestamp_micros(lit(splitUs)))
      .write.mode("append").parquet(work)
    assert(cache.repairRange(work, splitUs + 1, splitUs + dayUs) == 1)
    val log2 = new RecordingLog
    val warm = QueryCacheSession(spark, cfg(cache, log2))
      .run(q(spark.read.parquet(work)))
    assert(!log2.messages.exists(_.contains("repairing")), log2.messages)
    assert(log2.messages.count(_.startsWith("cache hit")) == 1, log2.messages)
    assertSameRows(warm, q(ev))
    assert(cache.pendingRepairs("").isEmpty) // sanity on the empty key
    // consumed: no pending ranges survive anywhere in the index
    val log3 = new RecordingLog
    QueryCacheSession(spark, cfg(cache, log3))
      .run(q(spark.read.parquet(work))).collect()
    assert(!log3.messages.exists(_.contains("repairing")), log3.messages)
  }
}
