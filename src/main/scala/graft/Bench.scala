package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cache.MemoryQueryCache
import graft.sources.Tables

/** Bench main: per-query seconds for every SparkEntry query, plus the
  * BASELINE.md incremental-cache envelope on the demo-equivalent query
  * (`avg(value), count(*) WHERE value > 1`, examples/demo.rs:26):
  *
  *  - cold vs warm wall-clock at 1% / 10% appended data;
  *  - records scanned cold vs warm (the scale-invariant proof: a warm run
  *    must read only the appended rows — at 100 TB that ratio, not the
  *    local wall-clock, is the speedup);
  *  - vanilla (uncached) run on the full data for overhead comparison.
  *
  * The events table is deterministically multiplied (×SPARK_GRAFT_BENCH_MULT,
  * default 32) so the scan is the dominant cost like it would be at real
  * scale — at sf0.1 the raw table is ~100k rows and every run is
  * JVM-overhead-bound, which says nothing about scan savings.
  * One JSON line on stdout.
  */
object Bench {
  private val recordsRead = new LongAdder

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def timedScan[A](f: => A): (Double, Long) = {
    recordsRead.reset()
    val sec = time(f)
    (sec, recordsRead.sum())
  }

  /** cold/warm/vanilla seconds + scan row counts for one append fraction */
  private def incremental(spark: SparkSession, sfDir: String, pct: Double,
      mult: Int): Map[String, Double] = {
    val tag = (pct * 100).toInt
    val base = Tables.events(spark, sfDir)
      .withColumn("_i", explode(sequence(lit(0), lit(mult - 1))))
      .withColumn("event_id", col("event_id") * mult + col("_i"))
      .withColumn("value", col("value") + col("_i") * 0.001)
      .drop("_i")
    val splitUs = Tables.events(spark, sfDir).selectExpr(
      s"CAST(percentile_approx(unix_micros(ts), ${1.0 - pct}) AS LONG)")
      .first().getLong(0)
    val work = s"${sys.props("java.io.tmpdir")}/graft_bench/x$tag"
    val workPath = new org.apache.hadoop.fs.Path(work)
    val fs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(workPath)) fs.delete(workPath, true)
    val splitTs = timestamp_micros(lit(splitUs))
    // time-ordered layout: tight row-group stats let the warm run's
    // pushed `ts >= wm` filter skip the history physically (see
    // graft.sources.Layouts)
    graft.sources.Layouts.writeTimeSeries(
      base.filter(col("ts") < splitTs), work, "ts", buckets = 16)

    def q(df: DataFrame) = df.filter(col("value") > 1)
      .agg(round(avg("value"), 2).as("avg_value"), count(lit(1)).as("cnt"))

    val cache = new MemoryQueryCache()
    val cold = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs)))
    val (coldSec, coldRows) = timedScan(
      cold.run(q(spark.read.parquet(work))).collect())

    graft.sources.Layouts.writeTimeSeries(
      base.filter(col("ts") >= splitTs), work, "ts", buckets = 4,
      mode = "append")

    val warm = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts"))
    val (warmSec, warmRows) = timedScan(
      warm.run(q(spark.read.parquet(work))).collect())
    val (vanillaSec, vanillaRows) = timedScan(
      q(spark.read.parquet(work)).collect())

    Map(
      s"cold_${tag}pct_sec" -> coldSec,
      s"warm_${tag}pct_sec" -> warmSec,
      s"vanilla_${tag}pct_sec" -> vanillaSec,
      s"cold_${tag}pct_rows" -> coldRows.toDouble,
      s"warm_${tag}pct_rows" -> warmRows.toDouble,
      s"vanilla_${tag}pct_rows" -> vanillaRows.toDouble)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mult = sys.env.getOrElse("SPARK_GRAFT_BENCH_MULT", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // INT96 (the legacy default) has no usable stats and no predicate
      // pushdown — micros keeps the watermark filter prunable
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recordsRead.add(t.taskMetrics.inputMetrics.recordsRead)
    })

    // hygiene: one untimed warmup JITs the scan/shuffle/agg paths before
    // anything is measured, and any cache entries a query leaks are
    // cleared before the next so one bad citizen can't poison the rest
    spark.range(1L << 20).select(sum("id")).collect()
    Tables.events(spark, sfDir).count()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        name -> sec
      }

    val incr = Seq(0.01, 0.10).flatMap(p =>
      try incremental(spark, sfDir, p, mult).toSeq
      catch { case _: Throwable => Seq.empty }).toMap
    val speedup = for {
      c <- incr.get("cold_1pct_sec"); w <- incr.get("warm_1pct_sec")
    } yield c / w
    val scanRatio = for {
      c <- incr.get("vanilla_1pct_rows"); w <- incr.get("warm_1pct_rows")
      if w > 0
    } yield c / w

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def fmt(pairs: Iterable[(String, Double)]): String =
      pairs.map { case (k, v) => "\"" + k + "\":" + num(v) }
        .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def opt(d: Option[Double]) = d.map(x =>
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))).getOrElse("null")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(results)},"incremental":${fmt(incr)},"warm_speedup_1pct":${opt(speedup)},"warm_scan_reduction_1pct":${opt(scanRatio)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
