package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims

import graft.{QueryCacheConfig, QueryCacheSession}
import graft.cache.MemoryQueryCache
import graft.exec.IncrementalAggExecutor
import graft.sources.Tables

/** Dev-only: phase timing of the warm cache path on the BASELINE.md
  * scenario (1% append), to attribute fixed overhead. Not a driver main. */
object WarmProfile {
  private def ms[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[warmprofile] $tag%-28s ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
    r
  }

  private class Counter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      val i = s.stageInfo
      val dur = for { a <- i.submissionTime; b <- i.completionTime } yield b - a
      println(s"[warmprofile]   stage ${i.stageId} '${i.name.takeWhile(_ != '\n').take(40)}' tasks=${i.numTasks} ms=${dur.getOrElse(-1L)}")
    }
    def report(tag: String): Unit =
      println(s"[warmprofile] $tag jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = 2048
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    spark.range(1L << 20).select(sum("id")).collect()
    Tables.events(spark, sfDir).count()

    val base = Tables.events(spark, sfDir)
      .withColumn("_i", explode(sequence(lit(0), lit(mult - 1))))
      .withColumn("event_id", col("event_id") * mult + col("_i"))
      .withColumn("value", col("value") + col("_i") * 0.001)
      .drop("_i")
    val splitUs = Tables.events(spark, sfDir).selectExpr(
      "CAST(percentile_approx(unix_micros(ts), 0.99) AS LONG)")
      .first().getLong(0)
    val work = s"${sys.props("java.io.tmpdir")}/graft_warmprofile"
    val workPath = new org.apache.hadoop.fs.Path(work)
    val fs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(workPath)) fs.delete(workPath, true)
    val splitTs = timestamp_micros(lit(splitUs))
    graft.sources.Layouts.writeTimeSeriesPartitioned(
      base.filter(col("ts") < splitTs), work)

    def q(df: DataFrame) = df.filter(col("value") > 1)
      .agg(round(avg("value"), 2).as("avg_value"), count(lit(1)).as("cnt"))

    val cache = new MemoryQueryCache()
    val cold = QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs)))
    ms("cold total")(cold.run(q(spark.read.parquet(work))).collect())

    graft.sources.Layouts.writeTimeSeriesPartitioned(
      base.filter(col("ts") >= splitTs).repartitionByRange(8, col("ts")),
      work, mode = "append")

    for (round <- 1 to 3) {
      val ex = new IncrementalAggExecutor(QueryCacheConfig(cache,
        defaultTemporalColumn = "ts").withTemporalPartitioning("ts_day"))
      val df = ms(s"r$round build df")(q(spark.read.parquet(work)))
      val analyzed = ms(s"r$round analyze")(Shims.queryExecution(df).analyzed)
      val ctr = new Counter
      spark.sparkContext.addSparkListener(ctr)
      val plan = ms(s"r$round rewritePlan (incl put)")(
        ex.rewritePlan(spark, analyzed))
      Thread.sleep(300)
      ctr.report(s"r$round rewrite")
      spark.sparkContext.removeSparkListener(ctr)
      val out = ms(s"r$round ofRows re-analysis")(
        Shims.ofRows(spark, plan.get))
      ms(s"r$round final collect")(out.collect())
      // vanilla comparison
      val v = q(spark.read.parquet(work))
      ms(s"r$round vanilla collect")(v.collect())
    }
    spark.stop()
  }
}
