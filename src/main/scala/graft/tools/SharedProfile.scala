package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryCacheConfig, QueryCacheSession}
import graft.sources.Tables

/** Dev-only: isolates the Bench shared-delta A/B (3-view dashboard
  * refresh, one shared append scan vs three private) at a configurable
  * multiplier, with per-job timing — to attribute the shared leg's cost
  * (guide §1: measure first). Not a driver main. */
object SharedProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_BENCH_MULT", "16384").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val dur = for { a <- i.submissionTime; b <- i.completionTime } yield b - a
          if (dur.exists(_ > 200))
            println(s"[shprof]   stage ${i.stageId} tasks=${i.numTasks} " +
              s"ms=${dur.getOrElse(-1L)} '${i.name.takeWhile(_ != '\n').take(60)}'")
        }
      })
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[shprof] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val base = Tables.events(spark, sfDir)
      .repartitionByRange(16, col("ts")).sortWithinPartitions("ts")
      .withColumn("_i", explode(sequence(lit(0), lit(mult - 1))))
      .withColumn("event_id", col("event_id") * mult + col("_i"))
      .withColumn("value", col("value") + col("_i") * 0.001)
      .drop("_i")
    val splitUs = Tables.events(spark, sfDir).selectExpr(
      "CAST(percentile_approx(unix_micros(ts), 0.99) AS LONG)")
      .first().getLong(0)
    val work = s"${sys.props("java.io.tmpdir")}/graft_shprof/x1"
    val workPath = new org.apache.hadoop.fs.Path(work)
    val fs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(workPath)) fs.delete(workPath, true)
    val splitTs = timestamp_micros(lit(splitUs))
    time("history write") {
      graft.sources.Layouts.writeTimeSeriesPartitioned(
        base.filter(col("ts") < splitTs), work)
    }
    time("append write") {
      graft.sources.Layouts.writeTimeSeriesPartitioned(
        base.filter(col("ts") >= splitTs).repartitionByRange(8, col("ts")),
        work, mode = "append")
    }
    val workSchema = spark.read.parquet(work).schema
    def readWork() = spark.read.schema(workSchema).parquet(work)
    val tableWarm = readWork()

    def v1(df: DataFrame) = df.filter(col("value") > 1)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
    def v2(df: DataFrame) = df
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(avg("value").as("av"), count(lit(1)).as("c2"))
    def v3(df: DataFrame) = df.filter(col("value") > 2)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(min("value").as("mn"), max("value").as("mx"))
    val views: Seq[DataFrame => DataFrame] = Seq(v1, v2, v3)

    val cacheBase = s"${sys.props("java.io.tmpdir")}/graft_shprof/shcache"
    val cbp = new org.apache.hadoop.fs.Path(cacheBase)
    if (fs.exists(cbp)) fs.delete(cbp, true)
    val coldDir = s"$cacheBase/cold"
    def cfgSh(dir: String) =
      QueryCacheConfig(new graft.cache.ParquetQueryCache(dir),
        defaultTemporalColumn = "ts", strictUpperBound = true)
        .withTemporalPartitioning("ts_day")
    time("cold build (3 views)") {
      val cold = QueryCacheSession(spark,
        cfgSh(coldDir).withOverrideNowMicros(splitUs))
      views.foreach(v => cold.run(v(tableWarm)).collect())
    }
    def cloneDir(src: String, dst: String): Unit = {
      val d = new org.apache.hadoop.fs.Path(dst)
      fs.delete(d, true)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(src), fs, d, false,
        spark.sparkContext.hadoopConfiguration)
      ()
    }
    (0 until 2).foreach { i =>
      val (sd, ud) = (s"$cacheBase/sh$i", s"$cacheBase/un$i")
      cloneDir(coldDir, sd); cloneDir(coldDir, ud)
      time(s"rep$i unshared (3 views)") {
        val warm = QueryCacheSession(spark, cfgSh(ud))
        views.foreach(v => warm.run(v(tableWarm)).collect())
      }
      val rec = new graft.log.RecordingLog()
      time(s"rep$i shared (3 views)") {
        val warm = QueryCacheSession(spark, cfgSh(sd).copy(log = rec))
        warm.refreshCycle {
          views.zipWithIndex.foreach { case (v, vi) =>
            time(s"rep$i shared view$vi") {
              val df = warm.run(v(tableWarm))
              df.collect()
              if (i == 0) println(df.queryExecution.executedPlan
                .toString.linesIterator.take(40).mkString("\n"))
            }
          }
        }
      }
      if (i == 0) rec.history.foreach(e => println(s"[shlog] $e"))
    }
    spark.stop()
  }
}
