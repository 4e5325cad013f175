package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only measurement harness for the optimization rounds (guide §1):
  * for each named SparkEntry query, captures `.explain("formatted")` to
  * `<outDir>/<query>_<tag>.txt`, then times one execution and reports the
  * SPARK JOB COUNT the run launched — the fixed-overhead face of a
  * multi-phase operator (each job is a scheduler round-trip; at dev scale
  * 50-150 ms each, so job count × latency bounds the floor of a scenario
  * query regardless of data volume).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> q1,q2,...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names: Seq[String] =
      if (args.length > 3 && args(3).nonEmpty) args(3).split(",").toSeq
      else SparkEntryNames.all
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val jobs = new AtomicLong
    val verbose = sys.env.contains("SPARK_GRAFT_PLANDUMP_JOBS")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) starts.put(j.jobId,
          (j.time, Option(j.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")))
        ()
      }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(starts.remove(j.jobId)).foreach { case (t0, cs) =>
          println(f"[plandump]   job ${j.jobId}%4d ${j.time - t0}%6d ms  $cs")
        }
    })
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      qs.get(name) match {
        case None => println(s"[plandump] UNKNOWN query $name")
        case Some(fn) =>
          try {
            // plan capture: build the frame (scenario queries stage data
            // and run their phases HERE — the returned frame is the final
            // read-back), then snapshot its formatted plan
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
            // timed run with job attribution: fresh build so scenario
            // phases are counted too, same timed action as Bench (count)
            spark.catalog.clearCache()
            jobs.set(0)
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            val sec = (System.nanoTime() - t0) / 1e9
            println(f"[plandump] $name%-28s ${sec}%8.3f s  jobs=${jobs.get()}%4d rows=$n")
            spark.catalog.clearCache()
          } catch { case e: Throwable =>
            println(s"[plandump] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}

private object SparkEntryNames {
  def all: Seq[String] = graft.SparkEntry.queries.keys.toSeq.sorted
}
