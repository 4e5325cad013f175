package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only: times each q_stream_* query and dumps per-micro-batch
  * progress (durationMs breakdown: addBatch / getBatch / walCommit /
  * stateStore commit...) so streaming fixed overhead is attributable
  * (guide §1). Registered globally via the streamingQueryListeners conf
  * so the isolated child sessions the stream scenarios run on report
  * too. Not a driver main. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else graft.SparkEntry.queries.keys.filter(_.startsWith("q_stream"))
        .toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUF", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.tools.ProgressRecorder")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      ProgressRecorder.clear()
      val t0 = System.nanoTime()
      val n = try qs(name)(spark, sfDir).count() catch { case e: Throwable =>
        println(s"[streamprof] $name FAILED ${e.getMessage}"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[streamprof] $name%-24s ${sec}%8.3f s rows=$n")
      ProgressRecorder.dump()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

/** collects micro-batch progress lines across all sessions (conf-registered) */
class ProgressRecorder extends StreamingQueryListener {
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit =
    ProgressRecorder.add(e.progress.json)
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object ProgressRecorder {
  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def add(s: String): Unit = { buf.add(s); () }
  def clear(): Unit = buf.clear()
  def dump(): Unit = {
    import scala.jdk.CollectionConverters._
    buf.asScala.foreach { j =>
      // compact: batchId, rows, durationMs object
      val b = """"batchId"\s*:\s*(\d+)""".r.findFirstMatchIn(j).map(_.group(1))
      val r = """"numInputRows"\s*:\s*(\d+)""".r.findFirstMatchIn(j).map(_.group(1))
      val d = """"durationMs"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(j).map(_.group(1))
      val so = """"stateOperators"\s*:\s*\[(.*)\]\s*,\s*"sources"""".r
        .findFirstMatchIn(j).map(_.group(1)).getOrElse("")
      val soc = Seq("operatorName", "commitTimeMs", "allUpdatesTimeMs",
        "allRemovalsTimeMs", "numRowsTotal", "numShufflePartitions",
        "numStateStoreInstances").flatMap(k =>
        ("\"" + k + "\"\\s*:\\s*(\"[^\"]*\"|\\d+)").r
          .findAllMatchIn(so).map(m => s"$k=${m.group(1)}").toSeq)
        .mkString(" ")
      println(s"[streamprof]   batch=${b.getOrElse("?")} rows=${r.getOrElse("?")} durationMs={${d.getOrElse("")}}")
      if (so.nonEmpty) println(s"[streamprof]     state: $soc")
    }
  }
}
