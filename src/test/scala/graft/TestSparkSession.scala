package graft

import org.apache.spark.sql.SparkSession

object TestSparkSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // Spark still defaults parquet timestamps to INT96, which has NO
      // column statistics: every scan-bound assertion in this suite
      // (zero-rescan pins, the band-bounded late re-scan) depends on
      // ts row-group pruning over test-written files — micros, like the
      // Bench/Verify sessions and any sane deployment
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"

  def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag-")
    d.toFile.deleteOnExit()
    d.toString
  }
}
