package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-corpus table access (TPC-H-ish star schema + events/documents/
  * embeddings, see TESTDATA.md / FIXTURES.md).
  *
  * Scans are plain `spark.read.parquet` so Catalyst keeps full pushdown:
  * column pruning and predicate pushdown reach the parquet reader
  * (`PushedFilters`/`ReadSchema` in `.explain("formatted")`). At 100 TB
  * the same call works against a partitioned directory tree; partition
  * pruning then composes with the pushed filters for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  /** Normalize a raw events `ts` column to microsecond TimestampType
    * whatever representation the files carry. Generated data has shipped
    * `ts` as parquet TIMESTAMP(NANOS) — which the Spark 4 vectorized
    * reader rejects unless the legacy conf maps it to a raw nanos LONG —
    * and as TIMESTAMP(MICROS, NTZ). Keying off the DataFrame's own schema
    * keeps every consumer (batch reader, file-stream source, staged work
    * dirs) correct against either vintage; sessions here run in UTC, so
    * the NTZ→LTZ cast preserves the wall-clock value DuckDB reads. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // The NTZ→LTZ cast re-interprets the wall-clock value in the
        // SESSION time zone; every entry point here pins UTC, but a
        // future session that forgets would silently shift all event
        // timestamps relative to the oracle — fail loudly instead.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"normalizeEventsTs requires spark.sql.session.timeZone=UTC " +
            s"(got '$tz'): the NTZ cast would shift event wall-clock times")
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** events with `ts` as microsecond TimestampType (see
    * [[normalizeEventsTs]]). The legacy nanos conf is session-dynamic and
    * only consulted for TIMESTAMP(NANOS) files, so setting it here is a
    * no-op on micros-vintage data. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(table(spark, d, "events"))
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  /** documents as an unbounded file-stream source (static schema probed
    * from the batch reader; AvailableNow over the same path yields the
    * batch contents — the streaming-scenario scaffold, StreamQueries) */
  def documentsStream(spark: SparkSession, d: String): DataFrame = {
    val raw = spark.read.parquet(s"$d/documents.parquet").schema
    spark.readStream.schema(raw).parquet(streamableDir(spark, d, "documents"))
  }

  /** The file-stream source requires a DIRECTORY (it forces its own
    * `basePath` to the stream path), but the test tables are single
    * parquet files — stage a copy under a per-(sf, table) temp dir once.
    * Real deployments stream append-only directories; this shim exists
    * only because the fixtures are single files. */
  private[graft] def streamableDir(spark: SparkSession, d: String,
      name: String): String = {
    val sfTag = new java.io.File(d).getName
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_stream", sfTag, name)
    val source = java.nio.file.Paths.get(d, s"$name.parquet")
    val target = dir.resolve(s"$name.parquet")
    // staleness guard: re-copy when the fixture was regenerated (size or
    // mtime drift), or streaming queries would silently read old data
    // while batch/oracle read the new file
    val fresh = java.nio.file.Files.exists(target) &&
      java.nio.file.Files.size(target) == java.nio.file.Files.size(source) &&
      java.nio.file.Files.getLastModifiedTime(target)
        .compareTo(java.nio.file.Files.getLastModifiedTime(source)) >= 0
    if (!fresh) {
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.copy(source, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    }
    dir.toString
  }
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
