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
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which the
    * Spark 4 vectorized reader rejects outright. Read nanos as raw longs
    * (legacy conf) and convert to microsecond TimestampType — same
    * truncation DuckDB applies, so oracle comparisons line up. The conf is
    * session-dynamic, so setting it here covers driver-created sessions.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
