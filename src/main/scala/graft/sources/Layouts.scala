package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IVF

/** Physical table layouts that make the engine's access patterns prune at
  * scale. Correctness never depends on these; cost does — a 100 TB scan
  * that cannot skip files pays for all 100 TB.
  *
  *  - [[writeTimeSeries]]: range-partition by the temporal column and
  *    sort within partitions, with TIMESTAMP_MICROS output (INT96, the
  *    default, stores no usable stats and defeats predicate pushdown).
  *    Parquet row-group min/max become tight time ranges, so the
  *    incremental cache's warm `ts >= watermark` filter skips history
  *    physically (Bench measures ~99× fewer records read at 1% append).
  *  - [[writeIvfIndexed]]: `partitionBy(ivf_cell)` so an ANN probe of
  *    nProbe cells reads only those directories — partition pruning
  *    turns query cost into O(cells probed / k), independent of corpus
  *    size.
  */
object Layouts {

  /** write an append-friendly time-ordered table */
  def writeTimeSeries(df: DataFrame, path: String, tsCol: String = "ts",
      buckets: Int = 16, mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      df.repartitionByRange(buckets, col(tsCol))
        .sortWithinPartitions(tsCol)
        .write.mode(mode).parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  /** Order-preserving fast path of [[writeTimeSeries]] for input that is
    * ALREADY time-ordered within each partition with disjoint ranges
    * across partitions (an append stream, or a derivation that preserves
    * source order). Skips the range shuffle — on a 100 TB backfill that
    * shuffle costs more than the write itself — while row-group stats
    * stay tight because order is preserved. Caller owns the ordering
    * guarantee; correctness never depends on it, only scan pruning. */
  def writeTimeSeriesPresorted(df: DataFrame, path: String,
      mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try df.write.mode(mode).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  /** Time-series layout with Hive-style DATE partitioning: each row lands
    * in `<path>/<partCol>=<date(ts)>/`, where `date(ts)` is evaluated in
    * the writing session's time zone. A reader filtering on `partCol`
    * prunes whole directories at PLANNING time — the incremental cache's
    * warm run derives exactly that filter from its watermark (see
    * [[graft.QueryCacheConfig.temporalPartitionColumn]]), so the warm
    * scan's task count follows the appended data, not the history size.
    * Row-group stats stay tight inside each partition (input ordering is
    * preserved per task), covering intra-day pruning.
    *
    * Appends compose: `mode = "append"` adds files only under the dates
    * the new rows touch. */
  def writeTimeSeriesPartitioned(df: DataFrame, path: String,
      tsCol: String = "ts", partCol: String = "ts_day",
      mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try df.withColumn(partCol, to_date(col(tsCol)))
      .write.partitionBy(partCol).mode(mode).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  /** Write a deterministically SHUFFLED training epoch as `shards`
    * directories, each internally ordered by the reproducible shuffle
    * position ([[graft.operators.Sampling.epochShuffle]]): a sequential
    * reader of `<path>/shard=s/` streams that shard's rows in epoch
    * order, and the shard set concatenated is the full shuffled epoch.
    * One shuffle total: the shuffle position's window is already
    * hash-partitioned by shard, so the write reuses that exchange — no
    * `repartition` — and the explicit `sortWithinPartitions` (the
    * write-order guarantee) runs over data the window already ordered
    * as (shard, hash), costing a near-no-op merge pass.
    *
    * `shard_pos` is kept in the output: trainers resuming mid-shard seek
    * by it, and [[LayoutSpec]] pins read-back order == shuffle order. */
  def writeShuffledEpoch(df: DataFrame, path: String, keyCol: String,
      shards: Int, seed: Long = 0L, mode: String = "overwrite"): Unit =
    graft.operators.Sampling.epochShuffle(df, col(keyCol), shards, seed)
      .sortWithinPartitions("shard", "shard_pos")
      .write.partitionBy("shard").mode(mode).parquet(path)

  /** Z-ORDERED layout: cluster on TWO columns so parquet min/max stats
    * prune files and row groups for predicates on EITHER column (a
    * lexicographic sort only serves its leading key). Each column is
    * rank-bucketed into 16-bit codes via `approxQuantile` boundaries —
    * equi-depth, so skew cannot collapse the curve; the driver holds only
    * `2 × buckets` doubles regardless of table size — then the Morton
    * interleave ([[graft.functions.ZOrder]]) is range-partitioned and
    * sorted. One shuffle, same cost shape as [[writeTimeSeries]]; the
    * key column is dropped from the files (it is derivable).
    *
    * At 100 TB: `files` follows the target file size (~1 GB), the
    * quantile pass is a single narrow scan of two columns, and every
    * subsequent selective scan on either dimension reads a near-minimal
    * file subset — the recurring-read workload this library optimizes
    * pays the one-time shuffle back immediately.
    *
    * Temporal columns are accepted (bucketed on their epoch value), but
    * note Spark's parquet reader does not row-group-skip on
    * TIMESTAMP_NTZ statistics even though the predicate reaches
    * PushedFilters (verified empirically) — cluster on numeric/LTZ
    * columns for pruning, or pair with [[writeTimeSeriesPartitioned]]
    * for the temporal dimension. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      files: Int = 16, buckets: Int = 255, mode: String = "overwrite"): Unit = {
    import graft.functions.ZOrder
    import org.apache.spark.sql.types._
    // type-aware numeric view (temporal types don't cast to double)
    def asDouble(c: String): Column = df.schema(c).dataType match {
      case DateType => unix_date(col(c)).cast("double")
      case TimestampType => unix_micros(col(c)).cast("double")
      case TimestampNTZType =>
        unix_micros(col(c).cast(TimestampType)).cast("double")
      case _ => col(c).cast("double")
    }
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val Seq(qa, qb) = Seq(colA, colB).map(c =>
      df.select(asDouble(c).as(c))
        .stat.approxQuantile(c, probs, 0.001).toSeq.distinct)
    val z = ZOrder.interleave16(
      ZOrder.rankBucket(asDouble(colA), qa),
      ZOrder.rankBucket(asDouble(colB), qb))
    df.withColumn("_zkey", z)
      .repartitionByRange(files, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode(mode).parquet(path)
  }

  /** Compact a directory of small parquet files into ~`targetBytes`
    * files — the operational fix for the small-files problem every
    * long-running append pipeline (streaming sinks, incremental loads)
    * accumulates: at 100 TB, listing and footer-opening costs scale with
    * FILE COUNT, not data size, so a million 10 MB files tax every query
    * before a row is read.
    *
    * Default path is shuffle-free: `coalesce` concatenates input splits
    * into `ceil(totalBytes / targetBytes)` output tasks — a pure rewrite
    * whose cost is one read+write of the data. Pass `clusterBy` to also
    * re-cluster while paying for the rewrite anyway (a range shuffle +
    * sort, restoring tight min/max stats that interleaved appends
    * destroyed). Writes to `dest` (never in place — the swap is the
    * caller's atomic rename/catalog update, so readers never see a
    * half-compacted directory). Hive-partitioned tables compact
    * per-partition directory. */
  def compact(spark: SparkSession, src: String, dest: String,
      targetBytes: Long = 1L << 30, clusterBy: Option[String] = None,
      mode: String = "overwrite"): Int = {
    val srcPath = new Path(src)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = {
      val it = fs.listFiles(srcPath, true)
      var sum = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) sum += f.getLen
      }
      sum
    }
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(src)
    val out = clusterBy match {
      case Some(c) =>
        df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(c)
      case None => df.coalesce(nFiles)
    }
    out.write.mode(mode).parquet(dest)
    nFiles
  }

  /** write an embedding table partitioned by IVF cell */
  def writeIvfIndexed(emb: DataFrame, model: IVF.Model, path: String,
      embCol: String = "embedding", mode: String = "overwrite"): Unit =
    IVF.index(emb, model, embCol)
      .write.mode(mode).partitionBy("ivf_cell").parquet(path)

  /** read an IVF-partitioned table (ivf_cell comes back as a partition
    * column; filters on it prune whole directories) */
  def readIvfIndexed(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** BUCKETED layout for join-heavy index tables (the scale path the
    * incremental dedup indexes name: their per-batch anti/semi joins
    * exchange the index every run when it is a plain parquet dir).
    * Bucketing hash-partitions the FILES by `bucketCols` at write time,
    * so a later equi-join on EXACTLY those keys reads the index
    * pre-partitioned and only the (much smaller) batch side shuffles.
    * Bucket on the join's full key set: Spark's co-partition check
    * demands all cluster keys by default
    * (`spark.sql.requireAllClusterKeysForCoPartition`), so a subset
    * bucketing falls back to "Bucketed: false (disabled by query
    * planner)" — measured, not guessed. Exchange-free index side is
    * pinned in LayoutSpec. Registered as an EXTERNAL table at `path`
    * (bucket metadata lives in the session catalog — Spark's bucketing
    * contract; any catalog re-registration with the same DDL
    * rediscovers the files). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], buckets: Int,
      mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty)
    df.write.mode(mode).format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }
}
