package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryCacheConfig, QueryCacheSession}
import graft.cache.MemoryQueryCache
import graft.sources.Tables

/** Incremental-aggregation-cache scenarios as driver-checkable queries.
  *
  * Each entry replays the reference demo's cold → append → warm cycle
  * (examples/demo.rs:17-41) against a private working copy of `events`:
  * rows before the 60th time percentile are written, the query runs cold
  * (miss → state stored, stamped with overrideNow = split point), the
  * remaining rows are appended, and the query runs warm (hit → only
  * `ts >= watermark` rows are re-aggregated, merged with cached state).
  * The returned warm result must equal the same SQL over the FULL table —
  * which is exactly what the DuckDB oracle checks.
  *
  * Aggregates here are chosen exact (counts, decimal sums, min/max) so the
  * oracle hash-match is bit-exact regardless of partitioning order.
  */
object CacheQueries {

  /** cold → append → warm; returns the warm result. `cacheFactory` builds
    * the state store once, shared by the cold and warm sessions — for the
    * durable scenario a FRESH handle is taken for the warm run to prove
    * the state round-trips through storage. */
  /** events split at the 60th time percentile written to a fresh work
    * dir; `appendRest()` appends the remainder (one shared scaffold for
    * every cold/append/warm scenario) */
  def splitWrite(spark: SparkSession, sfDir: String, tag: String)
      : (String, Long, () => Unit) = {
    val ev = Tables.events(spark, sfDir).cache()
    val splitMicros = ev
      .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
      .first().getLong(0)
    val sfTag = new java.io.File(sfDir).getName
    val work = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/$tag"
    val workPath = new Path(work)
    val fs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(workPath)) fs.delete(workPath, true)
    val splitTs = timestamp_micros(lit(splitMicros))
    ev.filter(col("ts") < splitTs).write.mode("overwrite").parquet(work)
    (work, splitMicros, () => {
      ev.filter(col("ts") >= splitTs).write.mode("append").parquet(work)
      ev.unpersist()
    })
  }

  def coldAppendWarm(spark: SparkSession, sfDir: String, tag: String,
      cacheFactory: () => graft.cache.QueryCache = {
        val shared = new MemoryQueryCache(); () => shared
      },
      dynamicBounds: Boolean = false,
      staticDims: Seq[String] = Nil,
      warmNowMicros: Option[Long] = None,
      tweak: QueryCacheConfig => QueryCacheConfig = identity)(
      q: DataFrame => DataFrame): DataFrame = {
    val (work, splitMicros, appendRest) = splitWrite(spark, sfDir, tag)
    def cfg(cache: graft.cache.QueryCache, now: Option[Long]) = {
      val base = QueryCacheConfig(cache, defaultTemporalColumn = "ts",
        overrideNowMicros = now)
      val base2 = if (dynamicBounds) base.withDynamicBounds else base
      tweak(
        if (staticDims.nonEmpty) base2.withStaticDimensions(staticDims: _*)
        else base2)
    }
    val cold = QueryCacheSession(spark, cfg(cacheFactory(), Some(splitMicros)))
    cold.run(q(spark.read.parquet(work))).collect()
    appendRest()
    val warm = QueryCacheSession(spark, cfg(cacheFactory(), warmNowMicros))
    warm.run(q(spark.read.parquet(work)))
  }

  /** exact decimal sum rendered as double (shared rule: queries.Render).
    * The cache rewrite preserves the outer casts — it wraps the aggregate
    * and substitutes the finalize expression underneath them. */
  private def dsum(c: org.apache.spark.sql.Column) = Render.dsumd(c, 4)

  /** cold → REWRITE HISTORY → repairRange → warm. The working copy's
    * day-D slice (the UTC day at the 30th time percentile, all below the
    * split) is first written CORRUPTED — a third of its rows missing and
    * every value skewed — and the query runs cold over it. Then the
    * corrupted files are REPLACED with the true rows (an INSERT OVERWRITE
    * of one day), the tail appends, and `cache.repairRange(work,
    * dayStart, dayEnd)` declares the rewrite. The returned warm result
    * must equal the query over the PRISTINE full table — exactly what the
    * oracle checks: an unrepaired cache would keep the corrupted
    * contributions and hash-mismatch, while invalidateForTable's remedy
    * would pay a full history re-scan the repair path avoids. */
  def corruptRepairWarm(spark: SparkSession, sfDir: String, tag: String,
      cacheFactory: () => graft.cache.QueryCache = {
        val shared = new MemoryQueryCache(); () => shared
      },
      tweak: QueryCacheConfig => QueryCacheConfig = identity)(
      q: DataFrame => DataFrame): DataFrame = {
    val ev = Tables.events(spark, sfDir).cache()
    val splitMicros = ev
      .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
      .first().getLong(0)
    val p30 = ev
      .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.3) AS LONG)")
      .first().getLong(0)
    val dayUs = 86400000000L
    val dayStartMicros = p30 - java.lang.Math.floorMod(p30, dayUs)
    val dayEndMicros = dayStartMicros + dayUs
    val sfTag = new java.io.File(sfDir).getName
    val work = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/$tag"
    val workPath = new Path(work)
    val fs = workPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(workPath)) fs.delete(workPath, true)
    val splitTs = timestamp_micros(lit(splitMicros))
    val inDay = col("ts") >= timestamp_micros(lit(dayStartMicros)) &&
      col("ts") < timestamp_micros(lit(dayEndMicros))
    ev.filter(col("ts") < splitTs && !inDay).write.parquet(s"$work/base")
    ev.filter(col("ts") < splitTs && inDay && col("event_id") % 3 =!= 0)
      .withColumn("value", col("value") * 2 + 1)
      .write.parquet(s"$work/day")
    def read(s: SparkSession) =
      s.read.option("recursiveFileLookup", "true").parquet(work)
    def cfg(cache: graft.cache.QueryCache, now: Option[Long]) =
      tweak(QueryCacheConfig(cache, defaultTemporalColumn = "ts",
        overrideNowMicros = now))
    QueryCacheSession(spark, cfg(cacheFactory(), Some(splitMicros)))
      .run(q(read(spark))).collect()
    // INSERT OVERWRITE day D with the true rows, then append the tail
    fs.delete(new Path(s"$work/day"), true)
    ev.filter(col("ts") < splitTs && inDay).write.parquet(s"$work/day")
    ev.filter(col("ts") >= splitTs).write.parquet(s"$work/rest")
    ev.unpersist()
    val warmCache = cacheFactory()
    val marked = warmCache.repairRange(work, dayStartMicros, dayEndMicros)
    require(marked >= 1, s"repairRange matched no entries for $work")
    QueryCacheSession(spark, cfg(warmCache, None)).run(q(read(spark)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // no-group-by path (reference README feature 2; demo.rs:26 shape)
    "qc_incr_total" -> ((s, d) =>
      coldAppendWarm(s, d, "total") { df =>
        df.filter(col("value") > 1)
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("value")).as("sum_value"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
      }),
    // GROUP BY date_trunc path (reference README feature 1; demo.rs:24)
    "qc_incr_hourly" -> ((s, d) =>
      coldAppendWarm(s, d, "hourly") { df =>
        df.filter(col("value") > 1)
          .groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("value")).as("sum_value"),
            max(col("value")).as("max_value"))
      }),
    // durable parquet-backed state store through the same cycle: state is
    // written/read as distributed parquet, survives a fresh cache handle
    "qc_incr_durable" -> ((s, d) => {
      val cacheDir =
        s"${sys.props("java.io.tmpdir")}/graft_qc_cache/${new java.io.File(d).getName}"
      val p = new Path(cacheDir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      coldAppendWarm(s, d, "durable",
        cacheFactory = () => new graft.cache.ParquetQueryCache(cacheDir)) { df =>
        df.filter(col("value") > 1)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"), min(col("value")).as("min_value"))
      }
    }),
    // SHARED-DELTA refresh cycle: two views over the same fact table
    // refresh inside one SharedDelta cycle — the second view's append
    // read comes from the cycle's persisted delta instead of a second
    // table scan (a dashboard batch reads the append once, however many
    // tiles it feeds). The require() pins that sharing actually engaged
    // (the oracle alone would pass on a silent bypass); the oracle
    // checks both views equal vanilla SQL over the full table.
    "qc_incr_shared" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "shared")
      val cache = new MemoryQueryCache()
      val rlog = new graft.log.RecordingLog
      def qa(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("v"))
      def qb(df: DataFrame) = df
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), max(col("value")).as("v"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now, log = rlog)
      val cold = QueryCacheSession(s, cfg(Some(splitMicros)))
      cold.run(qa(s.read.parquet(work))).collect()
      cold.run(qb(s.read.parquet(work))).collect()
      appendRest()
      val warm = QueryCacheSession(s, cfg(None))
      val (ra, rb) = warm.refreshCycle {
        (warm.run(qa(s.read.parquet(work))),
          warm.run(qb(s.read.parquet(work))))
      }
      require(rlog.messages.count(
        _.contains("shared delta scan: append read served")) == 2,
        "shared delta did not engage for both views: " +
          rlog.messages.filter(_.contains("shared delta")))
      ra.withColumn("leg", lit("a")).unionByName(rb.withColumn("leg", lit("b")))
    }),
    // durable aggregate CHAIN: three runs with SMALL appends so the warm
    // commits go through putAppend (O(append) delta-partial segments,
    // below the delta-fraction compaction threshold) and the answers
    // merge the replayed chain — the oracle checks the chained answer
    // equals vanilla over the full table (O(append) pin lives in
    // IncrementalAggSpec)
    "qc_incr_durable_chain" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      def pct(p: Double) = ev.selectExpr(
        s"CAST(percentile_approx(unix_micros(ts), $p) AS LONG)")
        .first().getLong(0)
      val (t1, t2) = (pct(0.8), pct(0.9))
      val sfTag = new java.io.File(d).getName
      val work = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/durchain"
      val cacheDir =
        s"${sys.props("java.io.tmpdir")}/graft_qc_cache_chain/$sfTag"
      Seq(work, cacheDir).foreach { x =>
        val p = new Path(x)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      def cfg(now: Option[Long]) = QueryCacheConfig(
        new graft.cache.ParquetQueryCache(cacheDir),
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      def q(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
      ev.filter(col("ts") < timestamp_micros(lit(t1)))
        .write.mode("overwrite").parquet(work)
      QueryCacheSession(s, cfg(Some(t1))).run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= timestamp_micros(lit(t1)) &&
          col("ts") < timestamp_micros(lit(t2)))
        .write.mode("append").parquet(work)
      QueryCacheSession(s, cfg(Some(t2))).run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= timestamp_micros(lit(t2)))
        .write.mode("append").parquet(work)
      ev.unpersist()
      QueryCacheSession(s, cfg(None)).run(q(s.read.parquet(work)))
    }),
    // transparent optimizer-rule mode: plain DataFrame actions, no facade
    // call — the warm result is materialized before the rule is removed
    // TRANSPARENT-mode row cache: a plain agg-free df.filter(...).select
    // routes through the injected pre-CBO rule, materializes cold, and
    // warm-hits after the append — no facade call anywhere
    "qc_incr_transparent_rows" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "transrows")
      val cache = new MemoryQueryCache()
      def q() = s.read.parquet(work)
        .filter(col("value") > 50 && col("event_type") =!= "error")
        .select(col("event_id"), col("user_id"), col("value"))
      import graft.ext.QueryCacheTransparent
      try {
        QueryCacheTransparent.enable(s, graft.QueryCacheConfig(cache,
          defaultTemporalColumn = "ts", overrideNowMicros = Some(splitMicros)))
        q().collect() // cold: rows materialize through the rule
        appendRest()
        QueryCacheTransparent.configure(graft.QueryCacheConfig(cache,
          defaultTemporalColumn = "ts"))
        val warmRows = q().collect() // warm hit, still transparent
        s.createDataFrame(
          java.util.Arrays.asList(warmRows: _*), q().schema)
      } finally QueryCacheTransparent.disable(s)
    }),
    "qc_incr_transparent" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "transparent")
      val cache = new MemoryQueryCache()
      def q() = s.read.parquet(work)
        .filter(col("event_type") =!= "error")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      import graft.ext.QueryCacheTransparent
      try {
        QueryCacheTransparent.enable(s, graft.QueryCacheConfig(cache,
          defaultTemporalColumn = "ts", overrideNowMicros = Some(splitMicros)))
        q().collect() // cold, through the injected rule
        appendRest()
        QueryCacheTransparent.configure(graft.QueryCacheConfig(cache,
          defaultTemporalColumn = "ts"))
        val warmRows = q().collect() // warm hit, still transparent
        s.createDataFrame(
          java.util.Arrays.asList(warmRows: _*), q().schema)
      } finally QueryCacheTransparent.disable(s)
    }),
    // exact COUNT(DISTINCT) via set-union state — mergeable across runs
    // where the engine's expand-rewrite is not
    "qc_incr_distinct" -> ((s, d) =>
      coldAppendWarm(s, d, "distinct") { df =>
        df.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("distinct_users"),
            count(lit(1)).as("cnt"))
      }),
    // dynamic lower bound (`ts >= now() - INTERVAL …`) — the feature the
    // reference DETECTS then rejects (src/aggregate.rs:191-193,
    // README.md:131): state is cached unbounded, the bound re-applies
    // over day-bucket STARTS at answer time with now() frozen to the
    // run's (overridden) start. Both runs' nows are pinned so the warm
    // bound is a computable static timestamp the DuckDB oracle mirrors:
    // warm now = max(ts)+1s, bound = now - 20 days (mid-data, below the
    // 60% split — warm replays cached buckets it never rescanned).
    "qc_incr_dynbound" -> ((s, d) => {
      val maxUs = Tables.events(s, d)
        .agg(max(unix_micros(col("ts")))).first().getLong(0)
      coldAppendWarm(s, d, "dynbound", dynamicBounds = true,
        warmNowMicros = Some(maxUs + 1000000L)) { df =>
        df.filter(col("ts") >= expr("now() - INTERVAL 20 DAYS"))
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      }
    }),
    // REPAIR RANGES — a declared historical rewrite (INSERT OVERWRITE of
    // one day, corrected values + resurrected rows) repaired at BUCKET
    // grain: cache.repairRange marks the entry, the warm run drops ONLY
    // the state buckets covering the declared window and re-scans just
    // that window + the append (invalidateForTable would drop the entry
    // whole and re-scan ALL history). The cold state here was built over
    // a CORRUPTED copy of the day — this oracle can only pass if the
    // repair actually replaced those buckets with the rewritten rows.
    "qc_incr_repair" -> ((s, d) =>
      corruptRepairWarm(s, d, "repair") { df =>
        df.filter(col("value") > 1)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
      }),
    // TEMPORAL TWIN (withTemporalTwin): a grouped query with NO temporal
    // bucket key keeps its state at (day-bucket × keys) grain through
    // the normal machinery, and the answer re-aggregates the buckets
    // away — count via sum, sum/min/max directly, avg via sum+count with
    // vanilla Average typing. Cold → append → warm must equal vanilla
    // over the full table.
    "qc_incr_twin" -> ((s, d) =>
      coldAppendWarm(s, d, "twin",
        tweak = _.withTemporalTwin("day")) { df =>
        df.filter(col("value") > 1)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"),
            round(avg(col("value")
              .cast(org.apache.spark.sql.types.DecimalType(12, 4)))
              .cast("double"), 6).as("avg_value"))
      }),
    // DYNAMIC LOWER BOUND over a KEYS-ONLY grouping — a shape decide()
    // rejects outright (no temporal bucket to re-apply the bound over):
    // with the temporal twin it becomes (day × event_type) state whose
    // frozen bound qualifies day buckets by start at answer time, then
    // folds back per key. Both runs' nows pinned so the oracle can
    // mirror the bucket-granularity semantics exactly.
    "qc_incr_twin_dyn" -> ((s, d) => {
      val maxUs = Tables.events(s, d)
        .agg(max(unix_micros(col("ts")))).first().getLong(0)
      coldAppendWarm(s, d, "twindyn", dynamicBounds = true,
        warmNowMicros = Some(maxUs + 1000000L),
        tweak = _.withTemporalTwin("day")) { df =>
        df.filter(col("value") > 1 &&
            col("ts") >= expr("now() - INTERVAL 20 DAYS"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
            max(col("value")).as("max_value"))
      }
    }),
    // the declared rewrite against a KEYS-ONLY grouped query (no time
    // bucket to drop — the shape that otherwise rebuilds loudly): with
    // the temporal twin, state lives at (day × event_type) grain, so
    // the repair drops only the corrupted day's twin buckets and
    // re-scans that window + the append; the final re-aggregation folds
    // the repaired buckets back per key.
    "qc_incr_repair_bytype" -> ((s, d) =>
      corruptRepairWarm(s, d, "repair_bytype",
        tweak = _.withTemporalTwin("day")) { df =>
        df.filter(col("value") > 1)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
            max(col("value")).as("max_value"))
      }),
    // the same declared rewrite through GROUPING SETS: Expand NULLs the
    // bucket slot for subtotal state rows, so a plain bucket drop would
    // lose subtotals — the repair instead keeps only FULL-GRAIN state
    // rows outside the window, re-expands them into every set, and the
    // window + append re-scan flows through the query's own Expand to
    // regenerate each set's partials (the grouping-set late band's
    // machinery pointed at interior spans). An unrepaired cache keeps
    // the corrupted day in every subtotal level and hash-mismatches.
    "qc_incr_repair_rollup" -> ((s, d) =>
      corruptRepairWarm(s, d, "repair_rollup") { df =>
        df.filter(col("value") > 1)
          .rollup(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
            max(col("value")).as("max_value"))
      }),
    // the same declared rewrite through a SESSION WINDOW: sessions have
    // no fixed bucket edges to drop, so the repair derives CUTS from the
    // state's own intervals — Q = the largest instant ≤ the window start
    // strictly inside no session, C = the smallest such instant ≥ window
    // end + gap — drops every state session inside [Q, C), and re-scans
    // exactly that span alongside the append (no session straddles a
    // valid cut in either data vintage, so dropped sessions' rows are
    // precisely the re-read ones). An unrepaired cache keeps the
    // corrupted day's sessions and hash-mismatches.
    "qc_incr_repair_session" -> ((s, d) =>
      corruptRepairWarm(s, d, "repair_session") { df =>
        df.filter(col("value") > 1)
          .groupBy(session_window(col("ts"), "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
            max(col("value")).as("max_value"))
          .select(col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("event_type"), col("cnt"), col("sum_value"),
            col("max_value"))
      }),
    // the same declared rewrite against a MATERIALIZED ROW VIEW on the
    // DURABLE cache: the repair drops the view's rows inside the window
    // (raw-ts grain, no bucket alignment) and the delta scan re-reads
    // (ts >= wm OR ts ∈ window) in one pushed pass; the pending range
    // itself round-trips through a ParquetQueryCache sidecar file — the
    // warm handle here is a FRESH instance, so the mark must survive
    // storage like the state does.
    "qc_incr_repair_rows" -> ((s, d) => {
      val cacheDir = s"${sys.props("java.io.tmpdir")}/graft_qc_cache_repair/" +
        new java.io.File(d).getName
      val p = new Path(cacheDir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      corruptRepairWarm(s, d, "repair_rows",
        cacheFactory = () => new graft.cache.ParquetQueryCache(cacheDir)) { df =>
        df.filter(col("value") > 50 && col("event_type") =!= "error")
          .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      }
    }),
    // SIMPLE FILTER QUERY (no aggregate) — the reference's first roadmap
    // item (README.md:130): the row result itself is the cached state (an
    // automatically-maintained incremental materialized view); the warm
    // run replays the materialized rows and unions a pushed ts >= wm
    // delta scan of the append only (scan pin in IncrementalAggSpec).
    "qc_incr_select" -> ((s, d) =>
      coldAppendWarm(s, d, "select") { df =>
        df.filter(col("value") > 50 && col("event_type") =!= "error")
          .select(col("event_id"), col("user_id"), col("value"))
      }),
    // MV → AGGREGATE subsumption: a COLD aggregate whose input chain was
    // materialized as a row view builds its first state from (view
    // replay ∪ the view's delta) instead of scanning history — row-grain
    // identity, exact for every measure (history-skip pinned in
    // IncrementalAggSpec). The returned first-sighting aggregate is what
    // the oracle checks against the full table.
    "qc_incr_select_agg" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "selectagg")
      val cache = new MemoryQueryCache()
      def view(df: DataFrame) = df
        .filter(col("value") > 1 && col("event_type") =!= "error")
        .select(col("ts"), col("event_type"), col("value"))
      def agg(df: DataFrame) = view(df)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(view(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(view(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(agg(s.read.parquet(work)))
    }),
    // MV → aggregate COMPOSED with row subsumption: the cold aggregate's
    // chain carries a conjunct (value < 90) ABSENT from the materialized
    // view — the refilter lattice answers its cold start from the WIDER
    // warm view re-filtered, still skipping the history scan (pinned in
    // IncrementalAggSpec). The oracle checks the first-sighting answer.
    "qc_incr_select_agg_sub" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "selectaggsub")
      val cache = new MemoryQueryCache()
      def view(df: DataFrame) = df
        .filter(col("value") > 1 && col("event_type") =!= "error")
        .select(col("ts"), col("event_type"), col("value"))
      def agg(df: DataFrame) = view(df).filter(col("value") < 90)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(view(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None)).run(agg(s.read.parquet(work)))
    }),
    // ROW-VIEW REPROJECTION: the cold run materializes the FULL-WIDTH
    // filtered view (no select); the warm first sighting of a COLUMN
    // SLICE of the same filter answers from that view re-projected
    // (reproject lattice — pinned in IncrementalAggSpec with the
    // refilter composition); the oracle checks the slice's answer.
    "qc_incr_select_proj" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "selectproj")
      val cache = new MemoryQueryCache()
      def wide(df: DataFrame) = df.filter(col("value") > 50)
      def slice(df: DataFrame) = wide(df)
        .select(col("event_id"), col("user_id"), col("value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(wide(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None)).run(slice(s.read.parquet(work)))
    }),
    // banded ROW VIEW through the DURABLE cache: held-out late rows fold
    // back in via the late re-scan band, and the banded commit is
    // SEGMENT-GRAIN where the chain allows (refreshBand keeps segments
    // wholly below the floor and rewrites only the straddling tail +
    // band — the O(append + band) pin lives in IncrementalAggSpec; here
    // the oracle checks the replayed view equals vanilla over the full
    // table). Three runs build a real chain before the banded one.
    "qc_incr_select_band" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      def pct(p: Double) = ev.selectExpr(
        s"CAST(percentile_approx(unix_micros(ts), $p) AS LONG)")
        .first().getLong(0)
      val (t1, t2) = (pct(0.6), pct(0.8))
      val sfTag = new java.io.File(d).getName
      val work = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/selectband"
      val cacheDir =
        s"${sys.props("java.io.tmpdir")}/graft_qc_cache_rowband/$sfTag"
      Seq(work, cacheDir).foreach { x =>
        val p = new Path(x)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      val dayUs = 86400L * 1000000L
      val isLate = col("ts") >= timestamp_micros(lit(t2 - dayUs / 2)) &&
        col("ts") < timestamp_micros(lit(t2)) && col("event_id") % 3 === 0
      def cfg(now: Option[Long]) = QueryCacheConfig(
        new graft.cache.ParquetQueryCache(cacheDir),
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withLateRescanBand(java.time.Duration.ofDays(1))
      def q(df: DataFrame) = df.filter(col("value") > 50)
        .select(col("event_id"), col("ts"), col("value"))
      ev.filter(col("ts") < timestamp_micros(lit(t1)) && !isLate)
        .write.mode("overwrite").parquet(work)
      QueryCacheSession(s, cfg(Some(t1))).run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= timestamp_micros(lit(t1)) &&
          col("ts") < timestamp_micros(lit(t2)) && !isLate)
        .write.mode("append").parquet(work)
      QueryCacheSession(s, cfg(Some(t2))).run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= timestamp_micros(lit(t2)) || isLate)
        .write.mode("append").parquet(work)
      ev.unpersist()
      QueryCacheSession(s, cfg(None)).run(q(s.read.parquet(work)))
    }),
    // filter-query rows over a fact ⋈ DECLARED-STATIC-DIM join — the
    // incremental star-join materialized view: appended fact rows join
    // the unchanged dim in the delta and union onto the replayed rows
    // (same staleness contract as the aggregate path's static-dim joins)
    "qc_incr_select_join" -> ((s, d) =>
      coldAppendWarm(s, d, "select_join",
        staticDims = Seq("customer")) { df =>
        df.filter(col("value") > 50)
          .join(Tables.customer(s, d), df("user_id") === col("c_custkey"))
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("event_id"), col("value"), col("c_name"))
      }),
    // the same filter-query row state through the DURABLE parquet cache:
    // the warm run commits an O(append) delta SEGMENT (meta chains data
    // dirs atomically) instead of rewriting the materialized view —
    // pinned in IncrementalAggSpec; here the oracle checks the replayed
    // chain equals the vanilla filter over the full table
    "qc_incr_select_durable" -> ((s, d) => {
      val cacheDir =
        s"${sys.props("java.io.tmpdir")}/graft_qc_cache_rows/${new java.io.File(d).getName}"
      val p = new Path(cacheDir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      coldAppendWarm(s, d, "select_durable",
        cacheFactory = () => new graft.cache.ParquetQueryCache(cacheDir)) { df =>
        df.filter(col("value") > 50 && col("event_type") =!= "error")
          .select(col("event_id"), col("user_id"), col("value"))
      }
    }),
    // NO-GROUP-BY aggregate with a dynamic lower bound — the reference's
    // last unimplemented roadmap item (README.md:132), built with its own
    // sketch: an internal hour-grain bucket group makes it the supported
    // grouped dynamic-bound shape (state unbounded, frozen bound over
    // bucket starts), then a final no-group aggregate folds the buckets
    // back to one row. Warm now pinned to max(ts)+1s so the oracle can
    // state the hour-bucket-granularity bound statically.
    "qc_incr_dynbound_total" -> ((s, d) => {
      val maxUs = Tables.events(s, d)
        .agg(max(unix_micros(col("ts")))).first().getLong(0)
      coldAppendWarm(s, d, "dyntotal", dynamicBounds = true,
        warmNowMicros = Some(maxUs + 1000000L)) { df =>
        df.filter(col("value") > 1 &&
            col("ts") >= expr("now() - INTERVAL 20 DAYS"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
      }
    }),
    // sum/avg(DISTINCT) via the same set-union state as exact
    // count-distinct, summed at finalize. Exact-typed columns only: the
    // distinct sets here are integers/decimals, so the finalize fold is
    // order-independent and the oracle hash is bit-exact.
    "qc_incr_distinct_sums" -> ((s, d) =>
      coldAppendWarm(s, d, "distinct_sums") { df =>
        df.groupBy(col("event_type"))
          .agg(
            sum_distinct(col("user_id"))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0))
              .cast("long")
              .as("sum_users"),
            round(expr("avg(DISTINCT CAST(user_id AS DOUBLE))"), 6)
              .as("avg_user"),
            sum_distinct(col("value")
                .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
              .cast(org.apache.spark.sql.types.DecimalType(38, 4))
              .cast("double")
              .as("sum_distinct_values"),
            count(lit(1)).as("cnt"))
      }),
    // grouping sets: ROLLUP cached through the same cycle (state = one
    // row per grouping-set × key; the reference never handles these)
    "qc_incr_rollup" -> ((s, d) =>
      coldAppendWarm(s, d, "rollup") { df =>
        df.rollup(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      }),
    // grouping-set SUBSUMPTION (drill-down ↔ rollup): after a
    // cold→append→warm cycle of the PLAIN (day, event_type) drill-down,
    // the first-ever ROLLUP sighting is an exact-fingerprint miss but a
    // REGROUP hit — every drill-down state row re-expands through the 3
    // grouping sets (absent keys nulled, grouping id synthesized) and the
    // merge re-aggregates the subtotals; no fact row below the
    // drill-down's watermark is rescanned (zero-scan pinned in
    // IncrementalAggSpec, which also covers CUBE and GROUPING SETS
    // without the full grain). The rollup answer is what the oracle
    // checks.
    "qc_incr_regroup" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "regroup2")
      val cache = new MemoryQueryCache()
      def drill(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      def roll(df: DataFrame) = df.filter(col("value") > 1)
        .rollup(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(drill(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(drill(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(roll(s.read.parquet(work)))
    }),
    // boolean/bitwise mergeable folds (every/any, bit_and/or/xor) —
    // self-decomposing states through the cold → append → warm cycle
    "qc_incr_bits" -> ((s, d) =>
      coldAppendWarm(s, d, "bits") { df =>
        df.groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(
            bool_and(col("value") > 50).as("all_gt50"),
            bool_or(col("event_type") === "click").as("any_click"),
            bit_and(col("user_id")).as("uid_and"),
            bit_or(col("user_id")).as("uid_or"),
            bit_xor(col("user_id")).as("uid_xor"))
      }),
    // WINDOW over a cached aggregate: the splice replaces the Aggregate
    // in place, so parents re-run over the replayed state — a lag()
    // day-over-day delta (the standard dashboard shape) computes over
    // the ~30 merged state rows, never the fact table. The window adds
    // no state; only the aggregate underneath is cached.
    "qc_incr_window" -> ((s, d) =>
      coldAppendWarm(s, d, "window") { df =>
        val aggDf = df.filter(col("value") > 1)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
        aggDf
          .withColumn("prev_cnt", lag(col("cnt"), 1).over(w))
          .withColumn("delta_cnt",
            col("cnt") - coalesce(lag(col("cnt"), 1).over(w), lit(0L)))
      }),
    // EXACT percentiles through the cache cycle (the most-requested
    // dashboard aggregate after avg): mergeable run-length value
    // histogram state, finalize replays Spark's own interpolation — the
    // warm answer is exact, so the oracle hash-matches quantile_cont
    "qc_incr_percentile" -> ((s, d) =>
      coldAppendWarm(s, d, "percentile") { df =>
        df.filter(col("value") > 1)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(
            count(lit(1)).as("cnt"),
            round(expr("percentile(value, 0.5)"), 6).as("p50"),
            round(expr("percentile(value, 0.9)"), 6).as("p90"),
            round(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"),
              6).as("pd50"),
            expr("mode() WITHIN GROUP (ORDER BY value)").as("mode_v"))
      }),
    // bucket-granular SUBSUMPTION: after a cold→append→warm cycle at
    // HOUR grain, the first-ever DAY-grain sighting of the same query is
    // an exact-fingerprint miss but a REGRAIN hit — the hour state
    // replays re-truncated to days and re-aggregates through the normal
    // merge, no fact scan below the hour watermark (zero-scan pinned in
    // IncrementalAggSpec). The returned day result is what the oracle
    // checks against the full table.
    "qc_incr_regrain" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "regrain")
      val cache = new MemoryQueryCache()
      def q(grain: String, alias: String)(df: DataFrame) =
        df.filter(col("value") > 1)
          .groupBy(date_trunc(grain, col("ts")).as(alias))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
            min(col("value")).as("min_value"))
      val cold = QueryCacheSession(s, QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = Some(splitMicros)))
      cold.run(q("hour", "hour")(s.read.parquet(work))).collect()
      appendRest()
      val warmHour = QueryCacheSession(s, QueryCacheConfig(cache,
        defaultTemporalColumn = "ts"))
      warmHour.run(q("hour", "hour")(s.read.parquet(work))).collect()
      val day = QueryCacheSession(s, QueryCacheConfig(cache,
        defaultTemporalColumn = "ts"))
      day.run(q("day", "day")(s.read.parquet(work)))
    }),
    // dimension SUBSUMPTION (drill-down ↔ roll-up): after a cold→append→
    // warm cycle of the (hour, event_type) DRILL-DOWN, the first-ever
    // hour-only ROLL-UP sighting is an exact-fingerprint miss but a
    // REDIM hit — the drill-down state replays with its event_type key
    // dropped and the dimension's groups fold together through the
    // normal merge, no fact scan below the drill-down watermark
    // (zero-scan pinned in IncrementalAggSpec). The returned roll-up is
    // what the oracle checks against the full table.
    "qc_incr_redim" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "redim")
      val cache = new MemoryQueryCache()
      def drill(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def roll(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withRedimDimensions("event_type")
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(drill(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(drill(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(roll(s.read.parquet(work)))
    }),
    // filter SUBSUMPTION (slice ↔ whole): after a cold→append→warm cycle
    // of the UNFILTERED (hour, event_type) drill-down, the first-ever
    // sighting of the event_type='click' SLICE grouped by hour only is an
    // exact-fingerprint miss but a REFILTER hit — the drill-down state
    // replays filtered to the matching dim key, the key merges away, and
    // no fact row below the drill-down watermark is rescanned (zero-scan
    // pinned in IncrementalAggSpec). The returned slice is what the
    // oracle checks against the full table.
    "qc_incr_refilter" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "refilter")
      val cache = new MemoryQueryCache()
      def drill(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def slice(df: DataFrame) = df
        .filter(col("value") > 1 && col("event_type") === "click")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withRedimDimensions("event_type")
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(drill(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(drill(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(slice(s.read.parquet(work)))
    }),
    // range SUBSUMPTION (aligned time window ↔ unbounded): after a
    // cold→append→warm cycle of the UNBOUNDED hourly aggregate, the
    // first-ever sighting of the one-week WINDOW (day-aligned bounds on
    // the raw ts, so the window is a union of complete hour buckets) is
    // an exact-fingerprint miss but a RERANGE hit — the unbounded state
    // replays sliced on the bucket key, and no fact row below the
    // watermark is rescanned (zero-scan pinned in IncrementalAggSpec).
    // The returned window is what the oracle checks against the full
    // table.
    "qc_incr_rerange" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "rerange")
      val cache = new MemoryQueryCache()
      def unbounded(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def window(df: DataFrame) = df
        .filter(col("value") > 1 &&
          col("ts") >= "2024-01-08 00:00:00" && col("ts") < "2024-01-15 00:00:00")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(unbounded(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(unbounded(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(window(s.read.parquet(work)))
    }),
    // rerange with COMPENSATION SCAN (unaligned bounds): same warm
    // unbounded hourly state, but the window's bounds sit INSIDE hour
    // buckets (06:30 / 18:45). The complete interior buckets replay from
    // the sliced state; the two partial edge slivers are answered by a
    // bounded scan of the fact table restricted to the sliver ranges
    // (≤ 2 bucket-widths — parquet min/max pruning applies), partially
    // aggregated and unioned into the state before the merge. Exact for
    // every measure; the warm unaligned answer is what the oracle checks
    // against the full table.
    "qc_incr_rerange_comp" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "rerangecomp")
      val cache = new MemoryQueryCache()
      def unbounded(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def window(df: DataFrame) = df
        .filter(col("value") > 1 &&
          col("ts") >= "2024-01-08 06:30:00" && col("ts") < "2024-01-14 18:45:00")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(unbounded(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(unbounded(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(window(s.read.parquet(work)))
    }),
    // rerange compensation COMPOSED with a DYNAMIC lower bound: the warm
    // twin is the `ts >= now() − 20 days` hourly aggregate (state cached
    // unbounded, bound re-applied over bucket starts at answer time with
    // now() frozen per run); the first sighting of the same query PLUS a
    // both-ends-unaligned static window strips the static conjuncts to
    // that twin, slices the interior buckets, answers the two edge
    // slivers with a bounded compensation scan (dynamic conjunct
    // stripped — it is bucket-granular, not row-level), and re-applies
    // the frozen bound over bucket starts across replayed, sliver, and
    // delta rows alike. Both nows are pinned (warm = max(ts)+1s) so the
    // oracle can express the bucket-granularity bound statically.
    "qc_incr_dynbound_rerange" -> ((s, d) => {
      val maxUs = Tables.events(s, d)
        .agg(max(unix_micros(col("ts")))).first().getLong(0)
      val (work, splitMicros, appendRest) = splitWrite(s, d, "dynrerange")
      val cache = new MemoryQueryCache()
      def agg(df: DataFrame) = df
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def dyn(df: DataFrame) = agg(df.filter(col("value") > 1 &&
        col("ts") >= expr("now() - INTERVAL 20 DAYS")))
      def win(df: DataFrame) = agg(df.filter(col("value") > 1 &&
        col("ts") >= expr("now() - INTERVAL 20 DAYS") &&
        col("ts") >= "2024-01-08 06:30:00" &&
        col("ts") < "2024-01-14 18:45:00"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withDynamicBounds
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(dyn(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(Some(maxUs + 1000000L)))
        .run(dyn(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(Some(maxUs + 1000000L)))
        .run(win(s.read.parquet(work)))
    }),
    // hop SUBSUMPTION (sliding ↔ tumbling): after a cold→append→warm
    // cycle of the TUMBLING 15-minute aggregate, the first-ever sighting
    // of the 1-hour/15-minute SLIDING window is an exact-fingerprint miss
    // but a REHOP hit — each tumbling state row explodes into the 4 hop
    // windows that cover its bucket and the merge folds them; no fact row
    // below the tumbling watermark is rescanned (zero-scan pinned in
    // IncrementalAggSpec). One fine tumbling state serves every hopping
    // variant instead of each variant ×4-ing every appended row through
    // Expand. The returned hop series is what the oracle checks.
    "qc_incr_hopping" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "hopping")
      val cache = new MemoryQueryCache()
      def tum(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(window(col("ts"), "15 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def hop(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(tum(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(tum(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(hop(s.read.parquet(work)))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("cnt"), col("sum_value"), col("min_value"))
    }),
    // tumbling-GRAIN subsumption (coarse tumbling ↔ fine tumbling):
    // after a cold→append→warm cycle of the 15-minute TUMBLING
    // aggregate, the first-ever sighting of the 1-HOUR tumbling window
    // is an exact-fingerprint miss but a RETUMBLE hit — every 15-minute
    // state row re-buckets into the hour window that contains it
    // (epoch-aligned windows nest exactly) and the merge re-aggregates;
    // no fact row below the fine watermark is rescanned (zero-scan
    // pinned in IncrementalAggSpec). The returned hour series is what
    // the oracle checks.
    "qc_incr_retumble" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "retumble")
      val cache = new MemoryQueryCache()
      def fine(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(window(col("ts"), "15 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def coarse(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(fine(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(fine(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(coarse(s.read.parquet(work)))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("cnt"), col("sum_value"), col("min_value"))
    }),
    // window ↔ date_trunc RE-SPELLING: after a cold→append→warm cycle
    // of the date_trunc('hour') spelling, the first-ever sighting of the
    // window('1 hour') spelling of the same panel is an exact-fingerprint
    // miss but a REWINDOW hit — in a UTC session the two spellings induce
    // the identical row partition, so the trunc state re-keys to window
    // structs (null group dropped: window filters isnotnull(ts)) with no
    // re-aggregation and no fact row below the watermark rescanned
    // (zero-scan pinned in IncrementalAggSpec). The window-spelled series
    // is what the oracle checks.
    "qc_incr_rewindow" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "rewindow")
      val cache = new MemoryQueryCache()
      def dtq(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def winq(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(dtq(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(dtq(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(winq(s.read.parquet(work)))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("cnt"), col("sum_value"), col("min_value"))
    }),
    // WEEK re-spelling — the shifted-anchor case: date_trunc('week')
    // anchors MONDAY while epoch is a Thursday, so the equivalent window
    // spelling is window(ts, '7 days', '7 days', startTime='4 days').
    // Only the day-trunc spelling is ever warmed; the week-window query
    // answers by regrain (day ⊂ week) + rewindow re-key, no fact rescan.
    "qc_incr_rewindow_week" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "rewindowwk")
      val cache = new MemoryQueryCache()
      def dtq(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
      def winq(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(window(col("ts"), "7 days", "7 days", "4 days").as("w"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(dtq(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(dtq(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(winq(s.read.parquet(work)))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("cnt"), col("sum_value"), col("max_value"))
    }),
    // continuous HIGH-CARDINALITY domain through the cache cycle: a
    // per-row jitter makes every value distinct (~10k per month-group),
    // pushing the percentile state past the sketch threshold (4096), so
    // the stored state is the capped centroid digest — the query that
    // previously grew state toward maxStateRows and bailed. The warm
    // ESTIMATES are checked by RANK ENVELOPE against the full table
    // (the HLL precedent: mergeability + bounded error are the
    // contract; the digest's per-bin bound is ~0.2% of rank, checked at
    // 2%), and the emitted booleans are what the oracle matches.
    "qc_incr_percentile_sketch" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "psketch")
      val cache = new MemoryQueryCache()
      def jit(df: DataFrame) = df
        .withColumn("xv", col("value") +
          (col("event_id") % 1000000).cast("double") * lit(1e-9))
        .filter(col("value") > 1)
      def q(df: DataFrame) = jit(df)
        .groupBy(date_trunc("month", col("ts")).as("month"))
        .agg(count(lit(1)).as("cnt"),
          expr("percentile(xv, 0.5)").as("p50"),
          expr("percentile(xv, 0.9)").as("p90"))
      val cold = QueryCacheSession(s, QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = Some(splitMicros)))
      cold.run(q(s.read.parquet(work))).collect()
      appendRest()
      val warm = QueryCacheSession(s, QueryCacheConfig(cache,
        defaultTemporalColumn = "ts"))
      val est = warm.run(q(s.read.parquet(work)))
      val full = jit(s.read.parquet(work))
        .withColumn("month", date_trunc("month", col("ts")))
      val eps = 0.02
      full.join(broadcast(est), Seq("month"))
        .groupBy(col("month"), col("cnt"))
        .agg(
          sum(when(col("xv") <= col("p50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("xv") < col("p50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("xv") <= col("p90"), 1L).otherwise(0L)).as("le90"),
          sum(when(col("xv") < col("p90"), 1L).otherwise(0L)).as("lt90"),
          count(lit(1)).as("n"))
        .select(col("month"), col("cnt"),
          (col("le50") >= (lit(0.5) - eps) * col("n") &&
            col("lt50") <= (lit(0.5) + eps) * col("n")).as("p50_ok"),
          (col("le90") >= (lit(0.9) - eps) * col("n") &&
            col("lt90") <= (lit(0.9) + eps) * col("n")).as("p90_ok"))
    }),
    // per-day TOP-K through the cache cycle (heap-union state, O(k) per
    // group): the leaderboard shape — the explode above the aggregate
    // re-runs over replayed state like any other parent
    "qc_incr_topk" -> ((s, d) =>
      coldAppendWarm(s, d, "topk") { df =>
        df.filter(col("value") > 1)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(graft.functions.functions.top_k(
            struct(col("value").as("value"), col("event_id").as("event_id")),
            3).as("top"))
          .select(col("day"), explode(col("top")).as("t"))
          .select(col("day"), col("t.value").as("value"),
            col("t.event_id").as("event_id"))
      }),
    // heavy hitters THROUGH the cache: Misra-Gries summary state merged
    // with the mergeable-summaries operation. In this query the per-day
    // item domain (5 event types) stays under k=8, so the summary never
    // shrinks — cnt = ub = the exact count and the cached answer is
    // deterministic (the bounded-error regime is envelope-checked in
    // IncrementalAggSpec, the percentile-sketch precedent).
    "qc_incr_heavyhitters" -> ((s, d) =>
      coldAppendWarm(s, d, "heavyhitters") { df =>
        df.filter(col("value") > 1)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(graft.functions.functions.heavy_hitters(
            col("event_type"), 8).as("hh"))
          .select(col("day"), explode(col("hh")).as("e"))
          .select(col("day"), col("e.item").as("event_type"),
            col("e.cnt").as("cnt"), col("e.ub").as("ub"))
      }),
    // join SUBSUMPTION (fact grain ↔ dim breakdown): after a
    // cold→append→warm cycle of the PLAIN fact query grouped by
    // (day, user_id), the first-ever sighting of the fact ⋈ customer
    // breakdown by (c_mktsegment, day) is an exact-fingerprint miss but
    // a REJOIN hit — the fact-keyed state re-joins the declared-static
    // customer dim on the key, the key merges away, and no fact row
    // below the watermark is rescanned (pinned in IncrementalAggSpec).
    // One fact-grained state serves every dimension breakdown.
    "qc_incr_rejoin" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "rejoin")
      val cache = new MemoryQueryCache()
      def factQ(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      def joinQ(df: DataFrame) = df.filter(col("value") > 1)
        .join(Tables.customer(s, d), df("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withStaticDimensions("customer")
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(factQ(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(factQ(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(joinQ(s.read.parquet(work)))
    }),
    // FACTORIZED two-fact join: clicks ⋈ purchases are BOTH growing
    // tables — no static side to declare, so no single state is sound.
    // The factorized path splits the aggregate into two twin states
    // (per-user hourly click stats; per-user purchase stats), each
    // incrementally maintained under its own watermark, and a
    // state-sized combine that scales each side's counts/sums by the
    // other side's multiplicity (eager aggregation both sides). The
    // cold→append-BOTH→warm cycle's warm answer — with neither fact
    // table rescanned below its watermark (zero-scan pinned in
    // IncrementalAggSpec) — is what the oracle checks against a plain
    // join over the full tables.
    "qc_incr_factjoin" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val base = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/factjoin"
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath)) fs.delete(basePath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      def part(t: String) = ev.filter(col("event_type") === t)
        .select("ts", "user_id", "value")
      part("click").filter(col("ts") < splitTs).write.parquet(s"$base/a")
      part("purchase").filter(col("ts") < splitTs).write.parquet(s"$base/b")
      val cache = new MemoryQueryCache()
      def q(a: DataFrame, b: DataFrame) = a
        .join(b, a("user_id") === b("user_id"), "inner")
        .groupBy(date_trunc("hour", a("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"),
          dsum(a("value")).as("sum_click_value"),
          min(b("value")).as("min_purchase_value"),
          max(a("value")).as("max_click_value"),
          countDistinct(a("user_id")).as("n_users"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
        .collect()
      part("click").filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/a")
      part("purchase").filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/b")
      ev.unpersist()
      QueryCacheSession(s, cfg(None))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
    }),
    // FACTORIZED join with sum/avg(DISTINCT) measures: the twins keep
    // the same per-(join key × group) distinct sets count(DISTINCT)
    // already used, and the combine finalizes over the UNION of the
    // matched keys' sets with the single-table guarded fold — exact for
    // the integral/decimal types the single-table qc_incr_distinct_sums
    // pins, multiplicity-free so no scaling applies.
    "qc_incr_factdistinct" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val base = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/factdistinct"
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath)) fs.delete(basePath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      val aPart = ev.filter(col("event_type") === "click")
        .select("ts", "user_id", "value")
      val bPart = ev.filter(col("event_type") === "purchase")
        .selectExpr("ts", "user_id AS puid", "value AS pvalue")
      aPart.filter(col("ts") < splitTs).write.parquet(s"$base/a")
      bPart.filter(col("ts") < splitTs).write.parquet(s"$base/b")
      val cache = new MemoryQueryCache()
      def q(a: DataFrame, b: DataFrame) = a
        .join(b, a("user_id") === b("puid"), "inner")
        .groupBy(date_trunc("hour", a("ts")).as("hour"))
        .agg(
          count(lit(1)).as("cnt"),
          count_distinct(a("user_id")).as("n_users"),
          sum_distinct(a("user_id"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .cast("long").as("sum_users"),
          round(expr("avg(DISTINCT CAST(user_id AS DOUBLE))"), 6)
            .as("avg_user"),
          sum_distinct(col("pvalue")
              .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 4))
            .cast("double").as("sum_d_pvalue"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
        .collect()
      aPart.filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/a")
      bPart.filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/b")
      ev.unpersist()
      QueryCacheSession(s, cfg(None))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
    }),
    // FACTORIZED join with FILTER-clause measures: a side-pure FILTER
    // predicate commutes into its side's twin exactly like a WHERE
    // conjunct — the twin aggregate carries the FILTER itself and the
    // combine scales by the other side's multiplicity as usual. Covers
    // count(*) FILTER (reference-free measure takes the filter's side),
    // filtered sum, and a filtered min on the OTHER side.
    "qc_incr_factfilter" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val base = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/factfilter"
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath)) fs.delete(basePath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      val aPart = ev.filter(col("event_type") === "click")
        .select("ts", "user_id", "value")
      val bPart = ev.filter(col("event_type") === "purchase")
        .selectExpr("ts", "user_id", "value AS pvalue")
      aPart.filter(col("ts") < splitTs).write.parquet(s"$base/a")
      bPart.filter(col("ts") < splitTs).write.parquet(s"$base/b")
      val cache = new MemoryQueryCache()
      def q(a: DataFrame, b: DataFrame) = a
        .join(b, a("user_id") === b("user_id"), "inner")
        .groupBy(date_trunc("hour", a("ts")).as("hour"))
        .agg(
          count(lit(1)).as("cnt"),
          expr("count(*) FILTER (WHERE value > 50)").as("n_big_clicks"),
          expr("CAST(sum(CAST(value AS DECIMAL(18,4))) " +
            "FILTER (WHERE value > 20) AS DOUBLE)").as("sum_mid_click"),
          expr("min(pvalue) FILTER (WHERE pvalue > 10)")
            .as("min_big_purchase"),
          // CROSS-side pairing: purchase sum gated by a click predicate —
          // the click twin carries the filtered-multiplicity column
          expr("CAST(sum(CAST(pvalue AS DECIMAL(18,4))) " +
            "FILTER (WHERE value > 50) AS DOUBLE)").as("sum_purch_bigclick"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
        .collect()
      aPart.filter(col("ts") >= splitTs).write.mode("append").parquet(s"$base/a")
      bPart.filter(col("ts") >= splitTs).write.mode("append").parquet(s"$base/b")
      ev.unpersist()
      QueryCacheSession(s, cfg(None))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
    }),
    // FACTORIZED LEFT OUTER join with FILTER measures in BOTH
    // directions: cross-side predicates on the null-extended purchase
    // side are PROVEN NULL-INTOLERANT (null-substitution fold, the
    // EliminateOuterJoin test), so a missing-partner key's fn IS NULL
    // and every fn gate skips it — matching vanilla, whose null-extended
    // rows cannot pass `pvalue > …` either. Measures on the null-
    // extended side ride the same proof (CAST(NULL) is NULL — state-
    // grain null-extension equals row-grain).
    "qc_incr_factfilter_outer" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val base = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/factfiltout"
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath)) fs.delete(basePath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      val aPart = ev.filter(col("event_type") === "click")
        .select("ts", "user_id", "value")
      val bPart = ev.filter(col("event_type") === "purchase")
        .selectExpr("ts", "user_id AS puid", "value AS pvalue")
      aPart.filter(col("ts") < splitTs).write.parquet(s"$base/a")
      bPart.filter(col("ts") < splitTs).write.parquet(s"$base/b")
      val cache = new MemoryQueryCache()
      def q(a: DataFrame, b: DataFrame) = a
        .join(b, a("user_id") === b("puid"), "left_outer")
        .groupBy(date_trunc("hour", a("ts")).as("hour"))
        .agg(
          count(lit(1)).as("cnt"),
          expr("CAST(sum(CAST(value AS DECIMAL(18,4))) " +
            "FILTER (WHERE pvalue > 10) AS DOUBLE)").as("sum_click_bigp"),
          expr("min(value) FILTER (WHERE pvalue > 50)").as("min_click_bigp"),
          expr("CAST(sum(CAST(pvalue AS DECIMAL(18,4))) " +
            "FILTER (WHERE value > 20) AS DOUBLE)").as("sum_purch_midclick"),
          expr("count(*) FILTER (WHERE pvalue > 50)").as("n_bigp"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
        .collect()
      aPart.filter(col("ts") >= splitTs).write.mode("append").parquet(s"$base/a")
      bPart.filter(col("ts") >= splitTs).write.mode("append").parquet(s"$base/b")
      ev.unpersist()
      QueryCacheSession(s, cfg(None))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
    }),
    // OUTER-JOIN DEMOTION (Catalyst's EliminateOuterJoin applied inside
    // the factorization, which sees the ANALYZED plan): a LEFT OUTER
    // join under a null-REJECTING WHERE conjunct on the null-extended
    // side is plan-equivalent to the INNER join — the conjunct drops
    // every null-extended row — so it demotes, the conjunct commutes
    // into the purchase twin like any inner-side filter, and the demoted
    // spelling SHARES twin states with the inner spelling (warm-hit
    // pinned in IncrementalAggSpec).
    "qc_incr_factdemote" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val base = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/factdemote"
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath)) fs.delete(basePath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      val aPart = ev.filter(col("event_type") === "click")
        .select("ts", "user_id", "value")
      val bPart = ev.filter(col("event_type") === "purchase")
        .selectExpr("ts AS pts", "user_id AS puid", "value AS pvalue")
      aPart.filter(col("ts") < splitTs).write.parquet(s"$base/a")
      bPart.filter(col("pts") < splitTs).write.parquet(s"$base/b")
      val cache = new MemoryQueryCache()
      def q(a: DataFrame, b: DataFrame) = a
        .join(b, a("user_id") === b("puid"), "left_outer")
        .filter(col("pvalue") > 10)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(
          count(lit(1)).as("cnt"),
          expr("CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)")
            .as("sum_click_value"),
          min(col("pvalue")).as("min_purchase_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
        .collect()
      aPart.filter(col("ts") >= splitTs).write.mode("append").parquet(s"$base/a")
      bPart.filter(col("pts") >= splitTs).write.mode("append").parquet(s"$base/b")
      ev.unpersist()
      QueryCacheSession(s, cfg(None))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
    }),
    // FACTORIZED join with a DECIMAL avg: the twin keeps the exact
    // decimal sum (same contract as the single-table Decompose path) and
    // the combine's division is cast back to Spark's decimal avg type —
    // previously this measure bailed the whole factorization.
    "qc_incr_factdecavg" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val base = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/factdecavg"
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath)) fs.delete(basePath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      def part(t: String) = ev.filter(col("event_type") === t)
        .select("ts", "user_id", "value")
      part("click").filter(col("ts") < splitTs).write.parquet(s"$base/a")
      part("purchase").filter(col("ts") < splitTs).write.parquet(s"$base/b")
      val cache = new MemoryQueryCache()
      def q(a: DataFrame, b: DataFrame) = a
        .join(b, a("user_id") === b("user_id"), "inner")
        .groupBy(date_trunc("hour", a("ts")).as("hour"))
        .agg(
          count(lit(1)).as("cnt"),
          round(avg(a("value").cast("decimal(12,4)")).cast("double"), 6)
            .as("avg_click_value"),
          dsum(b("value")).as("sum_purchase_value"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
        .collect()
      part("click").filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/a")
      part("purchase").filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/b")
      ev.unpersist()
      QueryCacheSession(s, cfg(None))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
    }),
    // FACTORIZED SEMI join (EXISTS over two growing tables): hourly click
    // stats restricted to users with a BIG purchase — multiplicity-free,
    // so the per-(user, hour) click state passes through unscaled and the
    // purchase twin is pure filtered key membership. Both tables append
    // between runs; warm answer rescans nothing below the watermarks.
    "qc_incr_factsemi" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val base = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/factsemi"
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath)) fs.delete(basePath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      def part(t: String) = ev.filter(col("event_type") === t)
        .select("ts", "user_id", "value")
      part("click").filter(col("ts") < splitTs).write.parquet(s"$base/a")
      part("purchase").filter(col("ts") < splitTs).write.parquet(s"$base/b")
      val cache = new MemoryQueryCache()
      def q(a: DataFrame, b: DataFrame) = {
        val bf = b.filter(col("value") > 50)
        a.join(bf, a("user_id") === bf("user_id"), "left_semi")
          .groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("cnt"),
            dsum(col("value")).as("sum_click_value"),
            countDistinct(col("user_id")).as("n_users"))
      }
      def run(now: Option[Long]) = QueryCacheSession(s, QueryCacheConfig(
          cache, defaultTemporalColumn = "ts", overrideNowMicros = now))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
      run(Some(splitMicros)).collect()
      part("click").filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/a")
      part("purchase").filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/b")
      ev.unpersist()
      run(None)
    }),
    // FACTORIZED LEFT OUTER join: hourly click stats with per-user
    // purchase enrichment where some click users have NO purchases —
    // the combine join carries the outer type, so a click-side state row
    // without a purchase partner survives null-extended (its purchase
    // measures NULL, its multiplicity coalesced to 1), exactly matching
    // the vanilla null-extension. Both tables append between runs; warm
    // answer rescans nothing below the watermarks.
    "qc_incr_factouter" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val base = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/factouter"
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath)) fs.delete(basePath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      def part(t: String) = ev.filter(col("event_type") === t)
        .select("ts", "user_id", "value")
      part("click").filter(col("ts") < splitTs).write.parquet(s"$base/a")
      part("purchase").filter(col("ts") < splitTs).write.parquet(s"$base/b")
      val cache = new MemoryQueryCache()
      def q(a: DataFrame, b: DataFrame) = a
        .join(b, a("user_id") === b("user_id"), "left_outer")
        .groupBy(date_trunc("hour", a("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"),
          dsum(a("value")).as("sum_click_value"),
          min(b("value")).as("min_purchase_value"),
          count(b("value")).as("n_purchase_vals"),
          countDistinct(a("user_id")).as("n_users"))
      def run(now: Option[Long]) = QueryCacheSession(s, QueryCacheConfig(
          cache, defaultTemporalColumn = "ts", overrideNowMicros = now))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
      run(Some(splitMicros)).collect()
      part("click").filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/a")
      part("purchase").filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/b")
      ev.unpersist()
      run(None)
    }),
    // RECURSIVE factorization over a join TREE: clicks ⋈ purchases ⋈
    // signups, all three growing. The (clicks ⋈ purchases) twin is
    // itself an aggregate over an inner equi-join, so the factorization
    // re-enters one level down — three leaf states, two state-sized
    // combines, appends to any table absorbed by that leaf's delta alone.
    "qc_incr_factjoin3" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val base = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/factjoin3"
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath)) fs.delete(basePath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      def part(t: String) = ev.filter(col("event_type") === t)
        .select("ts", "user_id", "value")
      Seq("click" -> "a", "purchase" -> "b", "signup" -> "c").foreach {
        case (t, sub) =>
          part(t).filter(col("ts") < splitTs).write.parquet(s"$base/$sub")
      }
      val cache = new MemoryQueryCache()
      def q(a: DataFrame, b: DataFrame, c: DataFrame) = a
        .join(b, a("user_id") === b("user_id"), "inner")
        .join(c, a("user_id") === c("user_id"), "inner")
        .groupBy(date_trunc("day", a("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"),
          dsum(a("value")).as("sum_click_value"),
          min(c("value")).as("min_signup_value"))
      def run(now: Option[Long]) = QueryCacheSession(s, QueryCacheConfig(
          cache, defaultTemporalColumn = "ts", overrideNowMicros = now))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b"),
          s.read.parquet(s"$base/c")))
      run(Some(splitMicros)).collect()
      Seq("click" -> "a", "purchase" -> "b", "signup" -> "c").foreach {
        case (t, sub) => part(t).filter(col("ts") >= splitTs)
          .write.mode("append").parquet(s"$base/$sub")
      }
      ev.unpersist()
      run(None)
    }),
    // measure SUBSUMPTION (panel ↔ single stat): after a cold→append→warm
    // cycle of the full (cnt, sum, min) hourly panel, the first-ever
    // sighting of the count-only variant is an exact-fingerprint miss but
    // a REMEASURE hit — the warm entry's state columns for count are
    // projected out (byte-identical to what this query would have
    // captured; no re-aggregation at all) and no fact row below the
    // panel's watermark is rescanned (zero-scan pinned in
    // IncrementalAggSpec). The count-only answer is what the oracle
    // checks against the full table.
    "qc_incr_remeasure" -> ((s, d) => {
      val (work, splitMicros, appendRest) = splitWrite(s, d, "remeasure")
      val cache = new MemoryQueryCache()
      def panel(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"))
      def cntOnly(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"))
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(panel(s.read.parquet(work))).collect()
      appendRest()
      QueryCacheSession(s, cfg(None))
        .run(panel(s.read.parquet(work))).collect()
      QueryCacheSession(s, cfg(None)).run(cntOnly(s.read.parquet(work)))
    }),
    // FILTER (WHERE …) across the whitelist (round 8): the predicate
    // folds into each state's partial/unit by null-masking data children —
    // conditional dashboard aggregates cache like their plain forms
    "qc_incr_filter" -> ((s, d) =>
      coldAppendWarm(s, d, "filteragg") { df =>
        df.groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(
            count(lit(1)).as("cnt"),
            expr("CAST(sum(CAST(value AS DECIMAL(18,4))) " +
              "FILTER (WHERE event_type = 'click') AS DOUBLE)").as("s_click"),
            expr("count(*) FILTER (WHERE value > 50)").as("n_gt50"),
            round(expr("avg(value) FILTER (WHERE event_type <> 'click')"), 6)
              .as("a_rest"),
            expr("min(value) FILTER (WHERE user_id % 2 = 0)").as("mn_even"),
            expr("count(DISTINCT user_id) FILTER (WHERE event_type = 'view')")
              .as("u_view"),
            round(expr("percentile(value, 0.5) FILTER (WHERE value > 10)"), 6)
              .as("p50_gt10"))
      }),
    // WEIGHTED percentile (per-row frequency) through the cache cycle:
    // the run-length histogram holds the expanded multiset exactly
    "qc_incr_wpercentile" -> ((s, d) =>
      coldAppendWarm(s, d, "wpercentile") { df =>
        df.filter(col("value") > 1)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(
            count(lit(1)).as("cnt"),
            round(expr("percentile(value, 0.5, pmod(user_id, 3) + 1)"), 6)
              .as("wp50"),
            round(expr("percentile(value, 0.9, pmod(user_id, 3) + 1)"), 6)
              .as("wp90"))
      }),
    // count_if + the full regr_* family (raw-sums pair state; replacements
    // normalized pre-ReplaceExpressions so the facade path caches them)
    "qc_incr_regr" -> ((s, d) =>
      coldAppendWarm(s, d, "regr") { df =>
        df.filter(col("value") > 1)
          .groupBy(col("event_type"))
          .agg(
            expr("count_if(value > 50)").as("ci"),
            expr("regr_count(value, CAST(user_id AS DOUBLE))").as("rn"),
            round(expr("regr_avgx(value, CAST(user_id AS DOUBLE))"), 6).as("rax"),
            round(expr("regr_avgy(value, CAST(user_id AS DOUBLE))"), 6).as("ray"),
            round(expr("regr_slope(value, CAST(user_id AS DOUBLE))"), 8).as("rs"),
            round(expr("regr_intercept(value, CAST(user_id AS DOUBLE))"), 6).as("ri"),
            round(expr("regr_r2(value, CAST(user_id AS DOUBLE))"), 8).as("r2"))
      }),
    // skewness/kurtosis via mergeable power sums; the oracle replays the
    // engine's population-moment formulas (DuckDB's own skewness/kurtosis
    // are the BIAS-CORRECTED sample forms — deliberately not used)
    "qc_incr_moments" -> ((s, d) =>
      coldAppendWarm(s, d, "moments") { df =>
        df.filter(col("value") > 1)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            round(skewness(col("value")), 6).as("sk"),
            round(kurtosis(col("value")), 6).as("ku"))
      }),
    // statistical aggregates (corr/covar via raw-sums state) and ordered
    // last (max_by over the temporal column) through the cache cycle
    "qc_incr_stats" -> ((s, d) =>
      coldAppendWarm(s, d, "stats") { df =>
        df.filter(col("value") > 1)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(
            count(lit(1)).as("cnt"),
            round(corr(col("value"), col("user_id").cast("double")), 6)
              .as("corr_vu"),
            round(covar_samp(col("value"), col("user_id").cast("double")), 4)
              .as("cov_vu"),
            round(covar_pop(col("value"), col("user_id").cast("double")), 4)
              .as("covp_vu"),
            max_by(col("value"), col("ts")).as("last_value"))
      }),
    // stable non-temporal predicate + non-temporal + temporal group mix
    "qc_incr_by_type" -> ((s, d) =>
      coldAppendWarm(s, d, "by_type") { df =>
        df.filter(col("event_type").isin("click", "view", "error"))
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).as("day"))
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("value")).as("sum_value"))
      }),
    // star-schema rollup over a DECLARED-STATIC dimension join (opt-in;
    // the reference wraps joins with no check, src/aggregate.rs:130-135):
    // appended fact rows join the unchanged customer dim — broadcast by
    // Catalyst, it is ~KBs against a 100 TB fact — and merge into state;
    // the watermark bounds only the fact side
    "qc_incr_join" -> ((s, d) =>
      coldAppendWarm(s, d, "join", staticDims = Seq("customer")) { df =>
        df.join(Tables.customer(s, d), df("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"),
            date_trunc("day", col("ts")).as("day"))
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("value")).as("sum_value"))
      }),
    // LEFT join with the fact on the outer side: unmatched fact rows keep
    // a NULL-extended dim (grouped under the NULL segment) — merge-safe
    // because an appended fact row only ADDS output rows; the dim on the
    // outer side is the rejected direction (see IncrementalAggSpec)
    "qc_incr_leftjoin" -> ((s, d) =>
      coldAppendWarm(s, d, "leftjoin", staticDims = Seq("customer")) { df =>
        // dim restricted to even keys so odd-user fact rows are genuinely
        // unmatched — the NULL-extended segment group is part of the
        // oracle-checked result, not a vacuous branch
        df.join(Tables.customer(s, d).filter(col("c_custkey") % 2 === 0),
            df("user_id") === col("c_custkey"), "left_outer")
          .groupBy(col("c_mktsegment"),
            date_trunc("day", col("ts")).as("day"))
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("value")).as("sum_value"))
      }),
    // UNION ALL of the appending fact stream with a DECLARED-STATIC
    // backfill table (orders as a historical snapshot): the cold state
    // captures the static branch in full, appended fact rows merge
    // through the watermark band, and the warm delta replaces the static
    // branch with an empty relation — at 100 TB the warm run re-reads
    // only the appended fact files, never the backfill
    "qc_incr_union" -> ((s, d) =>
      coldAppendWarm(s, d, "union", staticDims = Seq("orders")) { df =>
        df.select(col("ts"), col("value"))
          .union(Tables.orders(s, d).select(
            col("o_orderdate").cast("timestamp").as("ts"),
            col("o_totalprice").as("value")))
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("value")).as("sum_value"))
      }),
    // the late re-scan band over TUMBLING-WINDOW buckets: same held-out
    // late slice as qc_incr_lateband, but the bucket key is a window
    // struct — the band floors with the window arithmetic and drops
    // state rows on the struct's start field
    "qc_incr_lateband_win" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val work = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/latebandwin"
      val workPath = new Path(work)
      val fs = workPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(workPath)) fs.delete(workPath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      val dayUs = 86400L * 1000000L
      val isLate = col("ts") >= timestamp_micros(lit(splitMicros - 2 * dayUs)) &&
        col("ts") < splitTs && col("event_id") % 3 === 0
      ev.filter(col("ts") < splitTs && !isLate)
        .write.mode("overwrite").parquet(work)
      val cache = new MemoryQueryCache()
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withLateRescanBand(java.time.Duration.ofDays(3))
      def q(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(window(col("ts"), "6 hours").as("w"))
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("cnt"), col("sum_value"), col("max_value"))
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= splitTs || isLate)
        .write.mode("append").parquet(work)
      ev.unpersist()
      QueryCacheSession(s, cfg(None)).run(q(s.read.parquet(work)))
    }),
    // SESSION-WINDOW incremental caching: the session_window group key
    // flows through the machinery as an opaque bucket whose attribute
    // carries spark.sessionWindow metadata — so the partial-state and
    // warm-merge aggregations plan Spark's own MergingSessions, merging
    // OVERLAPPING session rows instead of equal keys. State = merged
    // sessions (closed ones plus the open frontier); appended rows enter
    // as provisional (ts, ts+gap) rows and chain onto the frontier
    // session exactly like the vanilla plan (session merge is associative
    // over interval-tagged partials). The oracle reproduces Spark's
    // session semantics with lag/cumulative-sum sessionization.
    "qc_incr_session" -> ((s, d) =>
      coldAppendWarm(s, d, "session") { df =>
        df.filter(col("value") > 1)
          .groupBy(session_window(col("ts"), "30 minutes"), col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("value")).as("sum_value"),
            max(col("value")).as("max_value"))
          .select(
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("event_type"), col("cnt"), col("sum_value"),
            col("max_value"))
      }),
    // LATE-DATA re-scan band: a slice of rows with event time BELOW the
    // cold run's watermark (every third event in the 2 days before the
    // split) is HELD OUT of the cold write and lands together with the
    // fresh append — the reference's S1 contract silently loses such rows
    // forever. The warm run declares a 3-day tolerance
    // (withLateRescanBand): its effective watermark drops to the day
    // floor of (wm − 3d), the band's day buckets are dropped from state
    // and re-scanned, so the late rows are folded in and the answer
    // equals vanilla over the full table — which is what the oracle
    // checks. max(value) included: bucket REPLACEMENT is exact even for
    // non-subtractable measures.
    "qc_incr_lateband" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val work = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/lateband"
      val workPath = new Path(work)
      val fs = workPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(workPath)) fs.delete(workPath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      val dayUs = 86400L * 1000000L
      val isLate = col("ts") >= timestamp_micros(lit(splitMicros - 2 * dayUs)) &&
        col("ts") < splitTs && col("event_id") % 3 === 0
      ev.filter(col("ts") < splitTs && !isLate)
        .write.mode("overwrite").parquet(work)
      val cache = new MemoryQueryCache()
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withLateRescanBand(java.time.Duration.ofDays(3))
      def q(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= splitTs || isLate)
        .write.mode("append").parquet(work)
      ev.unpersist()
      QueryCacheSession(s, cfg(None)).run(q(s.read.parquet(work)))
    }),
    // late re-scan band through the DURABLE cache with aggregate CHAINS:
    // the banded warm runs commit at SEGMENT grain (refreshBand — kept
    // segments verbatim, straddlers settle their below-floor partials,
    // the band re-read is the new head; O(band + append) per run, pinned
    // in IncrementalAggSpec). Held-out late rows inside the band fold
    // back in; the oracle checks the final chained answer over the full
    // table.
    "qc_incr_lateband_chain" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      def pct(p: Double) = ev.selectExpr(
        s"CAST(percentile_approx(unix_micros(ts), $p) AS LONG)")
        .first().getLong(0)
      val (t1, t2) = (pct(0.6), pct(0.8))
      val sfTag = new java.io.File(d).getName
      val work = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/latebandchain"
      val cacheDir =
        s"${sys.props("java.io.tmpdir")}/graft_qc_cache_lbchain/$sfTag"
      Seq(work, cacheDir).foreach { x =>
        val p = new Path(x)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      val dayUs = 86400L * 1000000L
      val isLate = col("ts") >= timestamp_micros(lit(t2 - dayUs / 2)) &&
        col("ts") < timestamp_micros(lit(t2)) && col("event_id") % 3 === 0
      def cfg(now: Option[Long]) = QueryCacheConfig(
        new graft.cache.ParquetQueryCache(cacheDir),
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withLateRescanBand(java.time.Duration.ofDays(1))
      def q(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
      ev.filter(col("ts") < timestamp_micros(lit(t1)) && !isLate)
        .write.mode("overwrite").parquet(work)
      QueryCacheSession(s, cfg(Some(t1))).run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= timestamp_micros(lit(t1)) &&
          col("ts") < timestamp_micros(lit(t2)) && !isLate)
        .write.mode("append").parquet(work)
      QueryCacheSession(s, cfg(Some(t2))).run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= timestamp_micros(lit(t2)) || isLate)
        .write.mode("append").parquet(work)
      ev.unpersist()
      QueryCacheSession(s, cfg(None)).run(q(s.read.parquet(work)))
    }),
    // late re-scan band COMPOSED with a FACTORIZED two-fact join: the
    // band applies PER TWIN — the click twin groups by (user × hour), so
    // its state bucket-replaces and the held-out late CLICK rows fold
    // back in; the purchase twin is keyed by join key alone (no temporal
    // bucket) and skips the band loudly — late partner-side rows keep
    // the documented S1 residual, so the oracle holds out late rows on
    // the TEMPORAL side only (spec pins the per-twin banded/skip split).
    "qc_incr_lateband_fact" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val base = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/latebandfact"
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(basePath)) fs.delete(basePath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      val dayUs = 86400L * 1000000L
      val isLate = col("ts") >= timestamp_micros(lit(splitMicros - 2 * dayUs)) &&
        col("ts") < splitTs && col("event_id") % 3 === 0
      def part(t: String) = ev.filter(col("event_type") === t)
        .select("ts", "user_id", "value")
      part("click").filter(col("ts") < splitTs && !isLate)
        .write.parquet(s"$base/a")
      part("purchase").filter(col("ts") < splitTs).write.parquet(s"$base/b")
      val cache = new MemoryQueryCache()
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withLateRescanBand(java.time.Duration.ofDays(3))
      def q(a: DataFrame, b: DataFrame) = a
        .join(b, a("user_id") === b("user_id"), "inner")
        .groupBy(date_trunc("hour", a("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"),
          dsum(a("value")).as("sum_click_value"),
          min(b("value")).as("min_purchase_value"))
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
        .collect()
      part("click").filter(col("ts") >= splitTs || isLate)
        .write.mode("append").parquet(s"$base/a")
      part("purchase").filter(col("ts") >= splitTs)
        .write.mode("append").parquet(s"$base/b")
      ev.unpersist()
      QueryCacheSession(s, cfg(None))
        .run(q(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
    }),
    // late re-scan band over SESSION WINDOWS: the floor cannot be a fixed
    // instant (a frontier session ending inside the band may start before
    // it) — the executor derives the cut from the STATE's own intervals:
    // the largest point at/below (wm − band) inside no session, drops
    // every session ending after it, and re-scans from it. The held-out
    // late slice (rows below the cold watermark) lands with the fresh
    // append and must merge into/extend the re-read sessions so warm ==
    // vanilla over the full table, which is what the oracle checks.
    "qc_incr_lateband_session" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val work = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/latebandsess"
      val workPath = new Path(work)
      val fs = workPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(workPath)) fs.delete(workPath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      val dayUs = 86400L * 1000000L
      val isLate = col("ts") >= timestamp_micros(lit(splitMicros - 2 * dayUs)) &&
        col("ts") < splitTs && col("event_id") % 3 === 0
      ev.filter(col("ts") < splitTs && !isLate)
        .write.mode("overwrite").parquet(work)
      val cache = new MemoryQueryCache()
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withLateRescanBand(java.time.Duration.ofDays(3))
      def q(df: DataFrame) = df.filter(col("value") > 1)
        .groupBy(session_window(col("ts"), "30 minutes"), col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
        .select(
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("event_type"), col("cnt"), col("sum_value"),
          col("max_value"))
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= splitTs || isLate)
        .write.mode("append").parquet(work)
      ev.unpersist()
      QueryCacheSession(s, cfg(None)).run(q(s.read.parquet(work)))
    }),
    // late re-scan band COMPOSED with a DYNAMIC lower bound: the band
    // lowers the effective watermark to the day floor of (wm − band),
    // drops those state buckets and re-reads them (folding in the
    // held-out late slice), while the frozen now()-bound re-applies over
    // bucket starts at answer time across replayed and re-read buckets
    // alike. Both nows pinned (warm = max(ts)+1s) so the oracle is static.
    "qc_incr_lateband_dyn" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val maxUs = ev.agg(max(unix_micros(col("ts")))).first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val work = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/latebanddyn"
      val workPath = new Path(work)
      val fs = workPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(workPath)) fs.delete(workPath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      val dayUs = 86400L * 1000000L
      val isLate = col("ts") >= timestamp_micros(lit(splitMicros - 2 * dayUs)) &&
        col("ts") < splitTs && col("event_id") % 3 === 0
      ev.filter(col("ts") < splitTs && !isLate)
        .write.mode("overwrite").parquet(work)
      val cache = new MemoryQueryCache()
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withDynamicBounds
        .withLateRescanBand(java.time.Duration.ofDays(3))
      def q(df: DataFrame) = df
        .filter(col("value") > 1 &&
          col("ts") >= expr("now() - INTERVAL 25 DAYS"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= splitTs || isLate)
        .write.mode("append").parquet(work)
      ev.unpersist()
      QueryCacheSession(s, cfg(Some(maxUs + 1000000L)))
        .run(q(s.read.parquet(work)))
    }),
    // late re-scan band over GROUPING SETS: Expand NULLs the day slot in
    // subtotal rows, so the band keeps only FULL-GRAIN state rows below
    // the floor and re-expands them into every grouping set; the delta
    // re-scan regenerates all sets' partials for the dropped buckets'
    // rows (including the held-out late slice). Warm rollup == vanilla
    // rollup over the full table — subtotals and grand total included.
    "qc_incr_lateband_rollup" -> ((s, d) => {
      val ev = Tables.events(s, d).cache()
      val splitMicros = ev
        .selectExpr("CAST(percentile_approx(unix_micros(ts), 0.6) AS LONG)")
        .first().getLong(0)
      val sfTag = new java.io.File(d).getName
      val work = s"${sys.props("java.io.tmpdir")}/graft_qc/$sfTag/latebandroll"
      val workPath = new Path(work)
      val fs = workPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(workPath)) fs.delete(workPath, true)
      val splitTs = timestamp_micros(lit(splitMicros))
      val dayUs = 86400L * 1000000L
      val isLate = col("ts") >= timestamp_micros(lit(splitMicros - 2 * dayUs)) &&
        col("ts") < splitTs && col("event_id") % 3 === 0
      ev.filter(col("ts") < splitTs && !isLate)
        .write.mode("overwrite").parquet(work)
      val cache = new MemoryQueryCache()
      def cfg(now: Option[Long]) = QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = now)
        .withLateRescanBand(java.time.Duration.ofDays(3))
      def q(df: DataFrame) = df.filter(col("value") > 1)
        .rollup(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("value")).as("sum_value"),
          max(col("value")).as("max_value"))
      QueryCacheSession(s, cfg(Some(splitMicros)))
        .run(q(s.read.parquet(work))).collect()
      ev.filter(col("ts") >= splitTs || isLate)
        .write.mode("append").parquet(work)
      ev.unpersist()
      QueryCacheSession(s, cfg(None)).run(q(s.read.parquet(work)))
    })
  )

  val oracle: Map[String, String] = Map(
    "qc_incr_lateband_session" ->
      """WITH m AS (
           SELECT event_type, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY event_type ORDER BY ts)
                       < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
           FROM events WHERE value > 1
         ), g AS (
           SELECT *, sum(brk) OVER (PARTITION BY event_type ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS sid
           FROM m
         )
         SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM g GROUP BY event_type, sid""",
    // the dynamic bound is day-bucket-granular; late rows must be folded
    // in by the band, so the oracle is simply the full-table answer
    "qc_incr_lateband_dyn" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events
         WHERE value > 1 AND CAST(date_trunc('day', ts) AS TIMESTAMP) >=
           (SELECT max(ts) + INTERVAL 1 SECOND - INTERVAL 25 DAY
            FROM events)
         GROUP BY 1""",
    "qc_incr_lateband_rollup" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events WHERE value > 1
         GROUP BY ROLLUP (date_trunc('day', ts), event_type)""",
    "qc_incr_total" ->
      """SELECT count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
         FROM events WHERE value > 1""",
    "qc_incr_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_durable" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           min(value) AS min_value
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_shared" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v,
           'a' AS leg
         FROM events WHERE value > 1 GROUP BY 1
         UNION ALL
         SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt, max(value) AS v, 'b' AS leg
         FROM events GROUP BY 1""",
    "qc_incr_transparent" ->
      """SELECT date_trunc('hour', ts) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events WHERE event_type <> 'error'
         GROUP BY 1""",
    "qc_incr_distinct" ->
      """SELECT event_type,
           count(DISTINCT user_id) AS distinct_users,
           count(*) AS cnt
         FROM events GROUP BY 1""",
    // the warm run's frozen now is max(ts)+1s, so the bucket-granularity
    // bound is the static timestamp below — buckets qualify by their START
    "qc_incr_dynbound" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events
         WHERE CAST(date_trunc('day', ts) AS TIMESTAMP) >=
           (SELECT max(ts) + INTERVAL 1 SECOND - INTERVAL 20 DAY FROM events)
         GROUP BY 1""",
    "qc_incr_durable_chain" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_lateband_chain" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_repair" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_twin" ->
      """SELECT event_type, count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value,
           round(CAST(avg(CAST(value AS DECIMAL(12,4))) AS DOUBLE), 6)
             AS avg_value
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_twin_dyn" ->
      """SELECT event_type, count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events
         WHERE value > 1 AND CAST(date_trunc('day', ts) AS TIMESTAMP) >=
           (SELECT max(ts) + INTERVAL 1 SECOND - INTERVAL 20 DAY
            FROM events)
         GROUP BY 1""",
    "qc_incr_repair_bytype" ->
      """SELECT event_type, count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_repair_rollup" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events WHERE value > 1
         GROUP BY ROLLUP (date_trunc('day', ts), event_type)""",
    "qc_incr_repair_session" ->
      """WITH m AS (
           SELECT event_type, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY event_type ORDER BY ts)
                       < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
           FROM events WHERE value > 1
         ), g AS (
           SELECT *, sum(brk) OVER (PARTITION BY event_type ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS sid
           FROM m
         )
         SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM g GROUP BY event_type, sid""",
    "qc_incr_repair_rows" ->
      """SELECT event_id, ts, user_id, value FROM events
         WHERE value > 50 AND event_type <> 'error'""",
    "qc_incr_select" ->
      """SELECT event_id, user_id, value FROM events
         WHERE value > 50 AND event_type <> 'error'""",
    "qc_incr_transparent_rows" ->
      """SELECT event_id, user_id, value FROM events
         WHERE value > 50 AND event_type <> 'error'""",
    "qc_incr_select_durable" ->
      """SELECT event_id, user_id, value FROM events
         WHERE value > 50 AND event_type <> 'error'""",
    "qc_incr_select_join" ->
      """SELECT event_id, value, c_name
         FROM events JOIN customer ON user_id = c_custkey
         WHERE value > 50 AND c_mktsegment = 'BUILDING'""",
    "qc_incr_select_agg" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events
         WHERE value > 1 AND event_type <> 'error'
         GROUP BY 1, 2""",
    "qc_incr_select_agg_sub" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events
         WHERE value > 1 AND value < 90 AND event_type <> 'error'
         GROUP BY 1, 2""",
    // the banded row view folds every held-out late row back in, so the
    // replayed chain equals the vanilla filter over the full table
    "qc_incr_select_band" ->
      """SELECT event_id, ts, value FROM events WHERE value > 50""",
    "qc_incr_select_proj" ->
      """SELECT event_id, user_id, value FROM events WHERE value > 50""",
    // late rows held out on the TEMPORAL (click) side only — the click
    // twin's band folds them in; purchase appends are all >= the
    // watermark and absorb through the normal delta
    "qc_incr_lateband_fact" ->
      """SELECT CAST(date_trunc('hour', a.ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(a.value AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_click_value,
           min(b.value) AS min_purchase_value
         FROM (SELECT ts, user_id, value FROM events
               WHERE event_type = 'click') a
         JOIN (SELECT ts, user_id, value FROM events
               WHERE event_type = 'purchase') b
           ON a.user_id = b.user_id
         GROUP BY 1""",
    // bound at the internal HOUR grain's bucket starts (the no-group
    // rewrite's documented bucket-granularity semantics), now = max+1s
    "qc_incr_dynbound_total" ->
      """SELECT count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
         FROM events
         WHERE value > 1 AND CAST(date_trunc('hour', ts) AS TIMESTAMP) >=
           (SELECT max(ts) + INTERVAL 1 SECOND - INTERVAL 20 DAY
            FROM events)""",
    "qc_incr_distinct_sums" ->
      """SELECT event_type,
           CAST(sum(DISTINCT user_id) AS BIGINT) AS sum_users,
           round(avg(DISTINCT CAST(user_id AS DOUBLE)), 6) AS avg_user,
           CAST(sum(DISTINCT CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_distinct_values,
           count(*) AS cnt
         FROM events GROUP BY 1""",
    "qc_incr_rollup" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY ROLLUP (date_trunc('day', ts), event_type)""",
    "qc_incr_regroup" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events WHERE value > 1
         GROUP BY ROLLUP (date_trunc('day', ts), event_type)""",
    "qc_incr_bits" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           bool_and(value > 50) AS all_gt50,
           bool_or(event_type = 'click') AS any_click,
           bit_and(user_id) AS uid_and,
           bit_or(user_id) AS uid_or,
           bit_xor(user_id) AS uid_xor
         FROM events GROUP BY 1""",
    "qc_incr_window" ->
      """WITH a AS (
           SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
           FROM events WHERE value > 1 GROUP BY 1)
         SELECT day, cnt, sum_value,
           lag(cnt, 1) OVER (ORDER BY day) AS prev_cnt,
           cnt - COALESCE(lag(cnt, 1) OVER (ORDER BY day), 0) AS delta_cnt
         FROM a""",
    "qc_incr_topk" ->
      """SELECT day, value, event_id FROM (
           SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             value, event_id,
             row_number() OVER (PARTITION BY date_trunc('day', ts)
               ORDER BY value DESC, event_id DESC) AS rn
           FROM events WHERE value > 1) t
         WHERE rn <= 3""",
    // pd50 = Spark percentile_disc semantics spelled out: the smallest
    // member whose cume_dist >= p (DuckDB's own quantile_disc uses the
    // lower floor((n-1)p) convention — deliberately not used)
    // exact regime (domain < k): the summary rows ARE per-group counts
    "qc_incr_heavyhitters" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type, count(*) AS cnt, count(*) AS ub
         FROM events WHERE value > 1
         GROUP BY 1, 2""",
    "qc_incr_remeasure" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_rejoin" ->
      """SELECT c_mktsegment, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         WHERE value > 1
         GROUP BY 1, 2""",
    "qc_incr_factjoin" ->
      """WITH a AS (SELECT ts, user_id, value FROM events
                    WHERE event_type = 'click'),
            b AS (SELECT user_id, value FROM events
                    WHERE event_type = 'purchase')
         SELECT CAST(date_trunc('hour', a.ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(a.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_click_value,
           min(b.value) AS min_purchase_value,
           max(a.value) AS max_click_value,
           count(DISTINCT a.user_id) AS n_users
         FROM a JOIN b ON a.user_id = b.user_id
         GROUP BY 1""",
    "qc_incr_factfilter" ->
      """WITH a AS (SELECT ts, user_id, value FROM events
                    WHERE event_type = 'click'),
            b AS (SELECT user_id, value AS pvalue FROM events
                    WHERE event_type = 'purchase')
         SELECT CAST(date_trunc('hour', a.ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           count(*) FILTER (WHERE value > 50) AS n_big_clicks,
           CAST(sum(CAST(value AS DECIMAL(18,4)))
             FILTER (WHERE value > 20) AS DOUBLE) AS sum_mid_click,
           min(pvalue) FILTER (WHERE pvalue > 10) AS min_big_purchase,
           CAST(sum(CAST(pvalue AS DECIMAL(18,4)))
             FILTER (WHERE value > 50) AS DOUBLE) AS sum_purch_bigclick
         FROM a JOIN b ON a.user_id = b.user_id
         GROUP BY 1""",
    // the LEFT JOIN + null-rejecting WHERE is plan-equivalent to INNER —
    // DuckDB's optimizer makes the same EliminateOuterJoin simplification
    "qc_incr_factdistinct" ->
      """WITH a AS (SELECT ts, user_id, value FROM events
                    WHERE event_type = 'click'),
            b AS (SELECT user_id AS puid, value AS pvalue FROM events
                    WHERE event_type = 'purchase')
         SELECT CAST(date_trunc('hour', a.ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(DISTINCT user_id) AS BIGINT) AS sum_users,
           round(avg(DISTINCT CAST(user_id AS DOUBLE)), 6) AS avg_user,
           CAST(sum(DISTINCT CAST(pvalue AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_d_pvalue
         FROM a JOIN b ON a.user_id = b.puid
         GROUP BY 1""",
    "qc_incr_factdemote" ->
      """WITH a AS (SELECT ts, user_id, value FROM events
                    WHERE event_type = 'click'),
            b AS (SELECT user_id AS puid, value AS pvalue FROM events
                    WHERE event_type = 'purchase')
         SELECT CAST(date_trunc('hour', a.ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_click_value,
           min(pvalue) AS min_purchase_value
         FROM a LEFT JOIN b ON a.user_id = b.puid
         WHERE pvalue > 10
         GROUP BY 1""",
    "qc_incr_factfilter_outer" ->
      """WITH a AS (SELECT ts, user_id, value FROM events
                    WHERE event_type = 'click'),
            b AS (SELECT user_id AS puid, value AS pvalue FROM events
                    WHERE event_type = 'purchase')
         SELECT CAST(date_trunc('hour', a.ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4)))
             FILTER (WHERE pvalue > 10) AS DOUBLE) AS sum_click_bigp,
           min(value) FILTER (WHERE pvalue > 50) AS min_click_bigp,
           CAST(sum(CAST(pvalue AS DECIMAL(18,4)))
             FILTER (WHERE value > 20) AS DOUBLE) AS sum_purch_midclick,
           count(*) FILTER (WHERE pvalue > 50) AS n_bigp
         FROM a LEFT JOIN b ON a.user_id = b.puid
         GROUP BY 1""",
    "qc_incr_factdecavg" ->
      """WITH a AS (SELECT ts, user_id, value FROM events
                    WHERE event_type = 'click'),
            b AS (SELECT user_id, value FROM events
                    WHERE event_type = 'purchase')
         SELECT CAST(date_trunc('hour', a.ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           round(CAST(avg(CAST(a.value AS DECIMAL(12,4))) AS DOUBLE), 6)
             AS avg_click_value,
           CAST(sum(CAST(b.value AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_purchase_value
         FROM a JOIN b ON a.user_id = b.user_id
         GROUP BY 1""",
    "qc_incr_factsemi" ->
      """WITH a AS (SELECT ts, user_id, value FROM events
                    WHERE event_type = 'click')
         SELECT CAST(date_trunc('hour', a.ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(a.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_click_value,
           count(DISTINCT a.user_id) AS n_users
         FROM a
         WHERE EXISTS (SELECT 1 FROM events b
                       WHERE b.event_type = 'purchase'
                         AND b.value > 50 AND b.user_id = a.user_id)
         GROUP BY 1""",
    "qc_incr_factouter" ->
      """WITH a AS (SELECT ts, user_id, value FROM events
                    WHERE event_type = 'click'),
            b AS (SELECT user_id, value FROM events
                    WHERE event_type = 'purchase')
         SELECT CAST(date_trunc('hour', a.ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(a.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_click_value,
           min(b.value) AS min_purchase_value,
           count(b.value) AS n_purchase_vals,
           count(DISTINCT a.user_id) AS n_users
         FROM a LEFT JOIN b ON a.user_id = b.user_id
         GROUP BY 1""",
    "qc_incr_factjoin3" ->
      """WITH a AS (SELECT ts, user_id, value FROM events
                    WHERE event_type = 'click'),
            b AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, value FROM events
                    WHERE event_type = 'signup')
         SELECT CAST(date_trunc('day', a.ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(a.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_click_value,
           min(c.value) AS min_signup_value
         FROM a JOIN b ON a.user_id = b.user_id
                JOIN c ON a.user_id = c.user_id
         GROUP BY 1""",
    "qc_incr_regrain" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_redim" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_refilter" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value
         FROM events WHERE value > 1 AND event_type = 'click'
         GROUP BY 1""",
    // hop windows replayed in DuckDB: each row lands in the 4 sliding
    // windows whose starts are its 15-minute bucket minus k*15m, k=0..3
    // (time_bucket's 2000-01-01 origin and Spark's epoch origin agree at
    // 15-minute alignment)
    "qc_incr_hopping" ->
      """WITH hop AS (
           SELECT CAST(time_bucket(INTERVAL '15 minutes', ts)
                    - k.k * INTERVAL '15 minutes' AS TIMESTAMP) AS ws,
                  value
           FROM events, (SELECT unnest(range(0,4)) AS k) k
           WHERE value > 1)
         SELECT ws, CAST(ws + INTERVAL '1 hour' AS TIMESTAMP) AS we,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value
         FROM hop GROUP BY ws""",
    // 1-hour tumbling windows replayed in DuckDB (time_bucket's
    // 2000-01-01 origin and Spark's epoch origin agree at hour
    // alignment)
    "qc_incr_retumble" ->
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS ws,
           CAST(time_bucket(INTERVAL '1 hour', ts)
                + INTERVAL '1 hour' AS TIMESTAMP) AS we,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value
         FROM events WHERE value > 1
         GROUP BY 1, 2""",
    "qc_incr_rewindow" ->
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS ws,
           CAST(time_bucket(INTERVAL '1 hour', ts)
                + INTERVAL '1 hour' AS TIMESTAMP) AS we,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value
         FROM events WHERE value > 1
         GROUP BY 1, 2""",
    // Monday-anchored weeks == date_trunc('week') buckets
    "qc_incr_rewindow_week" ->
      """SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS ws,
           CAST(date_trunc('week', ts) + INTERVAL '7 days' AS TIMESTAMP) AS we,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events WHERE value > 1
         GROUP BY 1, 2""",
    "qc_incr_rerange" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value
         FROM events
         WHERE value > 1 AND ts >= TIMESTAMP '2024-01-08 00:00:00'
           AND ts < TIMESTAMP '2024-01-15 00:00:00'
         GROUP BY 1""",
    "qc_incr_rerange_comp" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value
         FROM events
         WHERE value > 1 AND ts >= TIMESTAMP '2024-01-08 06:30:00'
           AND ts < TIMESTAMP '2024-01-14 18:45:00'
         GROUP BY 1""",
    // warm now pinned to max(ts)+1s; the dynamic bound is bucket-granular
    // (an hour qualifies by its START), the static window is row-level
    "qc_incr_dynbound_rerange" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value
         FROM events
         WHERE value > 1 AND ts >= TIMESTAMP '2024-01-08 06:30:00'
           AND ts < TIMESTAMP '2024-01-14 18:45:00'
           AND CAST(date_trunc('hour', ts) AS TIMESTAMP) >=
             (SELECT max(ts) + INTERVAL 1 SECOND - INTERVAL 20 DAY
              FROM events)
         GROUP BY 1""",
    // sketch envelope: the Spark side emits rank-check BOOLEANS (and the
    // exact group count); the oracle asserts the same months with TRUE —
    // a digest estimate outside the 2% rank envelope hash-mismatches
    "qc_incr_percentile_sketch" ->
      """SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
           count(*) AS cnt, TRUE AS p50_ok, TRUE AS p90_ok
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_percentile" ->
      """WITH base AS (
           SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value
           FROM events WHERE value > 1),
         ranked AS (
           SELECT day, value,
             cume_dist() OVER (PARTITION BY day ORDER BY value) AS cd
           FROM base),
         agg AS (
           SELECT day, count(*) AS cnt,
             round(quantile_cont(value, 0.5), 6) AS p50,
             round(quantile_cont(value, 0.9), 6) AS p90,
             round(min(CASE WHEN cd >= 0.5 THEN value END), 6) AS pd50
           FROM ranked GROUP BY 1),
         modes AS (
           SELECT day, value AS mode_v FROM (
             SELECT day, value,
               row_number() OVER (PARTITION BY day
                 ORDER BY c DESC, value ASC) AS mrn
             FROM (SELECT day, value, count(*) AS c
                   FROM base GROUP BY 1, 2) g) r
           WHERE mrn = 1)
         SELECT agg.day AS day, cnt, p50, p90, pd50, mode_v
         FROM agg JOIN modes ON agg.day = modes.day""",
    "qc_incr_filter" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4)))
                FILTER (WHERE event_type = 'click') AS DOUBLE) AS s_click,
           count(*) FILTER (WHERE value > 50) AS n_gt50,
           round(avg(value) FILTER (WHERE event_type <> 'click'), 6) AS a_rest,
           min(value) FILTER (WHERE user_id % 2 = 0) AS mn_even,
           count(DISTINCT user_id) FILTER (WHERE event_type = 'view') AS u_view,
           round(quantile_cont(value, 0.5) FILTER (WHERE value > 10), 6)
             AS p50_gt10
         FROM events GROUP BY 1""",
    // weighted percentile == continuous quantile over the frequency-
    // expanded multiset (runs hold exactly that multiset)
    "qc_incr_wpercentile" ->
      """WITH base AS (
           SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  CAST(value AS DOUBLE) AS v, (user_id % 3) + 1 AS f
           FROM events WHERE value > 1),
         expanded AS (
           SELECT day, v, unnest(generate_series(1, CAST(f AS BIGINT))) AS c
           FROM base)
         SELECT b.day AS day, b.cnt, e.wp50, e.wp90
         FROM (SELECT day, count(*) AS cnt FROM base GROUP BY 1) b
         JOIN (SELECT day, round(quantile_cont(v, 0.5), 6) AS wp50,
                      round(quantile_cont(v, 0.9), 6) AS wp90
               FROM expanded GROUP BY 1) e ON b.day = e.day""",
    "qc_incr_regr" ->
      """SELECT event_type,
           CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS ci,
           CAST(regr_count(value, CAST(user_id AS DOUBLE)) AS BIGINT) AS rn,
           round(regr_avgx(value, CAST(user_id AS DOUBLE)), 6) AS rax,
           round(regr_avgy(value, CAST(user_id AS DOUBLE)), 6) AS ray,
           round(regr_slope(value, CAST(user_id AS DOUBLE)), 8) AS rs,
           round(regr_intercept(value, CAST(user_id AS DOUBLE)), 6) AS ri,
           round(regr_r2(value, CAST(user_id AS DOUBLE)), 8) AS r2
         FROM events WHERE value > 1
         GROUP BY 1""",
    // Spark's POPULATION-moment skewness/kurtosis replayed from power
    // sums (DuckDB's own skewness/kurtosis are the bias-corrected sample
    // estimators — different formulas, deliberately not used)
    "qc_incr_moments" ->
      """WITH sums AS (
           SELECT event_type, count(*) AS cnt, count(value) AS n,
             sum(value) AS s1, sum(value*value) AS s2,
             sum(value*value*value) AS s3,
             sum(value*value*value*value) AS s4
           FROM events WHERE value > 1 GROUP BY 1),
         fin AS (
           SELECT event_type, cnt, n, s1/n AS mu, s1, s2, s3, s4 FROM sums),
         m AS (
           SELECT event_type, cnt, n,
             s2 - s1*mu AS m2,
             s3 - 3.0*mu*s2 + 2.0*n*mu*mu*mu AS m3,
             s4 - 4.0*mu*s3 + 6.0*mu*mu*s2 - 3.0*n*mu*mu*mu*mu AS m4
           FROM fin)
         SELECT event_type, cnt,
           round(sqrt(n) * m3 / sqrt(m2*m2*m2), 6) AS sk,
           round(n * m4 / (m2*m2) - 3.0, 6) AS ku
         FROM m""",
    "qc_incr_stats" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS cov_vu,
           round(covar_pop(value, CAST(user_id AS DOUBLE)), 4) AS covp_vu,
           arg_max(value, ts) AS last_value
         FROM events WHERE value > 1
         GROUP BY 1""",
    "qc_incr_by_type" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events WHERE event_type IN ('click', 'view', 'error')
         GROUP BY 1, 2""",
    "qc_incr_join" ->
      """SELECT c_mktsegment, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2""",
    "qc_incr_leftjoin" ->
      """SELECT c_mktsegment, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 2 = 0) c
           ON user_id = c_custkey
         GROUP BY 1, 2""",
    "qc_incr_union" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM (
           SELECT ts, value FROM events
           UNION ALL
           SELECT CAST(o_orderdate AS TIMESTAMP) AS ts,
                  o_totalprice AS value FROM orders
         ) u
         GROUP BY 1""",
    // lag/cumulative-sum sessionization: a row chains when it is STRICTLY
    // within the gap of the previous row (Spark's session end is
    // exclusive); session end = last ts + gap
    "qc_incr_session" ->
      """WITH m AS (
           SELECT event_type, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY event_type ORDER BY ts)
                       < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
           FROM events WHERE value > 1
         ), g AS (
           SELECT *, sum(brk) OVER (PARTITION BY event_type ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS sid
           FROM m
         )
         SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM g GROUP BY event_type, sid""",
    "qc_incr_lateband_win" ->
      """SELECT CAST(time_bucket(INTERVAL '6 hours', ts) AS TIMESTAMP) AS ws,
           CAST(time_bucket(INTERVAL '6 hours', ts)
                + INTERVAL '6 hours' AS TIMESTAMP) AS we,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events WHERE value > 1
         GROUP BY 1, 2""",
    // vanilla over the FULL table: the warm banded run must have folded
    // the late-arriving rows back in
    "qc_incr_lateband" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           max(value) AS max_value
         FROM events WHERE value > 1
         GROUP BY 1"""
  )
}
