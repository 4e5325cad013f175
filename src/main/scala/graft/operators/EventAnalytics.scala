package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over an append-only fact table: gap
  * sessionization, funnel progression, cohort retention, and
  * grid resampling with forward fill.
  *
  * Scale notes (the whole point of these shapes):
  *  - Every operator shuffles ONCE on the entity key (user) and never
  *    again — the windows and the per-session/per-cohort aggregates all
  *    reuse the same hash partitioning, so Catalyst plans a single
  *    Exchange and sorts within partitions.
  *  - Per-user state is bounded by that user's events; skew is bounded
  *    by the hottest entity, the same bound a streaming session window
  *    carries (streaming/StreamingAgg.scala holds the online variant).
  *  - Nothing is collected to the driver and no window spans the whole
  *    table (no global ORDER BY).
  *
  * Reference scope: the reference engine (/root/reference, README.md:21)
  * caches aggregate queries over append-only event tables; these are the
  * canonical downstream consumers of such tables, expressed Spark-first.
  */
object EventAnalytics {

  /** Per-event gap sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapSeconds`.
    * Adds `session_idx` (0-based per user, in (ts, tie) order).
    *
    * lag() and the running sum share one (user, ts, tie) window sort, so
    * the plan is scan → Exchange(user) → Sort → Window → Window: one
    * shuffle total.
    */
  def sessionize(events: DataFrame, user: Column, ts: Column, tie: Column,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(user).orderBy(ts.asc, tie.asc)
    val us = unix_micros(ts)
    val prevUs = lag(us, 1).over(w)
    val isNew = when(prevUs.isNull || us - prevUs > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }

  /** Session-level rollup: events per session, bounds, duration in
    * microseconds (integer-exact — no float seam with an oracle). */
  def sessionStats(events: DataFrame, user: Column, ts: Column, tie: Column,
      gapSeconds: Long): DataFrame =
    sessionize(events, user, ts, tie, gapSeconds)
      .groupBy(user.as("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        (unix_micros(max(ts)) - unix_micros(min(ts))).as("dur_us"))

  /** Ordered funnel: per step, how many users reached it — a user
    * reaches step i+1 with the first step-(i+1) event STRICTLY after
    * their first step-i arrival time. Returns (step, step_name, n_users).
    *
    * Each stage is a filter + min-aggregate on the user key joined to
    * the previous stage's (user, arrival) — equi-joins on the same key
    * the aggregates hash on, so AQE/broadcast keeps them cheap and no
    * stage ever holds more than one row per user. */
  def funnel(events: DataFrame, user: Column, ts: Column, typeCol: Column,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(user.as("u"), ts.as("t"), typeCol.as("ty"))
    // arrivals(i): one row per user who reached step i, with first-arrival time
    val first = e.filter(col("ty") === steps.head)
      .groupBy(col("u")).agg(min(col("t")).as("arr"))
    val arrivals = steps.tail.scanLeft(first) { (prev, step) =>
      e.filter(col("ty") === step)
        .join(prev.select(col("u"), col("arr").as("prev_arr")), Seq("u"))
        .filter(col("t") > col("prev_arr"))
        .groupBy(col("u")).agg(min(col("t")).as("arr"))
    }
    arrivals.zip(steps).zipWithIndex
      .map { case ((df, name), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).cast("long").as("step"),
            lit(name).as("step_name"), col("n_users"))
      }
      .reduce(_.unionAll(_))
  }

  /** Day-grain cohort retention: users grouped by their first-ever event
    * day; for each (cohort_day, day_offset) the number of distinct users
    * active that day. The classic retention triangle. */
  def retention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val firstDay = events.groupBy(user.as("u"))
      .agg(min(to_date(ts)).as("cohort_day"))
    events.select(user.as("u"), to_date(ts).as("day"))
      .join(firstDay, Seq("u"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count_distinct(col("u")).as("n_users"))
  }

  /** Resample to a fixed `stepSeconds` grid per user and forward-fill
    * gaps: per-bucket event count and value sum, with empty buckets
    * carrying the last non-empty bucket's sum (`v_fill`).
    *
    * The grid is generated per user from that user's own [min, max]
    * bucket span (sequence + explode — map-side, no driver loop), so a
    * sparse user doesn't pay for the global time range. Bucket floor is
    * integer arithmetic on epoch micros: exact, oracle-replayable. */
  def gapFill(events: DataFrame, user: Column, ts: Column, value: Column,
      stepSeconds: Long): DataFrame = {
    val stepUs = stepSeconds * 1000000L
    val bucket = timestamp_micros(
      unix_micros(ts) - pmod(unix_micros(ts), lit(stepUs)))
    val perBucket = events
      .groupBy(user.as("u"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_events"), sum(value).as("v_sum"))
    val grid = perBucket.groupBy(col("u"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("u"), explode(sequence(col("b0"), col("b1"),
        expr(s"interval $stepSeconds seconds"))).as("bucket"))
    val w = Window.partitionBy(col("u")).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("u", "bucket"), "left")
      .select(col("u").as("user_id"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v_sum"), ignoreNulls = true).over(w).as("v_fill"))
  }

  /** [[gapFill]]'s LINEAR-INTERPOLATION sibling: empty buckets take
    * `prev + (next − prev) · Δt/Δtotal` between the neighboring known
    * buckets; before the first / after the last known value the series
    * clamps (no extrapolation). Same grid and shuffle shape as
    * [[gapFill]] — two window passes over the per-user grid, skew
    * bounded by the longest user span. */
  def gapFillInterp(events: DataFrame, user: Column, ts: Column,
      value: Column, stepSeconds: Long): DataFrame = {
    val stepUs = stepSeconds * 1000000L
    val bucket = timestamp_micros(
      unix_micros(ts) - pmod(unix_micros(ts), lit(stepUs)))
    val perBucket = events
      .groupBy(user.as("u"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_events"), sum(value).as("v_sum"))
    val grid = perBucket.groupBy(col("u"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("u"), explode(sequence(col("b0"), col("b1"),
        expr(s"interval $stepSeconds seconds"))).as("bucket"))
    val wAll = Window.partitionBy(col("u")).orderBy(col("bucket").asc)
    val wPrev = wAll.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = wAll.rowsBetween(0, Window.unboundedFollowing)
    val knownT = when(col("v_sum").isNotNull, col("bucket"))
    val prevV = last(col("v_sum"), ignoreNulls = true).over(wPrev)
    val prevT = last(knownT, ignoreNulls = true).over(wPrev)
    val nextV = first(col("v_sum"), ignoreNulls = true).over(wNext)
    val nextT = first(knownT, ignoreNulls = true).over(wNext)
    val frac = (unix_micros(col("bucket")) - unix_micros(prevT))
      .cast("double") /
      (unix_micros(nextT) - unix_micros(prevT)).cast("double")
    grid.join(perBucket, Seq("u", "bucket"), "left")
      .select(col("u").as("user_id"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("v_sum").isNotNull, col("v_sum"))
          .when(prevV.isNull, nextV)
          .when(nextV.isNull, prevV)
          .otherwise(prevV + (nextV - prevV) * frac).as("v_interp"))
  }
}
