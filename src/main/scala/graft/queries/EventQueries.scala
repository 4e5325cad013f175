package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics
import graft.sources.Tables.events

/** Event-analytics inventory: sessionization, funnel, retention,
  * grid resampling — the standard consumers of an append-only event
  * table (see operators/EventAnalytics.scala for the scale notes).
  *
  * Oracle seams pinned here:
  *  - DuckDB window/aggregate sum over BIGINT is HUGEINT → CAST back
  *    (the r7 NOTES integer-sum rule).
  *  - durations are integer epoch-microsecond differences, never float.
  *  - bucket floors are integer modulo on epoch micros both sides.
  */
object EventQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // gap sessionization (30-min): per-session rollup; one shuffle on
    // user_id shared by both windows and the final aggregate
    "q_sessionize" -> ((s, d) =>
      EventAnalytics.sessionStats(events(s, d), col("user_id"), col("ts"),
        col("event_id"), gapSeconds = 1800)),
    // 3-step ordered funnel: signup → first view after it → first
    // purchase after that
    "q_funnel" -> ((s, d) =>
      EventAnalytics.funnel(events(s, d), col("user_id"), col("ts"),
        col("event_type"), Seq("signup", "view", "purchase"))),
    // day-grain cohort retention triangle
    "q_retention" -> ((s, d) =>
      EventAnalytics.retention(events(s, d), col("user_id"), col("ts"))),
    // hourly grid resample + forward fill of the per-bucket value sum
    "q_gapfill" -> ((s, d) =>
      EventAnalytics.gapFill(events(s, d), col("user_id"), col("ts"),
        col("value"), stepSeconds = 3600)),
    // hourly grid resample + LINEAR interpolation between known buckets
    // (clamped at the ends)
    "q_gapfill_linear" -> ((s, d) =>
      EventAnalytics.gapFillInterp(events(s, d), col("user_id"), col("ts"),
        col("value"), stepSeconds = 3600))
  )

  val oracle: Map[String, String] = Map(
    "q_sessionize" ->
      """WITH o AS (
           SELECT user_id, event_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM events),
         s AS (
           SELECT user_id, ts,
             CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000
                           THEN 1 ELSE 0 END) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) - 1 AS session_idx
           FROM o)
         SELECT user_id, session_idx, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
         FROM s GROUP BY 1, 2""",
    "q_funnel" ->
      """WITH e AS (SELECT user_id AS u, ts AS t, event_type AS ty FROM events),
         s1 AS (SELECT u, min(t) AS arr FROM e WHERE ty = 'signup' GROUP BY u),
         s2 AS (SELECT e.u, min(e.t) AS arr FROM e JOIN s1 ON e.u = s1.u
                WHERE e.ty = 'view' AND e.t > s1.arr GROUP BY e.u),
         s3 AS (SELECT e.u, min(e.t) AS arr FROM e JOIN s2 ON e.u = s2.u
                WHERE e.ty = 'purchase' AND e.t > s2.arr GROUP BY e.u)
         SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name,
                count(*) AS n_users FROM s1
         UNION ALL SELECT 2, 'view', count(*) FROM s2
         UNION ALL SELECT 3, 'purchase', count(*) FROM s3""",
    "q_retention" ->
      """WITH f AS (SELECT user_id AS u, min(CAST(ts AS DATE)) AS cohort_day
                    FROM events GROUP BY 1)
         SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT)
             AS day_offset,
           count(DISTINCT e.user_id) AS n_users
         FROM events e JOIN f ON e.user_id = f.u
         GROUP BY 1, 2""",
    "q_gapfill" ->
      """WITH b AS (
           SELECT user_id AS u,
             make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000)
               AS bucket,
             count(*) AS n_events, sum(value) AS v_sum
           FROM events GROUP BY 1, 2),
         span AS (SELECT u, min(bucket) AS b0, max(bucket) AS b1
                  FROM b GROUP BY 1),
         grid AS (SELECT u, unnest(generate_series(b0, b1,
                    INTERVAL 1 HOUR)) AS bucket FROM span)
         SELECT g.u AS user_id, g.bucket,
           coalesce(b.n_events, 0) AS n_events,
           last_value(b.v_sum IGNORE NULLS) OVER
             (PARTITION BY g.u ORDER BY g.bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
         FROM grid g LEFT JOIN b ON g.u = b.u AND g.bucket = b.bucket""",
    // identical op order: prev + (next − prev) * (Δt_num / Δt_den), the
    // Δt's as BIGINT micros cast to double — both engines compute the
    // same IEEE sequence
    "q_gapfill_linear" ->
      """WITH b AS (
           SELECT user_id AS u,
             make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000)
               AS bucket,
             count(*) AS n_events, sum(value) AS v_sum
           FROM events GROUP BY 1, 2),
         span AS (SELECT u, min(bucket) AS b0, max(bucket) AS b1
                  FROM b GROUP BY 1),
         grid AS (SELECT u, unnest(generate_series(b0, b1,
                    INTERVAL 1 HOUR)) AS bucket FROM span),
         j AS (
           SELECT g.u, g.bucket, b.n_events, b.v_sum,
             CASE WHEN b.v_sum IS NOT NULL THEN g.bucket END AS known_t
           FROM grid g LEFT JOIN b ON g.u = b.u AND g.bucket = b.bucket),
         w AS (
           SELECT u, bucket, n_events, v_sum,
             last_value(v_sum IGNORE NULLS) OVER
               (PARTITION BY u ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(known_t IGNORE NULLS) OVER
               (PARTITION BY u ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(v_sum IGNORE NULLS) OVER
               (PARTITION BY u ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(known_t IGNORE NULLS) OVER
               (PARTITION BY u ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
           FROM j)
         SELECT u AS user_id, bucket,
           coalesce(n_events, 0) AS n_events,
           CASE WHEN v_sum IS NOT NULL THEN v_sum
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv) *
                  (CAST(epoch_us(bucket) - epoch_us(pt) AS DOUBLE) /
                   CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
           END AS v_interp
         FROM w"""
  )
}
