package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics
import graft.sources.Tables

/** Event-analytics semantics against hand-computed cases plus the
  * single-shuffle plan contract (the property that makes these shapes
  * viable at 100 TB: one Exchange on the user key, reused by the
  * windows and the session aggregate). */
class EventAnalyticsSpec extends AnyFunSuite {
  import TestSparkSession._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def mkEvents(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, u, sec, ty, v) => (id, ts(sec), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("sessionize: gap boundary, per-user indices, exact durations") {
    // u1: events at 0s, 10s (same session), then 2000s (gap 1990 > 1800)
    // u2: one event
    val e = mkEvents(Seq(
      (1L, 1L, 0L, "view", 1.0),
      (2L, 1L, 10L, "view", 1.0),
      (3L, 1L, 2000L, "view", 1.0),
      (4L, 2L, 5L, "view", 1.0)))
    val got = EventAnalytics
      .sessionStats(e, col("user_id"), col("ts"), col("event_id"), 1800L)
      .orderBy("user_id", "session_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 0L, 2L, 10000000L), // 10 s in micros
      (1L, 1L, 1L, 0L),
      (2L, 0L, 1L, 0L)))
  }

  test("sessionize: a gap of exactly the threshold does NOT split") {
    val e = mkEvents(Seq(
      (1L, 1L, 0L, "view", 1.0),
      (2L, 1L, 1800L, "view", 1.0)))
    val got = EventAnalytics
      .sessionStats(e, col("user_id"), col("ts"), col("event_id"), 1800L)
      .collect()
    assert(got.length == 1 && got(0).getLong(2) == 2L)
  }

  test("funnel: strict ordering, monotone step counts, skips count nothing") {
    val e = mkEvents(Seq(
      // u1 completes all three in order
      (1L, 1L, 10L, "signup", 0.0),
      (2L, 1L, 20L, "view", 0.0),
      (3L, 1L, 30L, "purchase", 0.0),
      // u2 purchases BEFORE signup and never views → step 1 only
      (4L, 2L, 5L, "purchase", 0.0),
      (5L, 2L, 50L, "signup", 0.0),
      // u3 views without signup → counted nowhere
      (6L, 3L, 7L, "view", 0.0)))
    val got = EventAnalytics
      .funnel(e, col("user_id"), col("ts"), col("event_type"),
        Seq("signup", "view", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "signup", 2L), (2L, "view", 1L), (3L, "purchase", 1L)))
  }

  test("funnel on the fixture corpus is monotone non-increasing") {
    val counts = EventAnalytics
      .funnel(Tables.events(spark, sf001), col("user_id"), col("ts"),
        col("event_type"), Seq("signup", "view", "click", "purchase"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(counts.length == 4 && counts.head > 0)
    assert(counts.sliding(2).forall(p => p(0) >= p(1)), counts.toSeq)
  }

  test("retention: cohort day = first event day, offsets hand-checked") {
    val day = 86400L
    val e = mkEvents(Seq(
      (1L, 1L, 0L, "view", 0.0), // u1 cohort day0, active day0 + day1
      (2L, 1L, day + 5L, "view", 0.0),
      (3L, 2L, day + 9L, "view", 0.0))) // u2 cohort day1
    val got = EventAnalytics.retention(e, col("user_id"), col("ts"))
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("1970-01-01", 0L, 1L), ("1970-01-01", 1L, 1L),
      ("1970-01-02", 0L, 1L)))
  }

  test("gapFill: empty buckets carry the last non-empty sum, count 0") {
    val e = mkEvents(Seq(
      (1L, 1L, 0L, "view", 1.0),
      (2L, 1L, 60L, "view", 0.5), // same hour-0 bucket
      (3L, 1L, 7300L, "view", 2.0))) // hour-2 bucket; hour 1 empty
    val got = EventAnalytics
      .gapFill(e, col("user_id"), col("ts"), col("value"), 3600L)
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(1).getTime / 1000, r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (0L, 2L, 1.5), (3600L, 0L, 1.5), (7200L, 1L, 2.0)))
  }

  test("gapFill grid is dense: one row per step in each user's span") {
    val out = EventAnalytics.gapFill(Tables.events(spark, sf0001),
      col("user_id"), col("ts"), col("value"), 3600L)
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        ((unix_micros(max(col("bucket"))) - unix_micros(min(col("bucket"))))
          / 3600000000L + 1L).as("expected"))
      .filter(col("n") =!= col("expected"))
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  test("sessionStats plans ONE exchange: windows + aggregate share the user hash") {
    val plan = EventAnalytics
      .sessionStats(Tables.events(spark, sf0001), col("user_id"), col("ts"),
        col("event_id"), 1800L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
