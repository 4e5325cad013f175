package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.StreamQueries
import graft.sources.Tables

/** The streaming scenarios must equal their batch oracles (the driver
  * checks the same equivalence via DuckDB at sf0.01). */
class StreamQueriesSpec extends AnyFunSuite {
  import TestSparkSession._

  test("q_stream_hourly equals the batch hourly aggregate") {
    val streamed = StreamQueries.queries("q_stream_hourly")(spark, sf0001)
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double").as("sum_value"),
        max(col("value")).as("max_value"))
    val s = streamed.orderBy("hour", "event_type").collect()
    val b = batch.orderBy("hour", "event_type").collect()
    assert(s.length == b.length && s.length > 0, s"${s.length} vs ${b.length}")
    s.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("q_stream_session equals batch session_window aggregation") {
    val streamed = StreamQueries.queries("q_stream_session")(spark, sf0001)
    val batch = Tables.events(spark, sf0001)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("cnt"), col("sum_value"))
    val s = streamed.orderBy("user_id", "session_start").collect()
    val b = batch.orderBy("user_id", "session_start").collect()
    assert(s.length == b.length && s.length > 0, s"${s.length} vs ${b.length}")
    s.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("q_stream_join2 equals the batch interval self-join rollup") {
    val streamed = StreamQueries.queries("q_stream_join2")(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("u"), col("ts").as("e_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    val batch = e.join(c, col("u") === col("cu") &&
        col("c_ts") >= col("e_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("e_ts"))
      .groupBy(col("u").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("c_value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double").as("sum_click_value"))
    val s = streamed.orderBy("user_id").collect()
    val b = batch.orderBy("user_id").collect()
    assert(s.length == b.length && s.length > 0, s"${s.length} vs ${b.length}")
    s.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("q_stream_join3 emits the COMPLETE outer set incl. unmatched errors") {
    val streamed = StreamQueries.queries("q_stream_join3")(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("u"), col("ts").as("e_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    val batch = e.join(c, col("u") === col("cu") &&
        col("c_ts") >= col("e_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("e_ts"), "left_outer")
      .groupBy(col("u").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("c_ts")).as("n_matched"),
        sum(col("c_value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double").as("sum_click_value"))
    val s = streamed.orderBy("user_id").collect()
    val b = batch.orderBy("user_id").collect()
    assert(s.length == b.length && s.length > 0, s"${s.length} vs ${b.length}")
    s.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
    // the distinctly-streaming part: null-extended rows actually flushed
    // (an error with zero preceding clicks emitted before termination) —
    // without the sentinel-driven watermark advance these rows never leave
    // join state and the outer join silently degrades to inner
    assert(s.exists(r => r.getLong(2) < r.getLong(1)),
      "no null-extended outer rows reached the sink")
  }

  test("q_stream_dedup equals batch distinct-text stats") {
    val streamed = StreamQueries.queries("q_stream_dedup")(spark, sf0001)
    val len = length(col("text")).cast("long")
    val batch = Tables.documents(spark, sf0001).select("text").distinct()
      .agg(count(lit(1)).as("n_unique"), sum(len).as("total_chars"),
        min(len).as("min_chars"), max(len).as("max_chars"))
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("q_stream_resume merges checkpointed state across two triggers") {
    // the query itself require()s that trigger 2 read ONLY the appended
    // rows — reaching the oracle comparison at all proves resume, not
    // reprocess. Here: final sink equals batch over the FULL table.
    val streamed = StreamQueries.queries("q_stream_resume")(spark, sf0001)
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double").as("sum_value"))
    val s = streamed.orderBy("hour", "event_type").collect()
    val b = batch.orderBy("hour", "event_type").collect()
    assert(s.length == b.length && s.length > 0, s"${s.length} vs ${b.length}")
    s.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("stream queries leave no persistent conf mutation on the shared session") {
    // VERDICT r5 #5: eventsStream used to set nanosAsLong session-wide;
    // stream runs now use an isolated child session (newSession), so
    // the shared session's conf is never touched at all
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    val before = spark.conf.getOption(key) // the conf default, Some(false)
    StreamQueries.queries("q_stream_hourly")(spark, sf0001).collect()
    assert(spark.conf.getOption(key) == before,
      s"q_stream_hourly left $key=${spark.conf.getOption(key)} (was $before)")
    // and a pre-set value survives untouched
    spark.conf.set(key, "true")
    StreamQueries.queries("q_stream_join")(spark, sf0001).collect()
    assert(spark.conf.getOption(key).contains("true"))
    spark.conf.unset(key)
  }
}
