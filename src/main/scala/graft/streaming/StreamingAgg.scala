package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming analog of the incremental aggregation cache
  * (SURVEY §2.3 streaming row, §7.6 M7).
  *
  * The batch cache IS a poor man's incremental view: watermark = last run
  * time, windows = date_trunc buckets, state = cached partial aggregates,
  * late data = silently missed (reference contract, README.md:23). The
  * native Spark analog keeps the same declaration — bucketed groupBy +
  * mergeable aggregates — but lets the engine own the state store,
  * checkpointing, and bounded late-data handling:
  *
  *   - `window(ts, width)` replaces `date_trunc(unit, ts)` buckets;
  *   - `withWatermark(ts, delay)` admits late rows up to `delay` (the
  *     batch contract S1 drops them silently — strictly better here);
  *   - partial/final merge is Spark's own streaming state machinery, the
  *     same engine seam the reference exploits in DataFusion.
  *
  * At scale this runs with `spark.readStream` over an append-only table /
  * file stream and any sink; state is per-(window × group) rows, exactly
  * the cache's state cardinality.
  */
object StreamingAgg {

  /** windowed streaming aggregation mirroring a cached batch query */
  def windowedAgg(
      stream: DataFrame,
      tsCol: String,
      windowWidth: String,
      watermarkDelay: String,
      groupCols: Seq[Column],
      aggCols: Seq[Column]): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowWidth) +: groupCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)

  /** Session windows: activity bursts per key separated by `gap` of
    * silence — the stateful window shape date_trunc buckets can't express
    * (session extents depend on the data, not the clock). */
  def sessionAgg(
      stream: DataFrame,
      tsCol: String,
      gap: String,
      watermarkDelay: String,
      keyCols: Seq[Column],
      aggCols: Seq[Column]): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap) +: keyCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)

  /** The demo-equivalent query (examples/demo.rs:24) as a stream:
    * per-hour count/sum/avg over events with late data admitted up to
    * `watermarkDelay`. */
  def hourlyEventAgg(stream: DataFrame, watermarkDelay: String = "10 minutes")
      : DataFrame =
    windowedAgg(stream, "ts", "1 hour", watermarkDelay,
      groupCols = Seq.empty,
      aggCols = Seq(
        count(lit(1)).as("cnt"),
        sum("value").as("sum_value"),
        avg("value").as("avg_value")))
}
