package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY §2.3 joins row, streaming shape).
  *
  * The reference has no streaming engine at all; Structured Streaming's
  * symmetric-hash stream-stream join is the Spark-native answer to the
  * "join two live feeds" pipeline shape (attribution, request/response
  * stitching, impression↔conversion matching).
  *
  * Scale contract: BOTH sides must be watermarked and the join condition
  * must bound event time on both sides (an equi-key plus a time interval).
  * Spark then sizes the join state to the interval: each side retains only
  * rows whose event time can still match a future row on the other side —
  * state is O(rows per key-horizon), independent of stream length. An
  * unbounded condition would grow state forever and is rejected for
  * append-mode by Spark itself (no silent degradation to keep an eye on).
  */
object StreamingJoin {

  /** INNER interval join: rows of `left` matched to rows of `right` with
    * equal `key` and `rightTs` within `[leftTs − lookback, leftTs]` — the
    * attribution shape ("events on the same key in the `lookback` window
    * before mine"). Inner matches emit as soon as both rows have arrived
    * (append mode); the watermark only bounds state retention and
    * late-data admission, so over a static fixture the emitted set equals
    * the batch interval join exactly.
    *
    * Column names on the two inputs must be disjoint (rename upstream) —
    * the output carries both sides' columns verbatim.
    */
  def interval(left: DataFrame, right: DataFrame, key: (Column, Column),
      leftTs: String, rightTs: String, lookback: String,
      watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      key._1 === key._2 &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs))
  }

  /** LEFT OUTER interval join — [[interval]]'s condition with
    * null-extension for unmatched left rows (the "errors with NO
    * preceding click" attribution shape). Unlike inner matches, an
    * outer result can only emit once the WATERMARK proves no future
    * right row can match (`wm > leftTs`): Spark emits it when the left
    * row is evicted from join state. Over a bounded run the final
    * watermark therefore decides which tail rows ever produce their
    * null-extended result — drive the watermark past the data's end
    * (e.g. a sentinel row outside the joined key space) when the
    * complete outer set is required, exactly as a production feed's
    * next day of traffic would. */
  def intervalOuter(left: DataFrame, right: DataFrame, key: (Column, Column),
      leftTs: String, rightTs: String, lookback: String,
      watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      key._1 === key._2 &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs),
      "left_outer")
  }

  /** FULL OUTER interval join — completes the stream-stream matrix:
    * unmatched rows of BOTH sides null-extend (errors with no preceding
    * click AND clicks never attributed to an error). The interval
    * condition bounds each side's event time relative to the other, so
    * the symmetric-hash state stays O(rows per key-horizon) on both
    * sides; each side's null-extended results emit when the OTHER
    * side's watermark proves no match can arrive. Drive both watermarks
    * past the data's end (sentinel rows on both feeds) when the
    * complete outer set is required on a bounded run. */
  def intervalFullOuter(left: DataFrame, right: DataFrame,
      key: (Column, Column), leftTs: String, rightTs: String,
      lookback: String, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      key._1 === key._2 &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs),
      "full_outer")
  }
}
