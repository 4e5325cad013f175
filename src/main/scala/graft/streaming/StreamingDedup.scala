package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/** Streaming deduplication: exact-content dedup over an unbounded
  * document stream.
  *
  * Two tiers:
  *  - [[byFingerprint]]: Spark's built-in streaming `dropDuplicates` on
  *    the 64-bit content fingerprint — state = one row per distinct
  *    fingerprint in the state store, O(distinct docs), with optional
  *    watermark-bounded retention.
  *  - [[firstSeen]]: custom keyed state via `flatMapGroupsWithState` —
  *    emits only the FIRST document per fingerprint and keeps a count of
  *    suppressed duplicates in state (the streaming analog of
  *    `Dedup.exact`'s min(doc_id) + n_copies).
  */
object StreamingDedup {

  /** built-in stateful dedup on the content fingerprint */
  def byFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .dropDuplicates("fingerprint")

  /** Watermark-bounded dedup: duplicates are suppressed only within the
    * watermark horizon, and — unlike plain `dropDuplicates` with a
    * watermark column in the key — state for expired fingerprints is
    * dropped, so state size is O(distinct docs per horizon), not
    * O(distinct docs ever). The 100 TB-stream shape: unbounded corpora
    * can't keep every fingerprint forever; near-in-time duplicates (the
    * common crawl/feed case) are caught with bounded state.
    *
    * `tsCol` must be an event-time timestamp column. */
  def byFingerprintWithinWatermark(docs: DataFrame, horizon: String,
      textCol: String = "text", tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fingerprint")

  final case class Doc(doc_id: Long, text: String, fingerprint: Long)
  final case class SeenState(firstId: Long, nCopies: Long)

  /** custom keyed state: first document per fingerprint passes through */
  def firstSeen(docs: DataFrame, textCol: String = "text"): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .select(col("doc_id"), col(textCol).as("text"), col("fingerprint"))
      .as[Doc]
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(dedupOne)
  }

  private def dedupOne(fp: Long, docs: Iterator[Doc],
      state: GroupState[SeenState]): Iterator[Doc] = {
    val batch = docs.toSeq
    if (batch.isEmpty) Iterator.empty
    else state.getOption match {
      case Some(s) => // all duplicates of an already-emitted doc
        state.update(SeenState(s.firstId, s.nCopies + batch.size))
        Iterator.empty
      case None =>
        val first = batch.minBy(_.doc_id)
        state.update(SeenState(first.doc_id, batch.size - 1L))
        Iterator.single(first)
    }
  }
}
