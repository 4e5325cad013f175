package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` within the same key (backward as-of, the
  * timeseries-enrichment staple).
  *
  * Implemented as the single-shuffle union trick rather than an
  * inequality join: tag both sides, union, window over (key, time) with
  * `last(payload, ignoreNulls)` carrying the latest right payload forward,
  * keep left rows. One hash partition by key + one sort — no broadcast
  * requirement, no O(n·m) nested loop, and skew handling falls out of
  * AQE because it's a plain window over a shuffle.
  *
  * Right rows must be unique per (key, time); pre-aggregate to enforce
  * (ambiguity otherwise makes the result nondeterministic).
  */
object AsOfJoin {

  /** @param toleranceMicros only match right rows within
    *        `leftTime - toleranceMicros <= rightTime <= leftTime`
    *        (None = unbounded lookback) */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payloadCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // carry the right time inside the payload so tolerance can be
    // re-checked after the window pass
    val payload = struct(
      (col(rightTime).as("_rt") +: payloadCols.map(col)): _*)

    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_is_left", lit(1))
      .withColumn("_payload", lit(null).cast(
        right.select(payload).schema.head.dataType))
    // join semantics: NULL keys never match (Window.partitionBy would
    // otherwise group null-keyed rows together and "match" them)
    val r = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("_k"), col(rightTime).as("_t"),
        payload.as("_payload"))
      .withColumn("_is_left", lit(0))

    val unioned = l.select(
      (leftCols.map(col) :+ col("_k") :+ col("_t") :+ col("_is_left") :+
        col("_payload")): _*)
      .unionByName(r, allowMissingColumns = true)

    // right rows sort before left rows at the same instant => inclusive
    // (rightTime <= leftTime) semantics
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched0 = unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
    // tolerance: null out matches older than the lookback window
    val matched = toleranceMicros match {
      case Some(tol) =>
        matched0.withColumn("_match",
          when(col("_match").isNotNull &&
            unix_micros(col("_t")) - unix_micros(col("_match").getField("_rt")) <= tol,
            col("_match")))
      case None => matched0
    }

    payloadCols.foldLeft(matched) { (df, c) =>
        df.withColumn(c, col("_match").getField(c))
      }
      .select((leftCols ++ payloadCols).map(col): _*)
  }
}
