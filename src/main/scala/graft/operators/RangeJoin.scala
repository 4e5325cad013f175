package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows whose time falls in
  * [right.start, right.end).
  *
  * A naive `l.join(r, l.t >= r.start && l.t < r.end)` has no equi-key, so
  * Spark plans a broadcast-nested-loop — fine for a small right side,
  * quadratic otherwise. `byBucket` makes it an equi-join: both sides
  * explode onto fixed time buckets (right side onto every bucket its
  * interval overlaps), join on the bucket, then re-check the exact
  * predicate. Shuffle cost is O(rows × avg buckets per interval); at
  * 100 TB pick `bucketWidth` ≈ the typical interval length so the
  * fan-out stays small.
  */
object RangeJoin {

  def byBucket(left: DataFrame, right: DataFrame,
      leftTime: Column, rightStart: Column, rightEnd: Column,
      bucketWidthMicros: Long): DataFrame = {
    val lb = left.withColumn("_bucket",
      (unix_micros(leftTime) / bucketWidthMicros).cast("long"))
    val rb = right.withColumn("_bucket",
      explode(sequence(
        (unix_micros(rightStart) / bucketWidthMicros).cast("long"),
        (unix_micros(rightEnd) / bucketWidthMicros).cast("long"))))
    lb.join(rb, "_bucket")
      .filter(leftTime >= rightStart && leftTime < rightEnd)
      .drop("_bucket")
  }
}
