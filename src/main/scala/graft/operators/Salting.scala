package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.rewrite.Decompose
import graft.rewrite.Decompose.StateSpec

/** Skew-resistant aggregation: hot group keys overload single reducers at
  * scale, so aggregate in two stages — first on (key, salt), spreading
  * each key over `buckets` reducers, then merge the mergeable partial
  * states per key. Reuses the cache's decomposition specs
  * ([[graft.rewrite.Decompose.StateSpec]]): anything the incremental
  * cache can merge across runs, this can merge across salt buckets.
  *
  * The final result is exactly the unsalted aggregation (for
  * order-independent states; double sums can differ in the last ulp like
  * any Spark re-partitioning). AQE's skew handling covers JOIN skew;
  * this is the aggregation-side equivalent.
  */
object Salting {

  def saltedAgg(df: DataFrame, keys: Seq[Column], buckets: Int,
      specs: Seq[StateSpec]): DataFrame = {
    require(buckets > 0)
    val keyNames = keys.zipWithIndex.map { case (_, i) => s"_k$i" }
    val keyed = keys.zip(keyNames).map { case (c, n) => c.as(n) }
    // salt from a per-row physical id: cheap, no extra column needed, and
    // irrelevant to the result (any distribution merges to the same state)
    val salt = pmod(hash(monotonically_increasing_id()), lit(buckets)).as("_salt")

    val stage1 = df.groupBy(keyed :+ salt: _*)
      .agg(specs.head.partial.as(specs.head.name),
        specs.tail.map(s => s.partial.as(s.name)): _*)
    val mergeCols = specs.map(s => Decompose.mergeColumn(s, stage1.schema))
    stage1.groupBy(keyNames.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
      .withColumnsRenamed(keyNames.zip(keys.map(keyName)).toMap)
  }

  private def keyName(c: Column): String = c.toString.split("\\.").last
}
