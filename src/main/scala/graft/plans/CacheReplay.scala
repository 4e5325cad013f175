package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** EXPLAIN/metrics visibility for the cache path — the Spark analog of
  * the reference's `DisplayAs` + `BaselineMetrics` instrumentation on
  * CacheUpdateAggregateExec / CachedAggregateExec
  * (src/aggregate.rs:530-537, 583-585, surfaced by EXPLAIN ANALYZE in
  * examples/demo.rs:52-63).
  *
  * The incremental executor wraps the replay of the stored state in a
  * [[CacheReplayMarker]]; [[CacheReplayStrategy]] (registered through
  * `spark.experimental.extraStrategies` — public API, no session
  * extension required) plans it to a [[CacheReplayExec]] that:
  *   - names the node `QueryCacheReplay(hit|miss, fp=…, wm=…)` so
  *     `df.explain()` shows the query was answered from cache state;
  *   - counts replayed state rows in an SQLMetric (visible in the UI /
  *     `EXPLAIN ANALYZE`-style inspection).
  */
final case class CacheReplayMarker(
    child: LogicalPlan,
    fingerprint: String,
    hit: Boolean,
    watermarkMicros: Option[Long]) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object CacheReplayStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: CacheReplayMarker =>
      CacheReplayExec(m.fingerprint, m.hit, m.watermarkMicros,
        planLater(m.child)) :: Nil
    case _ => Nil
  }

  /** idempotently register on a session (public experimental hook) */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(CacheReplayStrategy))
      spark.experimental.extraStrategies = cur :+ CacheReplayStrategy
  }
}

final case class CacheReplayExec(
    fingerprint: String,
    hit: Boolean,
    watermarkMicros: Option[Long],
    child: SparkPlan) extends UnaryExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numReplayedRows" -> SQLMetrics.createMetric(sparkContext,
      "rows answered from cache state"))

  override def nodeName: String = {
    val status = if (hit) "hit" else "miss"
    val wm = watermarkMicros.map(w => s", wm=$w").getOrElse("")
    s"QueryCacheReplay($status, fp=${fingerprint.take(8)}$wm)"
  }

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override def outputOrdering: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val replayed = longMetric("numReplayedRows")
    child.execute().mapPartitions { it =>
      it.map { row => replayed += 1; row }
    }
  }

  /** No-job fast path: the executor puts this marker on top of the
    * finalize projection, so when the stored state lives on the driver
    * the optimizer folds the whole child to a LocalRelation — answering
    * collect() is then a local array copy, not a Spark job. Falls through
    * to the default (job-launching) path for any other child shape
    * (e.g. durable parquet-backed state). */
  override def executeCollect(): Array[InternalRow] = child match {
    case l: org.apache.spark.sql.execution.LocalTableScanExec =>
      val rows = l.executeCollect()
      longMetric("numReplayedRows") += rows.length
      rows
    case _ => super.executeCollect()
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
