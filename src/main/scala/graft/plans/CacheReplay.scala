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
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PushThroughCacheReplay))
      spark.experimental.extraOptimizations = opts :+ PushThroughCacheReplay
  }
}

/** The marker is opaque to Catalyst's predicate pushdown (built-in rules
  * match concrete node types), so a dashboard's parent filter —
  * `…GROUP BY hour … WHERE/HAVING hour >= X` re-applied above the cache
  * answer — would otherwise evaluate ABOVE the replay and the warm run
  * would scan the whole stored state. This rule hoists a deterministic
  * parent Filter below the marker and re-runs Catalyst's own
  * PushDownPredicates on the subtree until stable, so the bound reaches
  * the state scan (parquet row-group pruning on the bucket column — the
  * reason state files are written TIMESTAMP_MICROS). Rows the metric
  * counts are then the rows actually ANSWERED, post-filter. */
object PushThroughCacheReplay
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Filter(cond, m: CacheReplayMarker) if cond.deterministic =>
      var inner: LogicalPlan = Filter(cond, m.child)
      var i = 0
      var changed = true
      while (changed && i < 10) {
        val next =
          org.apache.spark.sql.graftshim.Shims.pushDownPredicates(inner)
        changed = !next.fastEquals(inner)
        inner = next
        i += 1
      }
      m.copy(child = inner)
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
