package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.QueryCacheConfig
import graft.exec.IncrementalAggExecutor

/** Transparent mode (reference: with_query_cache registering a planner +
  * optimizer rule on the SessionStateBuilder, src/lib.rs:74-87): plain
  * `spark.sql(...)` / DataFrame actions get the incremental-agg rewrite
  * with no facade call.
  *
  * Two ways in:
  *  - running session:  `QueryCacheTransparent.enable(spark, config)`
  *    (public `spark.experimental.extraOptimizations` hook);
  *  - session config:   `spark.sql.extensions=graft.ext.QueryCacheExtensions`
  *    plus `QueryCacheTransparent.configure(config)` before first use.
  *
  * The rule runs driver-side Spark jobs (partial agg + cache put) while
  * the outer query is being optimized — the same planning-time cache I/O
  * the reference does (async cache entry fetch at physical planning,
  * src/aggregate.rs:367). A thread-local guards the rule against firing
  * on its own internal queries; every action is one cache "run", exactly
  * like one `ctx.sql().collect()` in the reference.
  */
object QueryCacheTransparent {
  @volatile private[ext] var config: Option[QueryCacheConfig] = None
  private[ext] val inRewrite: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** register the shared config (used by both entry paths) */
  def configure(cfg: QueryCacheConfig): Unit = { config = Some(cfg) }

  /** enable on an already-running session */
  def enable(spark: SparkSession, cfg: QueryCacheConfig): Unit = {
    configure(cfg)
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[QueryCacheRule]))
      spark.experimental.extraOptimizations = existing :+ new QueryCacheRule(spark)
  }

  def disable(spark: SparkSession): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[QueryCacheRule])
    config = None
  }
}

final class QueryCacheRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import QueryCacheTransparent._

  /** our own rewritten/internal plans carry "_g"/"_s" state column names */
  private def looksInternal(plan: LogicalPlan): Boolean =
    plan.exists {
      case a: Aggregate =>
        a.aggregateExpressions.exists(ne =>
          ne.name.startsWith("_s") || ne.name.startsWith("_g"))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    config match {
      case Some(cfg) if !inRewrite.get() &&
          plan.exists(_.isInstanceOf[Aggregate]) && !looksInternal(plan) =>
        inRewrite.set(true)
        try {
          new IncrementalAggExecutor(cfg).rewritePlan(spark, plan).getOrElse(plan)
        } catch {
          case e: Exception =>
            cfg.log.warn("-", s"transparent rewrite failed, running vanilla: ${e.getMessage}")
            plan
        } finally inRewrite.set(false)
      case _ => plan
    }
  }
}

/** `spark.sql.extensions` entry point. */
class QueryCacheExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(session => new QueryCacheRule(session))
}
