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
  *
  * KNOWN LIMIT: by the time this rule runs, Catalyst's ComputeCurrentTime
  * has already frozen `now()`/`current_timestamp()` to per-run literals,
  * so a now()-relative filter fingerprints DIFFERENTLY on every run —
  * such queries always miss here (and each run writes a fresh state
  * entry). Use the [[graft.QueryCacheSession]] facade for now()-relative
  * bounds (it sees the pre-freeze plan and handles them at bucket
  * granularity); transparent mode is for static-bound/unbounded queries.
  */
object QueryCacheTransparent {
  @volatile private[ext] var executor: Option[IncrementalAggExecutor] = None
  private[ext] def config: Option[QueryCacheConfig] = executor.map(_.config)
  private[ext] val inRewrite: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** register the shared config (used by both entry paths); one executor
    * per config so its per-fingerprint schema memo survives across runs */
  def configure(cfg: QueryCacheConfig): Unit = {
    executor = Some(new IncrementalAggExecutor(cfg))
  }

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
    executor = None
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
    executor match {
      case Some(exec) if !inRewrite.get() &&
          plan.exists(_.isInstanceOf[Aggregate]) && !looksInternal(plan) =>
        inRewrite.set(true)
        try {
          exec.rewritePlan(spark, plan).getOrElse(plan)
        } catch {
          case e: Exception =>
            exec.config.log.warn("-",
              s"transparent rewrite failed, running vanilla: ${e.getMessage}")
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
