package graft.analysis

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}

import graft.QueryCacheConfig

/** Recognizes temporal bucketing expressions in a GROUP BY
  * (reference: find_temporal_group_by, src/aggregate.rs:51-67).
  *
  * A group expression qualifies when it is `fn(..., temporal_col, ...)`
  * with `fn` in the configured bucketing set (`date_trunc`, `window`, ...)
  * and the single column it references an allowed temporal column. We also
  * accept the bare temporal column itself as a bucket (a strictly finer
  * bucketing the reference doesn't take; state cardinality is then bounded
  * by the cache's maxStateRows guard).
  */
object TemporalGroupBy {

  def find(expr: Expression, config: QueryCacheConfig): Option[Attribute] =
    expr match {
      case a: Attribute if config.allowTemporalColumn(a.name) => Some(a)
      case e if config.allowGroupByFunction(e.prettyName) =>
        val attrs = e.references.toSeq
        attrs match {
          case Seq(a) if config.allowTemporalColumn(a.name) => Some(a)
          case _ => None
        }
      case _ => None
    }

  /** All temporal group-bys in a GROUP BY list; >1 means not cacheable
    * (reference bails at src/aggregate.rs:97-104). */
  def findAll(groupExprs: Seq[Expression], config: QueryCacheConfig): Seq[Attribute] =
    groupExprs.flatMap(find(_, config))

  /** Optimizer-stage plans (transparent mode) have had
    * PullOutGroupingExpressions replace complex grouping expressions with
    * `_groupingexpression` attributes computed in a Project directly below
    * the Aggregate — resolve such an attribute back to its defining
    * expression so the bucket stays recognizable. Analyzed plans (facade)
    * pass through unchanged. */
  def resolveThroughChild(e: Expression, child: LogicalPlan): Expression =
    e match {
      case a: Attribute =>
        def lookup(p: LogicalPlan): Option[Expression] = p match {
          case Project(list, _) =>
            list.collectFirst {
              case al: Alias if al.exprId == a.exprId => al.child
            }
          case SubqueryAlias(_, ch) => lookup(ch)
          case _ => None
        }
        lookup(child).getOrElse(a)
      case other => other
    }
}
