package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{
  Dataset => ClassicDataset,
  SparkSession => ClassicSparkSession,
  ExpressionUtils
}
import org.apache.spark.sql.execution.QueryExecution

/** Thin bridge to `private[sql]` Spark internals (Spark 4.x `classic` impl).
  *
  * Lives under `org.apache.spark.sql` so the Scala access checks for
  * `private[sql]` members pass; keeps every internal touch point in ONE
  * file so version bumps have a single seam. Public Spark API is used
  * everywhere else.
  */
object Shims {

  /** Wrap an analyzed/constructed logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Catalyst expression -> user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** User-facing Column -> Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Bloom-filter aggregate over a LONG column (the engine's own
    * runtime-filter sketch, reused as a user-level operator): returns
    * the filter's binary form. `numBits` sizes the filter —
    * ~10 bits/item gives ~1% false positives. */
  def bloomFilterAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Membership probe against a CONSTANT bloom binary (the expression
    * requires a foldable filter side — collect the small filter to the
    * driver and pass `lit(bytes)`). No false negatives; false positives
    * at the filter's design rate. */
  def mightContain(bloom: Column, value: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      expression(bloom), expression(value)))

  /** QueryExecution of a DataFrame (analyzed plan access). */
  def queryExecution(df: DataFrame): QueryExecution =
    df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]].queryExecution

  /** Source locations feeding a plan — file-relation root paths (v1 data
    * sources) plus v2 relation identifiers. Canonical plan strings omit
    * these, so fingerprints must append them (two tables with the same
    * schema must not share cache state). */
  def sourcePaths(plan: LogicalPlan): Seq[String] = plan.collect {
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          h.location.rootPaths.map(_.toString)
        case other => Seq(other.toString)
      }
    case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      Seq(d.name)
  }.flatten

  /** Run `f` against a session whose SQL confs include `kv` — WITHOUT
    * mutating the caller's session. A thread-local SQLConf override does
    * not survive SQLExecution.withNewExecutionId's conf propagation, and
    * a set/restore on the shared session races concurrent queries (two
    * interleaved save/restores can permanently corrupt a conf), so the
    * overrides go on a CLONED session: same SparkContext, shared state,
    * and a full copy of the runtime conf/temp views (cloneSession, the
    * same mechanism Spark's own AQE/streaming use for isolated conf
    * views). `f` receives the clone; rebind plans with [[ofRows]]. With
    * no overrides the original session is passed straight through. */
  def withIsolatedConf[A](spark: SparkSession, kv: (String, String)*)(
      f: SparkSession => A): A =
    if (kv.isEmpty) f(spark)
    else {
      val cloned = spark.asInstanceOf[ClassicSparkSession].cloneSession()
      kv.foreach { case (k, v) => cloned.conf.set(k, v) }
      f(cloned)
    }

  /** Catalyst's own predicate-pushdown rule, applied to a subtree — used
    * to push a filter that was hoisted below a custom marker node down
    * through the finalize Project / merge Aggregate to the scan (the
    * optimizer's built-in batch cannot see through custom nodes). */
  def pushDownPredicates(plan: LogicalPlan): LogicalPlan =
    org.apache.spark.sql.catalyst.optimizer.PushDownPredicates(plan)

  /** Is this plan node a scan leaf the cache rewrite may sit on top of?
    * (file relation, v2 relation, or in-memory rows for tests) */
  def isScanLeaf(p: LogicalPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
    case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => true
    case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
    case _ => false
  }
}
