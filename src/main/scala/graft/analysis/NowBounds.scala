package graft.analysis

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}

import graft.QueryCacheConfig

/** Pre-freeze capture of a `now()`-derived bound, for transparent mode.
  *
  * Catalyst's ComputeCurrentTime (optimizer "Finish Analysis" batch)
  * replaces every now()/current_timestamp/current_date leaf with a
  * PER-RUN literal before any injected optimizer rule can see the plan —
  * so a transparently-cached `ts >= now() - INTERVAL` query would
  * fingerprint differently on every run and never hit (the round-2
  * KNOWN LIMIT in QueryCacheExtensions).
  *
  * [[FrozenNowBound]] hides the original bound expression from
  * ComputeCurrentTime by storing it in a NON-child field of a leaf
  * expression: an analyzer post-hoc rule ([[NowBoundWrapRule]]) wraps
  * pure-now() bound sides at analysis time (pre-freeze), the wrapper
  * rides untouched through the optimizer, and the cache rewrite either
  * consumes it as a dynamic bound (re-applied over bucket starts at
  * answer time) or restores it to this run's frozen literal before
  * execution. Two runs of the same query now canonicalize identically —
  * warm hits with no per-run state bloat.
  */
final case class FrozenNowBound(orig: Expression) extends LeafExpression
    with Unevaluable {
  override def dataType: DataType = orig.dataType
  override def nullable: Boolean = orig.nullable
  override def toString: String = s"frozen_now_bound(${orig.sql})"
  override def sql: String = toString
}

object NowBounds {

  private[graft] def isNowLeaf(e: Expression): Boolean = e match {
    case _: CurrentTimestamp | _: Now | _: CurrentDate | _: LocalTimestamp => true
    case _ => false
  }

  private[graft] def containsNow(e: Expression): Boolean =
    isNowLeaf(e) || e.children.exists(containsNow)

  /** a bound side that is a pure function of now(): no column references,
    * no subqueries, deterministic modulo the per-run now */
  private def pureNowBound(e: Expression): Boolean =
    containsNow(e) && e.references.isEmpty && e.deterministic &&
      !e.exists(_.isInstanceOf[PlanExpression[_]])

  private def isNeedle(e: Expression, needles: Set[String]): Boolean = e match {
    case a: Attribute => needles.contains(a.name.toLowerCase)
    case _ => false
  }

  /** Wrap every `ts >(=) f(now())` / mirrored `f(now()) <(=) ts` TOP-LEVEL
    * conjunct (ts a configured temporal column) so the pre-freeze shape
    * survives into the optimizer. Only And-chain conjuncts are wrapped —
    * that is exactly the shape Stability/stripConjunct can consume as a
    * dynamic bound; a bound nested under OR/NOT would classify Stable
    * with its now() hidden and take the crash-then-fallback path instead
    * of clean vanilla execution.
    *
    * ALL-OR-NOTHING: if any now() leaf would remain UNwrapped anywhere
    * in the plan (an upper bound `ts < now()`, now() in a projection, a
    * bound under OR), nothing is wrapped. ComputeCurrentTime freezes
    * unwrapped leaves at optimization time while a wrapper is frozen
    * later (answer time, or the restore safety net) — mixing the two
    * would give one query two DIFFERENT now() instants, breaking
    * Spark's all-now()s-agree guarantee. Idempotent: a wrapped side has
    * no now() leaves. */
  def wrap(plan: LogicalPlan, config: QueryCacheConfig): LogicalPlan = {
    val needles = config.temporalColumns.map(_.toLowerCase) +
      config.defaultTemporalColumn.toLowerCase
    def wrapConjunct(e: Expression): Expression = e match {
      case And(l, r) => And(wrapConjunct(l), wrapConjunct(r))
      case b @ GreaterThan(l, r) if isNeedle(l, needles) && pureNowBound(r) =>
        b.copy(right = FrozenNowBound(r))
      case b @ GreaterThanOrEqual(l, r) if isNeedle(l, needles) && pureNowBound(r) =>
        b.copy(right = FrozenNowBound(r))
      case b @ LessThan(l, r) if isNeedle(r, needles) && pureNowBound(l) =>
        b.copy(left = FrozenNowBound(l))
      case b @ LessThanOrEqual(l, r) if isNeedle(r, needles) && pureNowBound(l) =>
        b.copy(left = FrozenNowBound(l))
      case other => other
    }
    val wrapped = plan.transformUp {
      case f @ Filter(cond, child) if containsNow(cond) =>
        val w = wrapConjunct(cond)
        if (w fastEquals cond) f else Filter(w, child)
    }
    val nowLeft = wrapped.exists(_.expressions.exists(containsNow)) ||
      wrapped.subqueriesAll.exists(_.exists(_.expressions.exists(containsNow)))
    if (nowLeft) plan else wrapped
  }

  /** Replace now() leaves with this run's literals, exactly the way
    * ComputeCurrentTime would: current_timestamp is the UTC instant;
    * current_date / localtimestamp are WALL-CLOCK values in the session
    * time zone (a UTC-derived day would be off by the zone offset near
    * midnight). */
  def freeze(e: Expression, nowMicros: Long, sessionTz: String): Expression = {
    val zone = java.time.ZoneId.of(sessionTz)
    val localNow = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(nowMicros / 1000000L,
        (nowMicros % 1000000L) * 1000L), zone)
    val localNowMicros =
      localNow.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        localNow.getNano / 1000L
    def lit(leaf: Expression): Expression = leaf match {
      case _: CurrentTimestamp | _: Now => Literal(nowMicros, TimestampType)
      case _: LocalTimestamp => Literal(localNowMicros, TimestampNTZType)
      case _: CurrentDate => Literal(localNow.toLocalDate.toEpochDay.toInt, DateType)
      case other => other
    }
    // a FrozenNowBound payload was hidden from the WHOLE "Finish Analysis"
    // batch, including ReplaceExpressions — substitute RuntimeReplaceable
    // forms (now() - INTERVAL is DatetimeSub) or they reach codegen
    val replaced = e.transformUp {
      case r: RuntimeReplaceable => r.replacement
    }
    // transformUp never revisits a node it replaced, so a root-level leaf
    // is handled by the explicit lit() call on the result
    lit(replaced.transformUp { case l if isNowLeaf(l) => lit(l) })
  }

  /** freeze + constant-fold: a literal RHS keeps the comparison eligible
    * for parquet filter pushdown, which a constant ARITHMETIC RHS is not */
  def freezeFold(e: Expression, nowMicros: Long, sessionTz: String): Expression = {
    val frozen = freeze(e, nowMicros, sessionTz)
    if (frozen.foldable)
      try Literal.create(frozen.eval(EmptyRow), frozen.dataType)
      catch { case scala.util.control.NonFatal(_) => frozen }
    else frozen
  }

  /** Safety net run on every plan leaving the transparent optimizer rule:
    * any wrapper the cache rewrite did not consume (bail path, or a plan
    * shape decide() rejected) becomes this run's frozen literal — vanilla
    * semantics, never an Unevaluable reaching execution. */
  def restoreAll(plan: LogicalPlan, nowMicros: Long,
      sessionTz: String): LogicalPlan =
    if (!plan.exists(_.expressions.exists(
        _.exists(_.isInstanceOf[FrozenNowBound]))))
      plan
    else plan.transformAllExpressions {
      case fb: FrozenNowBound => freezeFold(fb.orig, nowMicros, sessionTz)
    }
}
