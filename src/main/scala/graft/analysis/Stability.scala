package graft.analysis

import org.apache.spark.sql.catalyst.expressions._

/** Predicate stability analysis — a 4-state abstract interpretation of a
  * filter predicate w.r.t. the temporal columns
  * (reference: DynamicLowerBound, src/aggregate.rs:690-809).
  *
  * States:
  *  - [[Stability.Stable]]   — predicate is identical across runs; caching OK.
  *  - [[Stability.FoundNow]] — a now()/current_timestamp/current_date leaf
  *                             was seen (inside some expression).
  *  - [[Stability.Found]]    — the predicate contains a dynamic lower bound
  *                             `ts >(=) f(now())` on a needle column.
  *  - [[Stability.Abandon]]  — volatile/unknown construct; caching impossible.
  *
  * Differences from the reference, on purpose:
  *  - `BETWEEN` can't panic (reference todo!() at src/aggregate.rs:786-788,
  *    SURVEY §2.4 B2): Spark's parser desugars it to `>= AND <=` before we
  *    ever see it, and the generic fallback covers any other shape.
  *  - Mirrored bounds flip strictness correctly (`f(now()) < ts` ⇒ `ts >
  *    f(now())`), fixing the inverted flip of src/aggregate.rs:754-757
  *    (SURVEY §2.4 B3).
  *  - Unknown deterministic constructs without now() are Stable rather than
  *    Abandon (e.g. OR, IN, LIKE on literals): determinism is the actual
  *    invariant caching needs, and Catalyst tracks it for every expression.
  */
sealed trait Stability {
  /** Lattice join (reference: either(), src/aggregate.rs:799-808):
    * Abandon dominates; two distinct bounds → Abandon; Found > FoundNow >
    * Stable. */
  def join(other: Stability): Stability = (this, other) match {
    case (Stability.Abandon, _) | (_, Stability.Abandon) => Stability.Abandon
    case (Stability.Found(_), Stability.Found(_)) => Stability.Abandon
    case (f @ Stability.Found(_), _) => f
    case (_, f @ Stability.Found(_)) => f
    case (Stability.FoundNow, _) | (_, Stability.FoundNow) => Stability.FoundNow
    case _ => Stability.Stable
  }
}

object Stability {
  case object Stable extends Stability
  case object FoundNow extends Stability
  final case class Found(bound: Expression) extends Stability
  case object Abandon extends Stability

  private def isNowLeaf(e: Expression): Boolean = e match {
    case _: CurrentTimestamp | _: Now | _: CurrentDate => true
    case _: LocalTimestamp => true
    case _ => false
  }

  private def containsNow(e: Expression): Boolean =
    isNowLeaf(e) || e.children.exists(containsNow)

  private def isNeedle(e: Expression, needles: Set[String]): Boolean = e match {
    case a: Attribute => needles.contains(a.name.toLowerCase)
    case _ => false
  }

  /** reference: DynamicLowerBound::find, src/aggregate.rs:700-788.
    * `needles` = lower-cased temporal column names to watch for bounds on. */
  def find(expr: Expression, needles: Set[String]): Stability = expr match {
    case _: Literal => Stable
    case _: Attribute => Stable
    case e if isNowLeaf(e) => FoundNow
    // transparent-mode pre-freeze capture (NowBoundWrapRule): behaves as
    // its hidden now()-derived payload — containsNow can't see inside
    case _: FrozenNowBound => FoundNow

    // ts >(=) rhs  — candidate dynamic lower bound (src/aggregate.rs:731-744)
    case b @ GreaterThan(l, r) if isNeedle(l, needles) => boundFrom(b, r, needles)
    case b @ GreaterThanOrEqual(l, r) if isNeedle(l, needles) =>
      boundFrom(b, r, needles)
    // lhs <(=) ts — mirrored form (src/aggregate.rs:745-769, with the
    // strictness flip done correctly, see B3 above)
    case b @ LessThan(l, r) if isNeedle(r, needles) => boundFrom(b, l, needles)
    case b @ LessThanOrEqual(l, r) if isNeedle(r, needles) =>
      boundFrom(b, l, needles)

    // connectives/arithmetic recurse both sides (src/aggregate.rs:770-777)
    case And(l, r) => find(l, needles).join(find(r, needles))
    case EqualTo(l, r) => find(l, needles).join(find(r, needles))
    case Add(l, r, _) => find(l, needles).join(find(r, needles))
    case Subtract(l, r, _) => find(l, needles).join(find(r, needles))
    case Multiply(l, r, _) => find(l, needles).join(find(r, needles))
    case Divide(l, r, _) => find(l, needles).join(find(r, needles))
    case Remainder(l, r, _) => find(l, needles).join(find(r, needles))

    case Not(c) => stableOnly(c, needles)
    case UnaryMinus(c, _) => stableOnly(c, needles)
    // casts are value-preserving: propagate the child verbatim (the
    // analyzer wraps dynamic bounds like `now() - interval` in a Cast,
    // which must stay detectable as a bound side)
    case c: Cast => find(c.child, needles)

    // subqueries: a PlanExpression's `deterministic` flag only describes
    // its OUTER references, not the nested plan's data — `k IN (SELECT …)`
    // would otherwise be classified Stable, get cached, and silently serve
    // stale results when the subquery's table changes (the watermark only
    // rescans the fact side; the subquery's sources aren't even part of
    // the fingerprint). Bail out.
    case e if e.exists(_.isInstanceOf[PlanExpression[_]]) => Abandon

    // generic fallback: deterministic expressions are stable across runs
    // unless they contain a now() leaf somewhere (Catalyst marks
    // current_timestamp deterministic because ComputeCurrentTime freezes
    // it per query — per RUN it still varies, which is what matters here)
    case e if e.deterministic =>
      if (containsNow(e)) FoundNow else Stable
    case _ => Abandon
  }

  private def stableOnly(child: Expression, needles: Set[String]): Stability =
    find(child, needles) match {
      case Stable => Stable
      case _ => Abandon
    }

  private def boundFrom(whole: Expression, boundSide: Expression,
      needles: Set[String]): Stability =
    find(boundSide, needles) match {
      case Stable => Stable // static bound; part of the fingerprint
      // ts >(=) f(now()) — but only if f is a pure function of now()
      // (a bound like `other_col + now()` can't be re-applied over the
      // merged state, which has only bucket/state columns)
      case FoundNow if boundSide.references.isEmpty => Found(whole)
      case FoundNow => Abandon
      case _ => Abandon
    }
}
