package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving as pure built-in column arithmetic.
  *
  * Multi-dimensional clustering: sorting by the interleaved key places
  * rows that are close in EVERY dimension into the same neighborhood, so
  * a range-partitioned, sorted write yields files whose per-column
  * min/max cover small hyper-rectangles — parquet stats then skip files
  * and row groups for predicates on ANY clustered column, not just the
  * leading sort key of a lexicographic layout. This is the layout lever
  * engines bolt onto Spark for 100 TB tables (Delta OPTIMIZE ZORDER BY);
  * here it is five shift/mask ops per dimension — whole-stage codegen,
  * no UDF, and bit-for-bit reproducible in any engine (the DuckDB oracle
  * recomputes it with the same integer ops).
  *
  * The interleave takes 16-bit inputs (values 0..65535). Raw columns are
  * first mapped into that domain by [[rankBucket]] — EQUI-DEPTH buckets
  * from `approxQuantile` boundaries, so a skewed column still spreads
  * evenly across the key space (equi-width bucketing would collapse a
  * heavy-tailed column into a handful of codes and lose the clustering).
  */
object ZOrder {

  /** spread the low 16 bits of `x` to the even bit positions 0,2,…,30
    * (the classic magic-number sequence; each step doubles the gap) */
  private def spread16(x: Column): Column = {
    val a = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key of two 16-bit codes: bits of `a` on even positions, `b`
    * on odd — a 32-bit non-negative long. */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** spread the low 32 bits of `x` to the even positions 0,2,…,62 */
  private def spread32(x: Column): Column = {
    val a = x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val d = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x3333333333333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton key of FOUR 16-bit codes, by pairwise composition:
    * `interleave32(interleave16(a,c), interleave16(b,d))` yields the bit
    * sequence a₀b₀c₀d₀a₁b₁c₁d₁… — the exact 4-dimensional Morton order —
    * in one 64-bit long. Same five-shift/mask cost profile, plain
    * codegen arithmetic. NOTE: bit 63 is `d`'s top bit, so a key with
    * d ≥ 2¹⁵ is negative under SIGNED ordering — sort by
    * `z ^ Long.MinValue` for full-domain codes, or keep codes ≤ 2¹⁵−1
    * ([[rankBucket]] with the writer's ≤ 255 buckets always does). */
  def interleave16x4(a: Column, b: Column, c: Column, d: Column): Column =
    spread32(interleave16(a, c))
      .bitwiseOR(shiftleft(spread32(interleave16(b, d)), 1))

  /** Equi-depth bucket code in [0, boundaries.length]: the number of
    * `approxQuantile` boundaries at or below the value. O(B) per row as
    * a literal-array aggregate — codegen'd, no join, no shuffle; B ≤ 255
    * keeps the code in 16-bit range with headroom. Nulls map to bucket 0
    * (they sort together at the low edge of the curve). */
  def rankBucket(v: Column, boundaries: Seq[Double]): Column = {
    require(boundaries.nonEmpty && boundaries.size <= 65535,
      s"need 1..65535 boundaries, got ${boundaries.size}")
    val arr = lit(boundaries.toArray)
    aggregate(arr, lit(0L),
      (acc, b) => acc + when(v.isNotNull && v.cast("double") >= b, 1L)
        .otherwise(0L))
  }
}
