package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.functions.seeded_hash64

/** Distinct-count sketches beyond Spark's built-in HLL++
  * (`approx_count_distinct`, used by the q_sketch_distinct inventory
  * query).
  *
  * KMV — k minimum (hash) values: hash every key with the library's
  * deterministic 64-bit hash, keep the k smallest DISTINCT hashes per
  * group, and estimate the distinct count as (k-1)/u_k where u_k is the
  * k-th smallest hash mapped to the unit interval. Standard error is
  * ~1/sqrt(k-2) (~6% at k=256). Unlike HLL++'s register encoding, every
  * step is plain relational algebra over a documented hash — so the
  * whole sketch is independently reproducible (the DuckDB oracle
  * recomputes it from scratch with HUGEINT modular arithmetic).
  *
  * Scale shape: one shuffle to dedup (group, hash) pairs with map-side
  * combine, then a per-group top-k window whose input is already
  * hash-distinct. Merging two KMV sketches = union the hash sets and
  * re-take the k smallest, which is exactly what the shuffled dedup +
  * window computes in one pass — no driver-side state at any size.
  */
object Sketches {

  /** Per-group KMV distinct estimate for `key`.
    *
    * Output: group columns + `n_kmv` (retained hash count, < k means the
    * group's true distinct count is exact) + `est_distinct` (double).
    * NULL keys are ignored (count(DISTINCT) semantics); a group whose
    * keys are ALL null yields no output row.
    * Both engines compute the estimate with the identical IEEE op
    * sequence — (k-1) / ((h_k + 2^63) / 2^64), all constants powers of
    * two — so results are bit-comparable after a defensive round(4). */
  def kmvDistinct(df: DataFrame, groupBy: Seq[String], key: Column,
      k: Int = 256): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3, got $k")
    val g = groupBy.map(col)
    // distinct (group, hash): same key always produces the same hash, so
    // duplicates collapse in the map-side combine before the shuffle.
    // NULL keys hash to a null row — dropped, because count(DISTINCT)
    // ignores nulls and a null _h would otherwise rank first (NULLS
    // FIRST) and count toward n_kmv while never being the k-th maximum.
    val hashed = df
      .select(g :+ seeded_hash64(key.cast("string"), lit(0L)).as("_h"): _*)
      .filter(col("_h").isNotNull)
      .distinct()
    val w = Window.partitionBy(g: _*).orderBy(col("_h"))
    // u_k maps the signed 64-bit k-th minimum onto (0,1): (h + 2^63)/2^64
    val uK = (col("_hk").cast("double") + lit(9.223372036854775808e18)) /
      lit(1.8446744073709551616e19)
    hashed
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_kmv"), max(col("_h")).as("_hk"))
      .select(g ++ Seq(
        col("n_kmv"),
        when(col("n_kmv") < k, col("n_kmv").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) / uK, 4))
          .as("est_distinct")): _*)
  }
}
