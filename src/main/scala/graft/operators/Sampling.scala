package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.functions.seeded_hash64

/** Deterministic sampling for training-data mixing (north-star pipeline
  * mandate — no reference counterpart; the reference is a query cache).
  *
  * Mixing a 100 TB corpus means drawing per-domain / per-language quotas
  * reproducibly: the same row set must come back on every run, on any
  * cluster size, and (for the Bernoulli form) a row's fate must not
  * change when the corpus grows — otherwise every pipeline rerun trains
  * on a different dataset. Spark's own `sample()`/`TABLESAMPLE` are
  * seeded per-partition, so their output changes with partitioning and
  * file order; these operators key randomness off a CONTENT hash
  * ([[graft.functions.Hash64]], deterministic across JVMs) instead.
  */
object Sampling {

  /** normalized hash in [0, 1): (h + 2⁶³) / 2⁶⁴ — both constants are
    * powers of two, so the IEEE op sequence is exactly reproducible in
    * any engine (the DuckDB oracle mirrors it bit-for-bit) */
  private def unitHash(key: Column, seed: Long): Column =
    (seeded_hash64(key.cast("string"), lit(seed)).cast("double") +
      lit(9.223372036854775808e18)) / lit(1.8446744073709551616e19)

  /** At most `n` rows per stratum, chosen by seeded-hash order — a
    * reproducible pseudorandom top-n per group. One shuffle (the window
    * partition by stratum); no driver participation. Skewed strata cost
    * one task's sort of that stratum — for quota sampling that is the
    * semantics (a global per-stratum rank NEEDS the stratum together);
    * rank-free Bernoulli thinning is [[bernoulli]].
    *
    * The `key` must be unique per row (an id column): it both seeds the
    * hash and breaks ties, making the selected SET independent of
    * partitioning and execution order.
    */
  def stratifiedTopN(df: DataFrame, stratum: Column, key: Column, n: Int,
      seed: Long = 0L): DataFrame = {
    val rank = row_number().over(Window.partitionBy(stratum)
      .orderBy(seeded_hash64(key.cast("string"), lit(seed)), key))
    df.withColumn("_sample_rank", rank)
      .filter(col("_sample_rank") <= n)
      .drop("_sample_rank")
  }

  /** Hash-deterministic Bernoulli sample: keep rows whose normalized
    * content hash falls below `fraction`. ZERO shuffles — a codegen'd
    * filter fused into the scan stage — and append-stable: a row's
    * keep/drop fate depends only on (key, seed), never on partitioning,
    * cluster size, or rows added later. Changing `seed` redraws. */
  def bernoulli(df: DataFrame, key: Column, fraction: Double,
      seed: Long = 0L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction")
    df.filter(unitHash(key, seed) < fraction)
  }
}
