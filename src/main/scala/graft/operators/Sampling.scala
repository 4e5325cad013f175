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

  /** Per-operator draw: the OP TAG is mixed into the hash INPUT so that
    * composing these operators (bernoulli → mixture → upsample, the
    * advertised mixing pipeline) draws INDEPENDENTLY per stage. With a
    * shared untagged draw the stages would be fully correlated — e.g.
    * every bernoulli(0.4) survivor has unitHash < 0.4, so a downstream
    * upsample(1.5) extra-copy test `unitHash < 0.5` would pass for ALL
    * of them, realizing factor 2.0. Tag-in-input (not tag-in-seed)
    * keeps the DuckDB oracles on the existing seed-0 Hash64 recompute. */
  private def drawHash(key: Column, seed: Long, tag: String): Column =
    seeded_hash64(concat(lit(tag), key.cast("string")), lit(seed))

  /** normalized hash in [0, 1): (h + 2⁶³) / 2⁶⁴ — both constants are
    * powers of two, so the IEEE op sequence is exactly reproducible in
    * any engine (the DuckDB oracle mirrors it bit-for-bit) */
  private def unitHash(key: Column, seed: Long, tag: String): Column =
    (drawHash(key, seed, tag).cast("double") +
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
      .orderBy(drawHash(key, seed, "st:"), key))
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
    // fraction 1.0 keeps EVERY row unconditionally: unitHash can round
    // to exactly 1.0 (longs within ~2⁹ of 2⁶³ cast to 2⁶³ in double),
    // so `< 1.0` alone would drop ~1 row per 2⁵⁵ — a contract break,
    // not noise, at 10¹²-row scale
    if (fraction >= 1.0) df
    else df.filter(unitHash(key, seed, "be:") < fraction)
  }

  /** Budget-driven domain MIXTURE sample: draw ~`budget` rows whose
    * domain proportions follow `weights` (normalized internally).
    * Per-domain keep fraction `f_d = min(1, budget·w_d / n_d)` — a
    * domain with fewer rows than its quota is kept whole (capped, not
    * re-allocated: re-allocation would make every domain's fate depend
    * on every other's count, losing per-domain reproducibility).
    * Domains absent from `weights` are dropped (weight 0).
    *
    * Plan shape: one map-side-combined count agg over the (few) domains
    * + a broadcast join of the resulting fraction table back onto the
    * corpus + a zero-shuffle content-hash draw (independently tagged,
    * see [[drawHash]], so composing with [[bernoulli]]/[[upsample]]
    * draws fresh randomness per stage).
    * Unlike [[bernoulli]] this is a SNAPSHOT op — fractions depend on
    * observed counts, so appended rows shift them; re-mixing a grown
    * corpus is a new draw by design (the quota is the contract).
    *
    * All fraction arithmetic is plain IEEE double in a fixed op order
    * (`(budget · w) / n`, weights normalized by their sum) so an
    * external engine (the DuckDB oracle) reproduces the kept set
    * bit-for-bit. */
  def mixture(df: DataFrame, domain: Column, key: Column,
      weights: Map[String, Double], budget: Long,
      seed: Long = 0L): DataFrame = {
    require(budget >= 0, s"budget=$budget")
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      "weights must be non-empty and positive")
    val spark = df.sparkSession
    import spark.implicits._
    val wSum = weights.values.sum
    val wDf = weights.toSeq.sortBy(_._1)
      .map { case (d, w) => (d, w / wSum) }
      .toDF("_mix_domain", "_mix_w")
    val counts = df.groupBy(domain.as("_mix_domain"))
      .agg(count(lit(1)).as("_mix_n"))
    val fracs = counts.join(wDf, "_mix_domain").withColumn("_mix_frac",
      least(lit(1.0),
        lit(budget.toDouble) * col("_mix_w") / col("_mix_n").cast("double")))
    df.join(broadcast(fracs), domain === col("_mix_domain"))
      // the >= 1.0 arm guarantees the documented keep-whole cap even for
      // the ~2⁻⁵⁵ of keys whose unit hash rounds to exactly 1.0
      .filter(col("_mix_frac") >= 1.0 ||
        unitHash(key, seed, "mx:") < col("_mix_frac"))
      .drop("_mix_domain", "_mix_w", "_mix_n", "_mix_frac")
  }

  /** Deterministic EPOCH SHUFFLE into `shards` output shards — the
    * training-data writer step: every row gets a pseudorandom but fully
    * reproducible (shard, position) so a downstream writer can emit S
    * shard files whose concatenation is a shuffled epoch. `shard` is
    * the content hash mod S (partition-invariant, append-stable);
    * `shard_pos` is the dense 0-based rank within the shard by (hash,
    * key) — changing `seed` produces an independent permutation for the
    * next epoch.
    *
    * Plan shape: ONE shuffle (the window's hash-partition on shard) +
    * an in-partition sort — exactly the repartition+sortWithinPartitions
    * a shard writer pays anyway, so the op adds nothing beyond the
    * write's own cost. Choose `shards` ≈ a few × cluster parallelism at
    * the target scale: each shard is sorted within one task (spilling
    * if large), and the global row order is (shard, shard_pos) without
    * any single-partition stage. */
  def epochShuffle(df: DataFrame, key: Column, shards: Int,
      seed: Long = 0L): DataFrame = {
    require(shards > 0, s"shards=$shards")
    val h = drawHash(key, seed, "sh:")
    val w = Window.partitionBy(col("shard")).orderBy(col("_shuf_h"), key)
    df.withColumn("_shuf_h", h)
      .withColumn("shard", pmod(col("_shuf_h"), lit(shards.toLong)))
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .drop("_shuf_h")
  }

  /** Fractional epoch UPSAMPLING for training-data mixing: each row of
    * domain `d` appears `floor(factor_d)` times plus one more with
    * probability `frac(factor_d)` — the standard way to run a
    * high-quality domain for 2.5 epochs while a bulk domain runs 0.5.
    * The fractional extra is an independently-tagged content-hash draw
    * (see [[drawHash]]), so the realized copy count of a row is a pure
    * function of (key, seed, factor): reproducible across runs,
    * cluster sizes, and corpus growth. Output adds `copy_idx`
    * (0-based) so downstream shuffling/packing can tell copies apart.
    *
    * Plan shape: broadcast join of the tiny factor table + a map-side
    * `explode(sequence)` — zero data shuffles; output size is the only
    * cost, and it is exactly the training mixture's size. Domains
    * absent from `factors` pass through with factor 1.0. */
  /** Deterministic TRAIN/VAL/TEST split assignment: each row lands in the
    * split whose cumulative-ratio interval contains its unit content hash
    * (independently tagged, see [[drawHash]]). The assignment is a pure
    * function of (key, seed) — append-stable (a document's split never
    * changes when the corpus grows, so late-arriving data cannot leak a
    * held-out document into train) and reproducible on any cluster size.
    * The LAST split is the catch-all for the remainder of [0, 1), so
    * ratios that sum slightly under 1.0 (or unit-hash values that round
    * to 1.0 — see [[bernoulli]]) stretch the final split, never drop a
    * row: a split is a partition of the corpus by contract.
    *
    * ZERO shuffles: a codegen'd CASE chain fused into the scan stage.
    * Cumulative boundaries are computed once here and embedded as
    * literals, so an external engine replaying the same boundary
    * constants (the DuckDB oracle) assigns the identical split set. */
  def splitAssign(df: DataFrame, key: Column,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625),
      seed: Long = 0L): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.map(_._1).distinct.size == splits.size, "duplicate split names")
    require(splits.forall(_._2 > 0.0), "split ratios must be > 0")
    val u = unitHash(key, seed, "sp:")
    val bounds = splits.init.scanLeft(0.0) { case (acc, (_, r)) => acc + r }.tail
    val assigned = splits.init.zip(bounds).foldRight(
      lit(splits.last._1): Column) { case (((name, _), bound), rest) =>
      when(u < bound, name).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }

  /** TEMPERATURE-BASED domain resampling — the multilingual/domain
    * pretraining recipe (exponentiated smoothing; XLM-R §3.1): observed
    * domain shares flatten to q_d ∝ n_d^alpha (alpha < 1 upweights the
    * tail, 1 keeps proportions, 0 equalizes) and every domain resamples
    * toward budget · q_d realized rows — the per-row copy count is
    * floor(f_d) plus one more when the content-hash draw clears
    * frac(f_d), so ONE formula downsamples (f < 1) and upsamples
    * (f ≥ 1) with a pure function of (key, seed): reproducible across
    * runs, cluster sizes, and partitionings. Output adds `copy_idx`.
    *
    * Cross-engine determinism: the only order-sensitive reduction —
    * Σ n_d^alpha — rounds each power to 6 dp and sums in DECIMAL
    * (order-free, exact), the [[graft.operators.Retrieval]] DCG trick;
    * everything after is fixed-op-order IEEE doubles the DuckDB oracle
    * replays bit-for-bit.
    *
    * Plan shape: one map-side-combined count agg over the (few)
    * domains + a broadcast of the factor table back onto the corpus +
    * a map-side explode — zero data shuffles; output size is the
    * mixture's size. A SNAPSHOT op like [[mixture]]: factors depend on
    * observed counts, so re-mixing a grown corpus is a new draw. */
  def temperatureResample(df: DataFrame, domain: Column, key: Column,
      alpha: Double, budget: Long, seed: Long = 0L): DataFrame = {
    require(alpha >= 0.0 && alpha.isFinite, s"alpha=$alpha")
    require(budget >= 0, s"budget=$budget")
    // NULL-domain rows are OUTSIDE the mixture (no domain, no quota) —
    // excluded from the weight normalization too, so they can't dilute
    // the listed domains' factors, and dropped from the output by the
    // inner factor join below
    val counts = df.filter(domain.isNotNull)
      .groupBy(domain.as("_tr_domain"))
      .agg(count(lit(1)).as("_tr_n"))
      .withColumn("_tr_w",
        round(pow(col("_tr_n").cast("double"), lit(alpha)), 6)
          .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
    val tot = counts.agg(sum(col("_tr_w")).as("_tr_wsum"))
    val factors = counts.crossJoin(broadcast(tot))
      // a null weight/sum means pow(n, alpha) overflowed even
      // DECIMAL(38,6) — fail LOUDLY instead of emitting an empty
      // mixture (null factors would zero every copy count)
      .filter(when(col("_tr_w").isNull || col("_tr_wsum").isNull,
        raise_error(lit("temperatureResample: domain weight overflow " +
          "(pow(n, alpha) beyond DECIMAL(38,6)) — lower alpha")))
        .otherwise(lit(true)))
      .withColumn("_tr_f",
        lit(budget.toDouble) *
          (col("_tr_w").cast("double") / col("_tr_wsum").cast("double")) /
          col("_tr_n").cast("double"))
    val f = col("_tr_f")
    val copies = (floor(f).cast("long") +
      when(unitHash(key, seed, "tr:") < f - floor(f), 1L).otherwise(0L))
    df.join(broadcast(factors), domain === col("_tr_domain"))
      .withColumn("_tr_c", copies)
      .filter(col("_tr_c") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("_tr_c") - lit(1L))))
      .drop("_tr_domain", "_tr_n", "_tr_w", "_tr_wsum", "_tr_f", "_tr_c")
  }

  def upsample(df: DataFrame, domain: Column, key: Column,
      factors: Map[String, Double], seed: Long = 0L): DataFrame = {
    require(factors.values.forall(f => f >= 0.0 && f.isFinite),
      "factors must be finite and >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val fDf = factors.toSeq.sortBy(_._1).toDF("_up_domain", "_up_f")
    val f = coalesce(col("_up_f"), lit(1.0))
    val copies = (floor(f).cast("long") +
      when(unitHash(key, seed, "up:") < f - floor(f), 1L).otherwise(0L))
    df.join(broadcast(fDf), domain === col("_up_domain"), "left")
      .withColumn("_up_n", copies)
      .filter(col("_up_n") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("_up_n") - lit(1L))))
      .drop("_up_domain", "_up_f", "_up_n")
  }
}
