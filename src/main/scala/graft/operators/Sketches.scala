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
  /** COUNT-MIN SKETCH frequency estimates for the corpus's exact top-k
    * tokens: build a depth×width counter grid from the token stream, then
    * estimate each token's count as the MIN over its `depth` cells.
    * Estimates are ≥ the true count (collisions only ever ADD), with
    * error ≤ ε·N at probability 1−δ for width = e/ε, depth = ln(1/δ).
    *
    * Why it matters at open-web scale (NOTES: the vocabulary-threshold
    * question): an exact token count's map-side partial state is
    * vocabulary-sized — fine until distinct-tokens-per-partition stops
    * fitting the hash-aggregate map and partials spill. The CMS pass has
    * partial state and shuffle width bounded by depth·width CELLS
    * (constant, here 4×1024) regardless of vocabulary size, so frequency
    * estimation over any corpus costs one scan plus a constant-width
    * shuffle. The standard composition: CMS pass to find the heavy-hitter
    * threshold cheaply, exact pass restricted to candidates.
    *
    * Each row of the grid uses the library hash with the depth index
    * TAGGED INTO THE INPUT (`"cms<d>:" || token`, seed 0) — the same
    * independent-draw idiom as Sampling — so every cell assignment is
    * integer arithmetic an external engine replays exactly; the whole
    * output (exact count, estimate) is integers, no rounding anywhere.
    *
    * Output: token, n_exact, est_count (≥ n_exact), ordered by
    * (n_exact desc, token) — the same total order as [[TextAnalysis
    * .vocabulary]]. */
  def cmsTopTokenEstimates(docs: DataFrame, topK: Int = 20, depth: Int = 4,
      width: Int = 1024, textCol: String = "text"): DataFrame = {
    require(depth >= 1 && width >= 2, s"depth=$depth width=$width")
    val toks = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    def cellOf(d: Int): Column = pmod(
      seeded_hash64(concat(lit(s"cms$d:"), col("token")), lit(0L)),
      lit(width.toLong))
    def cellStructs: Column = array((0 until depth).map(d =>
      struct(lit(d).as("d"), cellOf(d).as("cell"))): _*)
    // grid: count per (row, cell) — partial-agg state capped at
    // depth·width entries per task, shuffle width depth·width keys
    val cms = toks.select(explode(cellStructs).as("dc"))
      .groupBy(col("dc.d").as("d"), col("dc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val top = TextAnalysis.vocabulary(docs, topK, textCol)
      .withColumnRenamed("n_occurrences", "n_exact")
    top.select(col("token"), col("n_exact"), explode(cellStructs).as("dc"))
      .select(col("token"), col("n_exact"), col("dc.d").as("d"),
        col("dc.cell").as("cell"))
      .join(broadcast(cms), Seq("d", "cell"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("cnt")).as("est_count"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** KMV SET-OVERLAP sketch between two sides (corpus-vs-corpus
    * vocabulary/shingle overlap without materializing either set): the
    * k smallest hashes of A ∪ B form a uniform sample of the union, so
    * |A∪B| ≈ (k−1)/u_k (the [[kmvDistinct]] estimator) and the fraction
    * of the sketch present in BOTH sides estimates the Jaccard —
    * |A∩B| ≈ ρ·|A∪B|. One distinct-hash pass per side, a k-row
    * TakeOrdered (per-partition top-k merge, never a global sort), and
    * a single-row result; estimates are exact below k. Deterministic
    * given the seeded hash, so an external engine replays it verbatim. */
  def kmvOverlap(a: DataFrame, b: DataFrame, key: Column,
      k: Int = 256): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3, got $k")
    def hs(df: DataFrame) = df
      .select(seeded_hash64(key.cast("string"), lit(0L)).as("_h"))
      .filter(col("_h").isNotNull).distinct()
    val sketch = hs(a).withColumn("_a", lit(1)).withColumn("_b", lit(0))
      .unionByName(hs(b).withColumn("_a", lit(0)).withColumn("_b", lit(1)))
      .groupBy(col("_h"))
      .agg(max(col("_a")).as("in_a"), max(col("_b")).as("in_b"))
      .orderBy(col("_h")).limit(k) // k smallest union hashes
    val uK = (col("_hk").cast("double") + lit(9.223372036854775808e18)) /
      lit(1.8446744073709551616e19)
    val estU = when(col("n_kmv") < k, col("n_kmv").cast("double"))
      .otherwise(lit((k - 1).toDouble) / uK)
    val rho = col("n_both").cast("double") / col("n_kmv").cast("double")
    sketch
      .agg(count(lit(1)).as("n_kmv"), max(col("_h")).as("_hk"),
        coalesce(sum(col("in_a") * col("in_b")), lit(0L)).as("n_both"))
      .select(col("n_kmv"), col("n_both").cast("long").as("n_both"),
        round(estU, 4).as("est_union"),
        round(rho * estU, 4).as("est_intersection"),
        round(rho, 4).as("est_jaccard"))
  }

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
