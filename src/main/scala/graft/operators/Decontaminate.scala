package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (north-star pipeline mandate — no reference
  * counterpart): flag / drop training documents that share word n-gram
  * overlap with an evaluation set, so eval answers don't leak into
  * training data.
  *
  * Plan shape: inverted-index equi-join of the corpus' shingles against
  * the DISTINCT benchmark shingle set, then one count aggregation per
  * doc. Shingles are 64-bit-hashed (xxhash64) so shuffle/join keys are
  * 8 bytes, the same trick as [[Dedup.ngramJaccardPairs]] — and like
  * there, counts over hashed shingles equal counts over the strings
  * unless two distinct shingles collide in 64 bits (negligible, and
  * deterministic run-to-run). The benchmark side is a distinct-shingle
  * set typically orders of magnitude smaller than the corpus — AQE
  * broadcasts it, leaving ONE real shuffle (the per-doc count).
  */
object Decontaminate {

  /** Per-document overlap against the benchmark: number of distinct
    * shared shingles, the doc's own shingle count, and their ratio.
    * Documents with no overlap (or fewer than `n` words) are absent —
    * callers treat absence as contamination 0. */
  def contaminationScores(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val docSh = docs.select(col(idCol).as("id"),
        Dedup.shingles(col(textCol), n).as("sh"))
      .select(col("id"), size(col("sh")).as("n_shingles"),
        explode(transform(col("sh"), s => xxhash64(s))).as("shingle"))
    val benchSh = benchmark
      .select(explode(transform(Dedup.shingles(col(textCol), n),
        s => xxhash64(s))).as("shingle"))
      .distinct()
    docSh.join(benchSh, "shingle")
      .groupBy(col("id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("id").as(idCol), col("n_shared"), col("n_shingles"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6)
          .as("contamination"))
  }

  /** [[contaminationScores]] with a BLOOM-FILTER pre-filter — the
    * 100 TB shape. The inverted-index join above shuffles EVERY corpus
    * shingle; at petabyte scale that exchange dominates even though the
    * benchmark side broadcasts. Here the benchmark's shingle set is
    * folded into the engine's own bloom sketch
    * (`BloomFilterAggregate`, the expression Spark's runtime filters
    * use), collected to the driver (`numBits/8` bytes — 1.25 MB at 10M
    * benchmark shingles), and embedded as a CONSTANT in a map-side
    * `might_contain` filter: clean documents' shingles die in the scan
    * stage and never reach the exchange. The surviving candidates —
    * true overlaps plus the bloom's ~1% false positives — then take the
    * exact join, so the RESULT is bit-identical to
    * [[contaminationScores]] (no false negatives, and the refilter
    * kills the false positives); only the exchanged volume changes.
    * `bitsPerItem` trades driver/broadcast bytes against pre-filter
    * selectivity. */
  def bloomContaminationScores(docs: DataFrame, benchmark: DataFrame,
      n: Int = 3, bitsPerItem: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchSh = benchmark
      .select(explode(transform(Dedup.shingles(col(textCol), n),
        s => xxhash64(s))).as("shingle"))
      .distinct()
    val docSh = docs.select(col(idCol).as("id"),
        Dedup.shingles(col(textCol), n).as("sh"))
      .select(col("id"), size(col("sh")).as("n_shingles"),
        explode(transform(col("sh"), s => xxhash64(s))).as("shingle"))
    val nItems = benchSh.count() // benchmark side is small by contract
    val scored =
      if (nItems == 0) docSh.limit(0).join(benchSh, "shingle")
      else {
        // BloomFilterAggregate validates its sizing against the runtime-
        // filter confs (defaults: 4M items / 2^26 bits) — clamp instead
        // of throwing on a large benchmark. A clamped (denser) filter
        // only raises the false-positive rate, i.e. sheds less volume;
        // the exact refilter below owns correctness either way.
        val spark = docs.sparkSession
        def conf(k: String, dflt: Long) =
          spark.conf.getOption(k).map(_.toLong).getOrElse(dflt)
        val maxItems = conf(
          "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
        val maxBits = conf(
          "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L)
        val items = math.min(nItems, maxItems)
        val bits = math.min(
          math.max(64L, nItems * bitsPerItem.toLong), maxBits)
        val bloom = benchSh.agg(org.apache.spark.sql.graftshim.Shims
            .bloomFilterAgg(col("shingle"), items, bits))
          .head().getAs[Array[Byte]](0)
        docSh
          .filter(org.apache.spark.sql.graftshim.Shims
            .mightContain(lit(bloom), col("shingle")))
          .join(benchSh, "shingle") // exact refilter: lossless
      }
    scored
      .groupBy(col("id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("id").as(idCol), col("n_shared"), col("n_shingles"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6)
          .as("contamination"))
  }

  /** Training-set hygiene pass: drop every document whose contamination
    * ratio reaches `maxContamination`. Anti-join keeps the corpus
    * streaming — no wide rows move for clean documents. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
      maxContamination: Double = 0.2, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bad = contaminationScores(docs, benchmark, n, idCol, textCol)
      .filter(col("contamination") >= maxContamination)
      .select(col(idCol))
    docs.join(bad, Seq(idCol), "left_anti")
  }
}
