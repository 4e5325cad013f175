package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.functions.seeded_hash64

/** Append-only corpus deduplication via a durable fingerprint INDEX —
  * the 100 TB shape. A training corpus is written once and then only
  * APPENDED to; re-running `Dedup.exact` over the full table for every
  * new batch pays a full corpus scan per batch. The index instead holds
  * one `(h1, h2, doc_id)` row per distinct content ever KEPT, and a new
  * batch dedups in batch-sized work:
  *
  *   1. hash each text with two independent 64-bit seeded hashes — an
  *      effectively 128-bit key (collision odds ~(N²)/2¹²⁹: negligible
  *      at any realistic corpus size, unlike a single 64-bit hash which
  *      expects collisions past ~10⁹ docs);
  *   2. pick one winner per key WITHIN the batch (min doc_id);
  *   3. LEFT ANTI join the winners against the index — novel keys only;
  *   4. append the novel winners' keys to the index.
  *
  * Per-batch cost: one shuffle of the batch plus a hash-join against the
  * index — a 24-bytes-per-distinct-doc table, typically 3–4 orders of
  * magnitude smaller than the corpus text it stands in for. The corpus
  * itself is never rescanned. (The join still exchanges the index keys;
  * if even that dominates, lay the index out bucketed by `h1` and read
  * it through a bucketed table so the anti-join co-locates — the shape
  * here stays the same.)
  *
  * Single-writer contract (like the shard writers in
  * [[graft.sources.Layouts]]): parquet append is not transactional, so
  * concurrent `dedupAppend` calls against one index dir race — serialize
  * batches per index. Crash between the returned result's
  * materialization and a re-run re-appends the same keys; duplicate
  * index rows are harmless for correctness (anti join) and can be
  * compacted away with `Dedup.exact` semantics on (h1, h2).
  */
object IncrementalDedup {

  // fixed, documented hash seeds — two independent draws of the same
  // seeded xxhash-style mix used across the sampling/fingerprint ops
  private val Seed1 = 0x67726166L // "graf"
  private val Seed2 = 0x74696478L // "tidx"

  /** batch → one row per distinct key: (_h1, _h2, <idCol>=min id) */
  private def winners(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(
        seeded_hash64(col(textCol), lit(Seed1)).as("_h1"),
        seeded_hash64(col(textCol), lit(Seed2)).as("_h2"),
        col(idCol))
      .groupBy(col("_h1"), col("_h2"))
      .agg(min(col(idCol)).as(idCol))

  /** Initialize the index from an existing corpus (one full exact-dedup
    * pass — the LAST full scan the corpus ever needs). Returns the
    * corpus rows that survive (the canonical min-id keeper per content). */
  def indexInit(docs: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = winners(docs, idCol, textCol)
    w.write.mode("overwrite").parquet(indexDir)
    docs.join(w.select(col(idCol)), Seq(idCol), "left_semi")
  }

  /** Dedup one append batch against the index: returns the batch rows
    * that are novel (first occurrence of their content ACROSS the whole
    * corpus history, min-id winner within the batch) and appends their
    * keys to the index. The novel set is materialized (localCheckpoint)
    * BEFORE the index append — the returned plan must not lazily re-read
    * an index that already contains the keys it is anti-joining against. */
  def dedupAppend(spark: SparkSession, indexDir: String, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = winners(batch, idCol, textCol)
    val idx = spark.read.parquet(indexDir).select(col("_h1"), col("_h2"))
    val novel = w.join(idx, Seq("_h1", "_h2"), "left_anti").localCheckpoint()
    novel.write.mode("append").parquet(indexDir)
    batch.join(novel.select(col(idCol)), Seq(idCol), "left_semi")
  }

  /** Number of distinct contents the index currently covers. */
  def indexSize(spark: SparkSession, indexDir: String): Long =
    spark.read.parquet(indexDir).count()

  // ------------------------------------------------ incremental NEAR-dup

  /** Append-only NEAR-duplicate removal via a durable MinHash-LSH index —
    * the fuzzy sibling of [[dedupAppend]]. The index holds, for every
    * document ever SEEN (kept or dropped), its exploded LSH band hashes
    * (`bands/`: band_idx, band_hash, id) and its distinct shingle set
    * (`sigs/`: id, sh). A new batch then near-dedups in batch-sized work:
    *
    *   1. shingle + band-hash the batch (the [[Dedup.minhashPairs]]
    *      signature pipeline, identical banding → identical recall);
    *   2. WITHIN-batch: bucket self-join, exact-Jaccard verify — a doc
    *      is dropped if a smaller-id batch doc matches it;
    *   3. ACROSS history: batch bands equi-join the index bands, exact
    *      Jaccard against the stored shingle sets — a doc is dropped if
    *      ANY earlier doc matches it (drop-if-any-earlier semantics: the
    *      dropping doc need not itself have been kept, which is what
    *      lets the index stay append-only with no kept-status updates;
    *      slightly more aggressive than greedy cluster-first-wins on
    *      transitive chains A~B~C with A≁C);
    *   4. append the batch's bands + shingle sets to the index, keep
    *      decisions checkpointed BEFORE the append (read-then-append
    *      hazard, as in [[dedupAppend]]).
    *
    * Documents too short to shingle are always kept and never indexed.
    * Per-batch cost: the batch's own LSH pass plus equi-joins against
    * index tables that grow with corpus DISTINCT content, not corpus
    * bytes; the corpus text is never rescanned. Storage holds string
    * shingle sets (exact verify, zero false drops); switch `sigs` to
    * xxhash64'd shingles ([[Dedup.ngramJaccardPairs]]'s trick) to cut
    * the index ~8× when storage dominates. Single-writer contract as
    * [[dedupAppend]]. */
  def nearDedupAppend(spark: SparkSession, indexDir: String, batch: DataFrame,
      threshold: Double = 0.5, n: Int = 3, k: Int = 64, bands: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bandsDir = s"$indexDir/bands"
    val sigsDir = s"$indexDir/sigs"
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val haveIndex = fs.exists(new Path(bandsDir))

    val sh = batch.select(col(idCol).as("id"),
        Dedup.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    val bnd = sh.select(col("id"),
        posexplode(graft.functions.functions.minhash_band_hashes(
          col("sh"), k, bands)).as(Seq("band_idx", "band_hash")))
      .localCheckpoint()

    // within-batch: smaller id wins, candidates from shared buckets
    val candWithin = bnd.as("x").join(bnd.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    // across history: any indexed doc is earlier than every batch doc
    val candCross = if (haveIndex) {
      val idxBands = spark.read.parquet(bandsDir)
      idxBands.as("x").join(bnd.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_hash") === col("y.band_hash"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .distinct()
    } else candWithin.limit(0)

    val shAll =
      if (haveIndex) sh.unionByName(spark.read.parquet(sigsDir)) else sh
    val dropped = Dedup.verifyJaccardPairs(
        candWithin.unionByName(candCross), shAll, threshold)
      .select(col("id_b").as("id")).distinct()

    val kept = batch.join(
        dropped.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      .localCheckpoint() // decided BEFORE the index grows below
    bnd.write.mode("append").parquet(bandsDir)
    sh.write.mode("append").parquet(sigsDir)
    kept
  }

  // -------------------------------------------- incremental span dedup

  /** Append-only duplicate-SPAN detection via a durable gram index —
    * the incremental form of [[Dedup.duplicateSpans]]. The index holds
    * every DISTINCT `gram`-window hash ever seen (`grams/`, 8 bytes per
    * distinct window); a new batch finds its duplicated spans in
    * batch-sized work:
    *
    *   1. hash the batch's sliding windows ([[Dedup.gramHashes]] —
    *      identical tagging, so batch and one-shot agree);
    *   2. a position is duplicated iff its window occurs ≥ 2 times
    *      WITHIN the batch or ≥ 1 time in the index (i.e. ≥ 2 times in
    *      the corpus prefix ending at this batch — exactly
    *      `duplicateSpans(prefix)` restricted to batch docs, pinned by
    *      spec);
    *   3. merge islands per document ([[Dedup.mergeSpanIslands]]);
    *   4. append the batch's distinct window hashes to the index, spans
    *      checkpointed BEFORE the append (read-then-append hazard).
    *
    * Earlier documents are never re-reported when a later batch repeats
    * their text (append-only decisions, same contract as
    * [[nearDedupAppend]]); the corpus text is never rescanned. Index
    * growth is bounded by distinct windows, not corpus bytes; duplicate
    * index rows from a crash-rerun are harmless (semi join). Lay the
    * index out bucketed by `h` when the equi-join's exchange dominates.
    * Single-writer contract as [[dedupAppend]]. */
  def spanDedupAppend(spark: SparkSession, indexDir: String, batch: DataFrame,
      gram: Int = 8, idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val gramsDir = s"$indexDir/grams"
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val haveIndex = fs.exists(new Path(gramsDir))

    val g = Dedup.gramHashes(batch, gram, idCol, textCol).localCheckpoint()
    val distinctH = g.select(col("h")).distinct().localCheckpoint()
    val within = g.groupBy(col("h")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= 2).select(col("h"))
    val dupH = if (haveIndex) {
      val idx = spark.read.parquet(gramsDir)
      within.unionByName(
        distinctH.join(idx, Seq("h"), "left_semi")).distinct()
    } else within
    val spans = Dedup.mergeSpanIslands(
        g.join(dupH, Seq("h"), "left_semi"), gram)
      .localCheckpoint() // decided BEFORE the index grows below
    distinctH.write.mode("append").parquet(gramsDir)
    spans
  }

  /** Fresh per-run index dir under java.io.tmpdir (test/query scaffold). */
  def scratchIndexDir(spark: SparkSession, tag: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_dedup_idx/$tag"
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }
}
