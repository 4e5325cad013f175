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

  /** Fresh per-run index dir under java.io.tmpdir (test/query scaffold). */
  def scratchIndexDir(spark: SparkSession, tag: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_dedup_idx/$tag"
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }
}
