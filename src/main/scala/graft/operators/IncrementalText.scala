package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental retrieval-index maintenance — the append-only sibling of
  * [[TextAnalysis.bm25]], following the durable-index discipline of
  * [[IncrementalDedup]]: a corpus that only ever GROWS should never be
  * re-tokenized, so each batch tokenizes once into a durable index and
  * scoring runs against the index alone.
  *
  * Index layout under `indexDir` — one subdirectory per committed batch:
  *
  * {{{
  *   committed/<batchId>/tf/     (idCol, token, tf)   the inverted index
  *   committed/<batchId>/dl/     (idCol, dl)          doc lengths (0 for
  *                                                    token-free docs)
  *   committed/<batchId>/stats/  (n_docs, total_dl)   one row per batch
  * }}}
  *
  * A batch is staged under `staging/<batchId>` and COMMITTED by a single
  * directory rename — readers glob only the committed batch dirs, so a crash
  * mid-append leaves staging garbage, never a half-indexed batch (the
  * same all-or-nothing move [[graft.cache.ParquetQueryCache]] uses for
  * state versions). Re-sent documents are dropped by an anti-join on the
  * committed doc ids, so replaying a batch after a crash is a no-op.
  *
  * Scale shape (the 100 TB story): an append tokenizes ONLY the batch —
  * history is touched by one column-pruned anti-join on doc ids. Scoring
  * reads `tf` with the query-term filter PUSHED to parquet (batches are
  * written token-sorted, and [[compactIndex]] re-clusters the whole index
  * by token, so row-group stats prune almost everything), `dl` joins only
  * the matched docs, and the corpus stats are a sum over one tiny row per
  * batch. Nothing rescans the corpus, ever.
  *
  * Single-writer contract (as in [[IncrementalDedup]]): parquet renames
  * are not coordinated, so serialize appends/compactions per index;
  * readers may run concurrently with appends (they see the last committed
  * prefix) but not with [[compactIndex]], which replaces batch dirs.
  */
object IncrementalText {

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedDir(indexDir: String) = s"$indexDir/committed"

  private def hasBatches(spark: SparkSession, indexDir: String): Boolean = {
    val fs = fsOf(spark, indexDir)
    val p = new Path(committedDir(indexDir))
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** Append one batch of documents to the index. Returns the number of
    * NOVEL documents indexed — re-sent doc ids (and batch-internal
    * duplicates, resolved deterministically to the max text) are dropped,
    * which is also what makes a crash-replayed batch a no-op. */
  def bm25Append(spark: SparkSession, indexDir: String, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): Long =
      graft.util.WriterLease.withLease(spark, indexDir, "bm25Append") {
    val fs = fsOf(spark, indexDir)
    val ids = batch.select(col(idCol)).distinct()
    val novelIds = (if (hasBatches(spark, indexDir))
        ids.join(
          spark.read.parquet(s"${committedDir(indexDir)}/*/dl")
            .select(col(idCol)),
          Seq(idCol), "left_anti")
      else ids).localCheckpoint()
    val n = novelIds.count()
    if (n == 0L) return 0L
    val docs = batch.join(novelIds, Seq(idCol), "left_semi")
      .groupBy(col(idCol)).agg(max(col(textCol)).as(textCol))
    val toks = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    // every novel doc gets a dl row — 0 for token-free docs, so the
    // novelty anti-join covers them and n_docs matches raw count(*)
    // (the [[TextAnalysis.bm25]] idf numerator counts empty docs too)
    val dl = docs.select(col(idCol))
      .join(toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("dl"), lit(0L)).as("dl"))
    val batchId = java.util.UUID.randomUUID().toString.replace("-", "")
    val staging = s"$indexDir/staging/$batchId"
    // token-sorted within files so parquet row-group stats prune scoring
    // scans of terms the file does not contain
    tf.sortWithinPartitions(col("token")).write.parquet(s"$staging/tf")
    dl.write.parquet(s"$staging/dl")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
      .coalesce(1).write.parquet(s"$staging/stats")
    val dest = new Path(s"${committedDir(indexDir)}/$batchId")
    fs.mkdirs(dest.getParent)
    require(fs.rename(new Path(staging), dest),
      s"commit rename failed for batch $batchId")
    n
  }

  /** Score the whole indexed corpus against a fixed bag of query terms —
    * identical results to [[TextAnalysis.bm25]] over the same documents
    * (the scoring core is shared code), computed without touching any
    * document text. */
  def bm25FromIndex(spark: SparkSession, indexDir: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20, idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms == queryTerms.distinct, "queryTerms must be distinct")
    require(hasBatches(spark, indexDir), s"empty index at $indexDir")
    // each doc is indexed exactly once (novelty anti-join), so the
    // per-(doc, token) rows across batches are already disjoint — no
    // re-aggregation needed
    val tf = spark.read.parquet(s"${committedDir(indexDir)}/*/tf")
      .filter(col("token").isin(queryTerms: _*))
    val dl = spark.read.parquet(s"${committedDir(indexDir)}/*/dl")
    val stats = spark.read.parquet(s"${committedDir(indexDir)}/*/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_dl")).as("total_dl"))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    TextAnalysis.bm25Score(tf, dl, stats, queryTerms, k1, b, topK, idCol)
  }

  /** Per-doc TF-IDF top terms served from the index — identical results
    * to [[TextAnalysis.tfidfTopTerms]] over the same documents (shared
    * scoring core; every scoring input derives from the stored `tf`).
    * One index, multiple scorers: the same tokenize-once batches serve
    * BM25 retrieval and TF-IDF keyword extraction. */
  def tfidfTopTermsFromIndex(spark: SparkSession, indexDir: String,
      topK: Int = 3, idCol: String = "doc_id"): DataFrame = {
    require(topK > 0, s"topK=$topK")
    require(hasBatches(spark, indexDir), s"empty index at $indexDir")
    TextAnalysis.tfidfScore(
      spark.read.parquet(s"${committedDir(indexDir)}/*/tf"), topK, idCol)
  }

  /** Number of documents the index currently covers. */
  def indexedDocs(spark: SparkSession, indexDir: String): Long =
    if (!hasBatches(spark, indexDir)) 0L
    else spark.read.parquet(s"${committedDir(indexDir)}/*/stats")
      .agg(sum(col("n_docs"))).first().getLong(0)

  /** Rewrite the accumulated batch dirs as ONE batch with `tf` clustered
    * by token (repartition + sort), so listing cost stays O(1) in batch
    * count and term-filtered scoring scans approach one partition per
    * term. Requires the single-writer lock to also exclude READERS for
    * its duration (the old batch dirs are removed before the compacted
    * one commits). */
  def compactIndex(spark: SparkSession, indexDir: String,
      partitions: Int = 0): Unit =
      graft.util.WriterLease.withLease(spark, indexDir, "compactIndex") {
    if (!hasBatches(spark, indexDir)) return
    val fs = fsOf(spark, indexDir)
    val tf0 = spark.read.parquet(s"${committedDir(indexDir)}/*/tf")
    val dl0 = spark.read.parquet(s"${committedDir(indexDir)}/*/dl")
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val batchId = "compact" + java.util.UUID.randomUUID().toString.replace("-", "")
    val staging = s"$indexDir/staging/$batchId"
    tf0.repartition(p, col("token")).sortWithinPartitions(col("token"))
      .write.parquet(s"$staging/tf")
    dl0.write.parquet(s"$staging/dl")
    dl0.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
      .coalesce(1).write.parquet(s"$staging/stats")
    val committed = new Path(committedDir(indexDir))
    fs.listStatus(committed).foreach(st => fs.delete(st.getPath, true))
    require(fs.rename(new Path(staging),
      new Path(s"${committedDir(indexDir)}/$batchId")),
      s"compaction commit rename failed for $batchId")
  }
}
