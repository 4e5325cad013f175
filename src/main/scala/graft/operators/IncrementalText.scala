package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental retrieval-index maintenance — the durable sibling of
  * [[TextAnalysis.bm25]], following the durable-index discipline of
  * [[IncrementalDedup]]: a corpus should never be re-tokenized, so each
  * batch tokenizes once into a durable index and scoring runs against the
  * index alone.
  *
  * Index layout under `indexDir` — one subdirectory per committed batch:
  *
  * {{{
  *   committed/<batchId>/tf/     (idCol, token, tf, ver)  inverted index
  *   committed/<batchId>/dl/     (idCol, dl, ver, fp)     doc lengths (0
  *                                                        for token-free
  *                                                        docs) + content
  *                                                        fingerprint
  *   committed/<batchId>/gone/   (idCol, ver)             deletions
  *   committed/<batchId>/stats/  (n_docs, total_dl, ver)  ADDITIVE deltas
  * }}}
  *
  * A batch is staged under `staging/<batchId>` and COMMITTED by a single
  * directory rename — readers glob only the committed batch dirs, so a crash
  * mid-append leaves staging garbage, never a half-indexed batch (the
  * same all-or-nothing move [[graft.cache.ParquetQueryCache]] uses for
  * state versions).
  *
  * MUTATIONS, not just appends: every indexed doc-version carries `ver`
  * (the writing batch's sequence, allocated under the writer lease) and
  * `fp` (a content fingerprint). The LIVE version of a doc is its
  * highest-ver row across `dl ∪ gone` — a newer dl row supersedes an
  * update's old postings, a newer gone row deletes the doc, a yet-newer
  * dl row resurrects it. [[bm25Upsert]] re-indexes exactly the docs whose
  * content changed (fp mismatch) plus the novel ones — replaying a
  * crashed upsert is a no-op because nothing's fp changed the second
  * time. [[bm25Delete]] tombstones live ids only (replay: no-op). The
  * per-batch `stats` rows stay ADDITIVE under mutation: an update's row
  * carries (novel-doc count, new_dl − superseded_dl), a deletion's row
  * carries negatives — so corpus stats remain a sum over tiny per-batch
  * rows, never an O(docs) scan.
  *
  * Scale shape (the 100 TB story): an append/upsert tokenizes ONLY the
  * batch — history is touched by one column-pruned join on doc ids.
  * Scoring reads `tf` with the query-term filter PUSHED to parquet
  * (batches are written token-sorted, and [[compactIndex]] re-clusters
  * the whole index by token, so row-group stats prune almost
  * everything), resolves liveness only for the MATCHED ids, `dl` joins
  * only the matched docs, and the corpus stats are a sum over one tiny
  * row per batch. Nothing rescans the corpus, ever.
  *
  * Single-writer contract (as in [[IncrementalDedup]]): parquet renames
  * are not coordinated, so serialize appends/upserts/deletes/compactions
  * per index (the writer lease enforces it — it also makes `ver`
  * allocation race-free); readers may run concurrently with appends
  * (they see the last committed prefix) but not with [[compactIndex]],
  * which replaces batch dirs.
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

  /** batch dirs currently committed that contain `sub` (explicit paths —
    * a glob over a subdir only SOME batches have would throw) */
  private def subDirs(spark: SparkSession, indexDir: String,
      sub: String): Seq[String] = {
    val fs = fsOf(spark, indexDir)
    val p = new Path(committedDir(indexDir))
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath).toSeq
      .filter(d => fs.exists(new Path(d, sub)))
      .map(d => new Path(d, sub).toString)
  }

  /** mergeSchema read with back-compat defaults: batches written before
    * the mutation format lack ver/fp — they read as nulls and normalize
    * to ver 0 (strictly older than any allocated version, as required) */
  private def readDl(spark: SparkSession, indexDir: String,
      idCol: String): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(subDirs(spark, indexDir, "dl"): _*)
    val withVer = if (raw.columns.contains("ver")) raw
      else raw.withColumn("ver", lit(null).cast("long"))
    val withFp = if (withVer.columns.contains("fp")) withVer
      else withVer.withColumn("fp", lit(null).cast("long"))
    withFp.select(col(idCol), col("dl"),
      coalesce(col("ver"), lit(0L)).as("ver"), col("fp"))
  }

  private def readTf(spark: SparkSession, indexDir: String,
      idCol: String): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(subDirs(spark, indexDir, "tf"): _*)
    val withVer = if (raw.columns.contains("ver")) raw
      else raw.withColumn("ver", lit(null).cast("long"))
    withVer.select(col(idCol), col("token"), col("tf"),
      coalesce(col("ver"), lit(0L)).as("ver"))
  }

  private def readStats(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(subDirs(spark, indexDir, "stats"): _*)

  private def readGone(spark: SparkSession, indexDir: String,
      idCol: String): Option[DataFrame] = {
    val dirs = subDirs(spark, indexDir, "gone")
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).select(col(idCol), col("ver")))
  }

  /** next batch sequence — one past the highest committed (stats rows
    * carry their batch's ver; pre-mutation batches count as 0). Safe
    * because every writer holds the lease. */
  private def nextVer(spark: SparkSession, indexDir: String): Long =
    if (!hasBatches(spark, indexDir)) 1L
    else {
      val st = readStats(spark, indexDir)
      val withVer = if (st.columns.contains("ver")) st
        else st.withColumn("ver", lit(null).cast("long"))
      withVer.agg(max(coalesce(col("ver"), lit(0L)))).first().getLong(0) + 1L
    }

  /** LIVE doc-versions among `ids` (or all docs when None): for each id
    * the highest-ver row across dl ∪ gone wins; a gone winner means the
    * doc is deleted and yields no row. Output: (idCol, ver, dl, fp). */
  private def liveDocs(spark: SparkSession, indexDir: String, idCol: String,
      ids: Option[DataFrame]): DataFrame = {
    val dl0 = readDl(spark, indexDir, idCol)
    val dl = ids.fold(dl0)(i => dl0.join(i, Seq(idCol), "left_semi"))
    val cand = readGone(spark, indexDir, idCol) match {
      case None => dl.withColumn("alive", lit(true))
      case Some(g0) =>
        val g = ids.fold(g0)(i => g0.join(i, Seq(idCol), "left_semi"))
        dl.withColumn("alive", lit(true)).unionByName(
          g.select(col(idCol), lit(-1L).as("dl"), col("ver"),
            lit(null).cast("long").as("fp"), lit(false).as("alive")))
    }
    cand.groupBy(col(idCol))
      .agg(max_by(struct(col("dl"), col("fp"), col("alive")), col("ver"))
        .as("w"), max(col("ver")).as("ver"))
      .filter(col("w.alive"))
      .select(col(idCol), col("ver"), col("w.dl").as("dl"),
        col("w.fp").as("fp"))
  }

  /** content fingerprint — collision-negligible for novelty decisions
    * (a false "unchanged" requires a 64-bit xxhash collision between two
    * versions of the SAME doc id) */
  private def fpCol(textCol: String) = xxhash64(col(textCol))

  /** tokenize + stage + commit one batch of `docs` (already deduped, one
    * row per id) stamped with `ver`; `statsDocs`/`statsDl` are the
    * ADDITIVE deltas this batch contributes. Returns the indexed count. */
  private def commitBatch(spark: SparkSession, indexDir: String,
      docs: DataFrame, textCol: String, idCol: String, ver: Long,
      statsDocsDelta: Long, statsDlDelta: DataFrame => Long): Long = {
    val fs = fsOf(spark, indexDir)
    val toks = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf")).withColumn("ver", lit(ver))
    // every indexed doc gets a dl row — 0 for token-free docs, so the
    // liveness resolution covers them and n_docs matches raw count(*)
    // (the [[TextAnalysis.bm25]] idf numerator counts empty docs too)
    val dl = docs.select(col(idCol), fpCol(textCol).as("fp"))
      .join(toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("dl"), lit(0L)).as("dl"),
        lit(ver).as("ver"), col("fp"))
      .localCheckpoint(eager = false) // count() below materializes
    val n = dl.count()
    if (n == 0L) return 0L
    val batchId = java.util.UUID.randomUUID().toString.replace("-", "")
    val staging = s"$indexDir/staging/$batchId"
    // token-sorted within files so parquet row-group stats prune scoring
    // scans of terms the file does not contain
    tf.sortWithinPartitions(col("token")).write.parquet(s"$staging/tf")
    dl.write.parquet(s"$staging/dl")
    val dlDelta = statsDlDelta(dl)
    spark.range(1).select(lit(statsDocsDelta).as("n_docs"),
      lit(dlDelta).as("total_dl"), lit(ver).as("ver"))
      .coalesce(1).write.parquet(s"$staging/stats")
    val dest = new Path(s"${committedDir(indexDir)}/$batchId")
    fs.mkdirs(dest.getParent)
    require(fs.rename(new Path(staging), dest),
      s"commit rename failed for batch $batchId")
    n
  }

  /** Append one batch of documents to the index. Returns the number of
    * NOVEL documents indexed — ids with a LIVE version (and
    * batch-internal duplicates, resolved deterministically to the max
    * text) are dropped, which is also what makes a crash-replayed batch
    * a no-op. A previously DELETED id is novel again and re-indexes.
    * Content changes are ignored by design here — use [[bm25Upsert]]
    * when edits must re-index. */
  def bm25Append(spark: SparkSession, indexDir: String, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): Long =
      graft.util.WriterLease.withLease(spark, indexDir, "bm25Append") {
    val ids = batch.select(col(idCol)).distinct()
    val novelIds = (if (hasBatches(spark, indexDir))
        ids.join(liveDocs(spark, indexDir, idCol, Some(ids))
          .select(col(idCol)), Seq(idCol), "left_anti")
      else ids).localCheckpoint(eager = false) // count() materializes
    val n = novelIds.count()
    if (n == 0L) return 0L
    val ver = nextVer(spark, indexDir)
    val docs = batch.join(novelIds, Seq(idCol), "left_semi")
      .groupBy(col(idCol)).agg(max(col(textCol)).as(textCol))
    commitBatch(spark, indexDir, docs, textCol, idCol, ver,
      statsDocsDelta = n,
      statsDlDelta = dl => dl.agg(sum(col("dl"))).first().getLong(0))
  }

  /** UPSERT one batch: novel ids are indexed like [[bm25Append]], ids
    * whose content CHANGED (fingerprint mismatch vs the live version)
    * are re-indexed — the new doc-version's higher `ver` supersedes the
    * old postings at read time, no old batch is touched — and unchanged
    * ids are dropped. Tokenizes only the novel+changed docs; per-batch
    * stats carry additive deltas (novel count, new_dl − superseded_dl)
    * so corpus stats stay a per-batch sum. Replaying a crashed upsert is
    * a no-op (nothing's fingerprint changed the second time). Returns
    * (novel, re-indexed). */
  def bm25Upsert(spark: SparkSession, indexDir: String, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): (Long, Long) =
      graft.util.WriterLease.withLease(spark, indexDir, "bm25Upsert") {
    val docsIn = batch.groupBy(col(idCol)).agg(max(col(textCol)).as(textCol))
    if (!hasBatches(spark, indexDir)) {
      // first batch: every doc is novel
      val docs = docsIn.localCheckpoint(eager = false)
      val n0 = docs.count()
      if (n0 == 0L) return (0L, 0L)
      val n = commitBatch(spark, indexDir, docs, textCol, idCol,
        ver = 1L, statsDocsDelta = n0,
        statsDlDelta = dl => dl.agg(sum(col("dl"))).first().getLong(0))
      return (n, 0L)
    }
    val ids = docsIn.select(col(idCol))
    val live = liveDocs(spark, indexDir, idCol, Some(ids))
      .select(col(idCol), col("dl").as("_old_dl"), col("fp").as("_old_fp"))
    // novel: no live version; changed: live fp differs from the batch's
    val joined = docsIn.join(live, Seq(idCol), "left")
      .withColumn("_new_fp", fpCol(textCol))
    val toIndex = joined.filter(col("_old_fp").isNull ||
      col("_new_fp") =!= col("_old_fp")).localCheckpoint(eager = false)
    val novel = toIndex.filter(col("_old_dl").isNull).count()
    val changed = toIndex.count() - novel
    if (novel + changed == 0L) return (0L, 0L)
    val supersededDl = toIndex.agg(sum(coalesce(col("_old_dl"), lit(0L))))
      .first().getLong(0)
    val ver = nextVer(spark, indexDir)
    commitBatch(spark, indexDir,
      toIndex.select(col(idCol), col(textCol)), textCol, idCol, ver,
      statsDocsDelta = novel,
      statsDlDelta =
        dl => dl.agg(sum(col("dl"))).first().getLong(0) - supersededDl)
    (novel, changed)
  }

  /** DELETE documents by id: live ids get a tombstone row (higher `ver`
    * than any of their postings — readers drop them); already-dead or
    * unknown ids are ignored, so replays and double-deletes are no-ops.
    * Stats absorb the negatives (doc count and total length), staying
    * additive. Returns the number of docs deleted. */
  def bm25Delete(spark: SparkSession, indexDir: String, ids: DataFrame,
      idCol: String = "doc_id"): Long =
      graft.util.WriterLease.withLease(spark, indexDir, "bm25Delete") {
    if (!hasBatches(spark, indexDir)) return 0L
    val fs = fsOf(spark, indexDir)
    val targets = liveDocs(spark, indexDir, idCol,
      Some(ids.select(col(idCol)).distinct()))
      .localCheckpoint(eager = false) // count() below materializes
    val n = targets.count()
    if (n == 0L) return 0L
    val deletedDl = targets.agg(sum(col("dl"))).first().getLong(0)
    val ver = nextVer(spark, indexDir)
    val batchId = java.util.UUID.randomUUID().toString.replace("-", "")
    val staging = s"$indexDir/staging/$batchId"
    targets.select(col(idCol), lit(ver).as("ver"))
      .write.parquet(s"$staging/gone")
    spark.range(1).select(lit(-n).as("n_docs"),
      lit(-deletedDl).as("total_dl"), lit(ver).as("ver"))
      .coalesce(1).write.parquet(s"$staging/stats")
    val dest = new Path(s"${committedDir(indexDir)}/$batchId")
    fs.mkdirs(dest.getParent)
    require(fs.rename(new Path(staging), dest),
      s"commit rename failed for delete batch $batchId")
    n
  }

  /** Score the whole indexed corpus against a fixed bag of query terms —
    * identical results to [[TextAnalysis.bm25]] over the same LIVE
    * documents (the scoring core is shared code), computed without
    * touching any document text. Liveness is resolved only for the
    * matched ids (mutation is the exception, not the scan). */
  def bm25FromIndex(spark: SparkSession, indexDir: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20, idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms == queryTerms.distinct, "queryTerms must be distinct")
    require(hasBatches(spark, indexDir), s"empty index at $indexDir")
    val tf0 = readTf(spark, indexDir, idCol)
      .filter(col("token").isin(queryTerms: _*))
    // drop superseded/deleted doc-versions: join on (id, ver) against
    // the live set of exactly the matched ids
    val live = liveDocs(spark, indexDir, idCol,
      Some(tf0.select(col(idCol)).distinct()))
    val tf = tf0.join(live.select(col(idCol), col("ver")),
      Seq(idCol, "ver"), "left_semi")
      .select(col(idCol), col("token"), col("tf"))
    val dl = live.select(col(idCol), col("dl"))
    val stats = readStats(spark, indexDir)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_dl")).as("total_dl"))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    TextAnalysis.bm25Score(tf, dl, stats, queryTerms, k1, b, topK, idCol)
  }

  /** Batched BM25 served from the index: per-query top-`perLeg` for a
    * whole query TABLE, equal to [[Retrieval.bm25Batch]] over the same
    * LIVE documents (shared batched scoring core) — without touching any
    * document text. The batch's distinct vocabulary is collected to the
    * driver (bounded by the query table's own term count, not the
    * corpus) so the token filter pushes to the token-sorted parquet as
    * literals, exactly like the single-query path. */
  def bm25BatchFromIndex(spark: SparkSession, indexDir: String,
      queryTerms: DataFrame, perLeg: Int = 50,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", qidCol: String = "qid"): DataFrame = {
    require(hasBatches(spark, indexDir), s"empty index at $indexDir")
    val termList = queryTerms.select(col("token")).distinct()
      .collect().map(_.getString(0)).toSeq
    require(termList.nonEmpty, "queryTerms must be non-empty")
    val tf0 = readTf(spark, indexDir, idCol)
      .filter(col("token").isin(termList: _*))
    val live = liveDocs(spark, indexDir, idCol,
      Some(tf0.select(col(idCol)).distinct()))
    val tf = tf0.join(live.select(col(idCol), col("ver")),
      Seq(idCol, "ver"), "left_semi")
      .select(col(idCol), col("token"), col("tf"))
    val dl = live.select(col(idCol), col("dl"))
    val stats = readStats(spark, indexDir)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_dl")).as("total_dl"))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    Retrieval.bm25BatchScore(tf, dl, stats, queryTerms, perLeg,
      k1, b, idCol, qidCol)
  }

  /** Per-doc TF-IDF top terms served from the index — identical results
    * to [[TextAnalysis.tfidfTopTerms]] over the same LIVE documents
    * (shared scoring core; every scoring input derives from the stored
    * `tf`). One index, multiple scorers: the same tokenize-once batches
    * serve BM25 retrieval and TF-IDF keyword extraction. */
  def tfidfTopTermsFromIndex(spark: SparkSession, indexDir: String,
      topK: Int = 3, idCol: String = "doc_id"): DataFrame = {
    require(topK > 0, s"topK=$topK")
    require(hasBatches(spark, indexDir), s"empty index at $indexDir")
    val live = liveDocs(spark, indexDir, idCol, None)
    val tf = readTf(spark, indexDir, idCol)
      .join(live.select(col(idCol), col("ver")), Seq(idCol, "ver"),
        "left_semi")
      .select(col(idCol), col("token"), col("tf"))
    TextAnalysis.tfidfScore(tf, topK, idCol)
  }

  /** Number of LIVE documents the index currently covers (per-batch
    * stats rows are additive under upserts/deletes). */
  def indexedDocs(spark: SparkSession, indexDir: String): Long =
    if (!hasBatches(spark, indexDir)) 0L
    else readStats(spark, indexDir)
      .agg(sum(col("n_docs"))).first().getLong(0)

  /** Rewrite the accumulated batch dirs as ONE batch holding only the
    * LIVE doc-versions, with `tf` clustered by token (repartition +
    * sort) — superseded postings and tombstones are physically dropped,
    * listing cost resets to O(1), and term-filtered scoring scans
    * approach one partition per term. Per-row `ver`s are PRESERVED (tf
    * and dl rows must keep agreeing on the live version). Requires the
    * single-writer lock to also exclude READERS for its duration (the
    * old batch dirs are removed before the compacted one commits). */
  def compactIndex(spark: SparkSession, indexDir: String,
      partitions: Int = 0, idCol: String = "doc_id"): Unit =
      graft.util.WriterLease.withLease(spark, indexDir, "compactIndex") {
    if (!hasBatches(spark, indexDir)) return
    val fs = fsOf(spark, indexDir)
    // staging writes below materialize while the old batch dirs still
    // exist; only `live` is reused twice, so only it is pinned
    val live = liveDocs(spark, indexDir, idCol, None).localCheckpoint()
    val tf0 = readTf(spark, indexDir, idCol)
      .join(live.select(col(idCol), col("ver")), Seq(idCol, "ver"),
        "left_semi")
    val dl0 = live.select(col(idCol), col("dl"), col("ver"), col("fp"))
    val maxVer = nextVer(spark, indexDir) - 1L
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val batchId = "compact" + java.util.UUID.randomUUID().toString.replace("-", "")
    val staging = s"$indexDir/staging/$batchId"
    tf0.repartition(p, col("token")).sortWithinPartitions(col("token"))
      .write.parquet(s"$staging/tf")
    dl0.write.parquet(s"$staging/dl")
    dl0.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("total_dl"))
      .select(col("n_docs"), col("total_dl"), lit(maxVer).as("ver"))
      .coalesce(1).write.parquet(s"$staging/stats")
    val committed = new Path(committedDir(indexDir))
    fs.listStatus(committed).foreach(st => fs.delete(st.getPath, true))
    require(fs.rename(new Path(staging),
      new Path(s"${committedDir(indexDir)}/$batchId")),
      s"compaction commit rename failed for $batchId")
  }
}
