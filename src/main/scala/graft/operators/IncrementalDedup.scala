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
  * itself is never rescanned, and past the size threshold the index is
  * promoted to a bucketed table so even its own keys stop being
  * exchanged (see [[dedupAppend]]).
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
  private[graft] def winners(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(
        seeded_hash64(col(textCol), lit(Seed1)).as("_h1"),
        seeded_hash64(col(textCol), lit(Seed2)).as("_h2"),
        col(idCol))
      .groupBy(col("_h1"), col("_h2"))
      .agg(min(col(idCol)).as(idCol))

  /** Initialize the index from an existing corpus (one full exact-dedup
    * pass — the LAST full scan the corpus ever needs). Returns the
    * corpus rows that survive (the canonical min-id keeper per content).
    * The index dir is DEDICATED to this index (the overwrite claims it
    * whole). */
  def indexInit(docs: DataFrame, indexDir: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    graft.util.WriterLease.withLease(spark, indexDir, "indexInit") {
      spark.sql(s"DROP TABLE IF EXISTS ${indexTableName(indexDir, "keys")}")
      dropGone(spark, indexDir) // a re-init claims the tombstones too
      dropSnap(spark, readdedDir(indexDir))
      val w = winners(docs, idCol, textCol)
      w.write.mode("overwrite").parquet(indexDir)
      docs.join(w.select(col(idCol)), Seq(idCol), "left_semi")
    }
  }

  /** Dedup one append batch against the index: returns the batch rows
    * that are novel (first occurrence of their content ACROSS the whole
    * corpus history, min-id winner within the batch) and appends their
    * keys to the index. The novel set is materialized (localCheckpoint)
    * BEFORE the index append — the returned plan must not lazily re-read
    * an index that already contains the keys it is anti-joining against.
    *
    * Layout follows [[nearDedupAppend]]'s size gate: the key table stays
    * plain parquet while small, and the batch that finds it past
    * `bucketReadThresholdBytes` promotes it once into a catalog table
    * BUCKETED on (_h1, _h2) — the anti-join's keys — so at scale the
    * per-batch anti join reads the index pre-partitioned and only the
    * batch's winners shuffle. */
  def dedupAppend(spark: SparkSession, indexDir: String, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      indexBuckets: Int = 32,
      bucketReadThresholdBytes: Long = 256L << 20): DataFrame =
      graft.util.WriterLease.withLease(spark, indexDir, "dedupAppend") {
    val table = indexTableName(indexDir, "keys")
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keyCols = Seq("_h1", "_h2")
    val bucketed = spark.catalog.tableExists(table) ||
      (indexBytes(fs, indexDir) >= bucketReadThresholdBytes && {
        promoteToBucketed(spark, fs, indexDir, table, keyCols, indexBuckets)
        true
      })
    val w = winners(batch, idCol, textCol)
    val novel = keysNovel(spark, indexDir, w, bucketed).localCheckpoint()
    // a re-added gone content is novel again — clear its tombstone so a
    // THIRD send dedups against this new copy. The cleared keys' NEW
    // keepers are recorded in the re-admission ledger FIRST (so a
    // replayed old removal can never re-tombstone through the stale
    // pre-removal index row), then the gone rewrite lands, then the
    // index append: a crash anywhere between the steps fails
    // conservative (the old index row resurrects and the replayed batch
    // drops the copy — a false drop, the module's usual crash direction
    // — never a duplicate admitted; a replayed batch re-records the
    // same deterministic min-id winner).
    goneKeys(spark, indexDir).foreach { g =>
      val cleared = novel.join(g, Seq("_h1", "_h2"), "left_semi")
        .select(col("_h1"), col("_h2"),
          col(idCol).cast("long").as("_id")).localCheckpoint()
      if (cleared.count() > 0) {
        val ra = readdedKeys(spark, indexDir).fold(cleared)(r =>
          r.join(cleared.select(col("_h1"), col("_h2")),
            Seq("_h1", "_h2"), "left_anti").unionByName(cleared))
        writeSnap(spark, readdedDir(indexDir), ra,
          Seq("_h1", "_h2", "_id"))
        writeGone(spark, indexDir,
          g.join(cleared.select(col("_h1"), col("_h2")),
            Seq("_h1", "_h2"), "left_anti"))
      }
    }
    if (bucketed) appendBucketed(novel, indexDir, table, keyCols, indexBuckets)
    else novel.write.mode("append").parquet(indexDir)
    batch.join(novel.select(col(idCol)), Seq(idCol), "left_semi")
  }

  /** The per-batch novelty anti-join against the key index. In bucketed
    * mode the index scan arrives pre-partitioned on (_h1, _h2) — the
    * join keys — so only the batch's winners shuffle (plan-pinned in
    * IncrementalNearDedupSpec). */
  private[graft] def keysNovel(spark: SparkSession, indexDir: String,
      w: DataFrame, bucketed: Boolean): DataFrame = {
    val idx = (if (bucketed) spark.table(indexTableName(indexDir, "keys"))
      else spark.read.parquet(indexDir)).select(col("_h1"), col("_h2"))
    // tombstoned contents ([[dedupRemove]]) are not in the corpus anymore
    // — subtract them so a re-send is novel again. Broadcast by
    // construction (gone is bounded by outstanding removals), so the
    // bucketed index scan stays exchange-free; the common no-removals
    // case skips the node entirely.
    val live = goneKeys(spark, indexDir).fold(idx)(g =>
      idx.join(broadcast(g), Seq("_h1", "_h2"), "left_anti"))
    w.join(live, Seq("_h1", "_h2"), "left_anti")
  }

  /** Number of distinct LIVE contents the index currently covers
    * (crash-replay duplicate rows and [[dedupRemove]] tombstones both
    * excluded). */
  def indexSize(spark: SparkSession, indexDir: String): Long = {
    val keys = spark.read.parquet(indexDir).select(col("_h1"), col("_h2"))
      .distinct()
    goneKeys(spark, indexDir)
      .fold(keys)(g => keys.join(broadcast(g), Seq("_h1", "_h2"), "left_anti"))
      .count()
  }

  // ------------------------------------------------ content REMOVAL

  /** tombstone snapshot for the exact-key index — a SIBLING dir (a subdir
    * would pollute the flat parquet read of `indexDir` itself), holding
    * versioned full snapshots `v-<n>-<uuid>`: the latest _SUCCESS-complete
    * version wins, so every rewrite is atomic to readers and a crashed
    * write is invisible. Bounded by OUTSTANDING removals (re-adds clear
    * their rows; compaction resets it), so it stays broadcast-sized. */
  private def goneDir(indexDir: String): String =
    indexDir.stripSuffix("/") + "_gone"

  private val goneSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("_h1",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("_h2",
      org.apache.spark.sql.types.LongType)))

  // generic versioned-snapshot machinery, shared by every index type's
  // tombstones: full snapshots `v-<n>-<uuid>`, the latest
  // _SUCCESS-complete version wins (atomic to readers, crashed writes
  // invisible), one predecessor kept for lease-free readers mid-scan
  private def latestSnapVersion(fs: org.apache.hadoop.fs.FileSystem,
      snapDir: String): Option[Path] = {
    val dir = new Path(snapDir)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("v-") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .sortBy(p => p.getName.stripPrefix("v-").takeWhile(_.isDigit)
        .foldLeft(0L)((a, c) => a * 10 + (c - '0')))
      .lastOption
  }

  private def readSnap(spark: SparkSession, snapDir: String,
      schema: org.apache.spark.sql.types.StructType): Option[DataFrame] = {
    val fs = new Path(snapDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    latestSnapVersion(fs, snapDir).map(p =>
      spark.read.schema(schema).parquet(p.toString))
  }

  private def writeSnap(spark: SparkSession, snapDir: String,
      df: DataFrame, cols: Seq[String]): Unit = {
    val fs = new Path(snapDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(snapDir)
    val next = (if (!fs.exists(dir)) 0L
      else fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("v-"))
        .map(_.stripPrefix("v-").takeWhile(_.isDigit)
          .foldLeft(0L)((a, c) => a * 10 + (c - '0')))
        .foldLeft(0L)(math.max)) + 1L
    val vName = f"v-$next%012d-${java.util.UUID.randomUUID.toString.take(8)}"
    df.select(cols.map(col): _*).distinct()
      .write.parquet(new Path(dir, vName).toString)
    // superseded versions: keep the immediate predecessor, reap older
    val complete = fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("v-") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .sortBy(_.getName)
    complete.dropRight(2).foreach(p =>
      try { fs.delete(p, true); () } catch { case _: Exception => () })
  }

  private def dropSnap(spark: SparkSession, snapDir: String): Unit = {
    val fs = new Path(snapDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(snapDir)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** the tombstoned keys, None when no snapshot exists (the common,
    * zero-overhead case: [[keysNovel]] skips the subtraction entirely) */
  private def goneKeys(spark: SparkSession,
      indexDir: String): Option[DataFrame] =
    readSnap(spark, goneDir(indexDir), goneSchema)

  /** RE-ADMISSION keeper ledger `<indexDir>_readded` (_h1, _h2, _id):
    * when a batch re-adds a previously-removed content, the cleared
    * key's NEW keeper is recorded here. [[dedupRemove]] then only
    * accepts the recorded keeper for such keys — the STALE pre-removal
    * index row (which is never physically deleted on the hot path)
    * can no longer satisfy the keeper match, so a crash-replayed old
    * removal batch is a true no-op instead of re-tombstoning live
    * content and re-admitting its next copy as a duplicate. Bounded by
    * re-admissions since the last compaction, which drops the stale
    * rows physically and clears the ledger. */
  private def readdedDir(indexDir: String): String =
    indexDir.stripSuffix("/") + "_readded"

  private val readdedSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("_h1",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("_h2",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("_id",
      org.apache.spark.sql.types.LongType)))

  private def readdedKeys(spark: SparkSession,
      indexDir: String): Option[DataFrame] =
    readSnap(spark, readdedDir(indexDir), readdedSchema)

  private def writeGone(spark: SparkSession, indexDir: String,
      df: DataFrame): Unit =
    writeSnap(spark, goneDir(indexDir), df, Seq("_h1", "_h2"))

  private def dropGone(spark: SparkSession, indexDir: String): Unit =
    dropSnap(spark, goneDir(indexDir))

  // ---- id-grain tombstones (near-dup / embed indexes, which key by id)

  /** id tombstones live INSIDE the index dir (these layouts keep their
    * tables in subdirs, so nothing flat-reads the root) */
  private def goneIdsDir(indexDir: String): String =
    s"${indexDir.stripSuffix("/")}/gone_ids"

  private val goneIdsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType)))

  private def goneIds(spark: SparkSession,
      indexDir: String): Option[DataFrame] =
    readSnap(spark, goneIdsDir(indexDir), goneIdsSchema)

  /** REMOVE contents from the index — the mutation face of
    * [[dedupAppend]] (editorial takedown / erasure: a content removed
    * from the corpus must be NOVEL again if it is ever re-sent, not
    * silently dropped as a duplicate of a doc that no longer exists).
    *
    * O(removed + gone), never O(index): the matched keys land in the
    * small versioned gone snapshot that [[keysNovel]] subtracts from the
    * index scan (broadcast-sized — the bucketed exchange-free plan keeps
    * its shape), and a batch that re-adds a gone content clears its row,
    * so the snapshot is bounded by OUTSTANDING removals.
    * [[compactIndex]] drops tombstoned keys physically and resets it.
    *
    * Self-guarding semantics: only keys whose recorded KEEPER id is
    * among the removed rows tombstone — removing a doc whose content
    * still lives in the corpus under a different keeper is a no-op, and
    * so are replays / double-removes. Returns the contents tombstoned. */
  def dedupRemove(spark: SparkSession, indexDir: String, removed: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Long =
      graft.util.WriterLease.withLease(spark, indexDir, "dedupRemove") {
    val table = indexTableName(indexDir, "keys")
    val idx = if (spark.catalog.tableExists(table)) spark.table(table)
      else spark.read.parquet(indexDir)
    val gone0 = goneKeys(spark, indexDir)
    val ra0 = readdedKeys(spark, indexDir)
    val keyed = removed.select(
        seeded_hash64(col(textCol), lit(Seed1)).as("_h1"),
        seeded_hash64(col(textCol), lit(Seed2)).as("_h2"),
        col(idCol))
      .join(idx, Seq("_h1", "_h2", idCol), "left_semi")
    // keeper validity: a key in the RE-ADMISSION ledger accepts only the
    // recorded (current) keeper — its stale pre-removal index row must
    // not satisfy the match, or a replayed old removal would
    // re-tombstone live content; keys without a ledger record keep the
    // plain index-row match
    val matched = (ra0 match {
      case None => keyed
      case Some(ra) =>
        val guarded = keyed.join(
          broadcast(ra.withColumnRenamed("_id", idCol)),
          Seq("_h1", "_h2", idCol), "left_semi")
        val unguarded = keyed.join(
          broadcast(ra.select(col("_h1"), col("_h2"))),
          Seq("_h1", "_h2"), "left_anti")
        guarded.unionByName(unguarded)
    }).select(col("_h1"), col("_h2")).distinct()
    val fresh = gone0.fold(matched)(g =>
      matched.join(g, Seq("_h1", "_h2"), "left_anti")).localCheckpoint()
    val n = fresh.count()
    if (n == 0L) return 0L
    writeGone(spark, indexDir,
      gone0.fold(fresh)(g => g.unionByName(fresh)))
    // a removed re-added key leaves the ledger (it is dead again; a
    // future re-admission re-records) — best-effort after the gone
    // commit, self-healing if skipped by a crash
    ra0.foreach { r =>
      val rest = r.join(fresh, Seq("_h1", "_h2"), "left_anti")
        .localCheckpoint()
      if (rest.count() < r.count())
        writeSnap(spark, readdedDir(indexDir), rest,
          Seq("_h1", "_h2", "_id"))
    }
    n
  }

  // ------------------------------------------------ incremental NEAR-dup

  /** Append-only NEAR-duplicate removal via a durable MinHash-LSH index —
    * the fuzzy sibling of [[dedupAppend]]. The index holds, for every
    * document ever SEEN (kept or dropped), its exploded LSH band hashes
    * (`bands/`: band_idx, band_hash, id) and its distinct shingle set
    * (`sigs/`: id, sh with shingles xxhash64'd to int64 — the
    * [[Dedup.ngramJaccardPairs]] trick: Jaccard over hashed sets equals
    * Jaccard over the strings up to a ~|union|²/2⁶⁴ per-pair collision
    * chance, and the index shrinks ~8× vs raw shingle strings). Banding
    * is still computed from the STRING shingles, so recall is identical
    * to [[Dedup.minhashPairs]]. A new batch then near-dedups in
    * batch-sized work:
    *
    *   1. shingle + band-hash the batch (the [[Dedup.minhashPairs]]
    *      signature pipeline, identical banding → identical recall);
    *   2. WITHIN-batch: bucket self-join, exact-Jaccard verify — a doc
    *      is dropped if a smaller-id batch doc matches it;
    *   3. ACROSS history: batch bands equi-join the index bands, exact
    *      Jaccard with the id_a side read from the stored index sets and
    *      the id_b side from the batch — a doc is dropped if ANY earlier
    *      doc matches it (drop-if-any-earlier semantics: the dropping
    *      doc need not itself have been kept, which is what lets the
    *      index stay append-only with no kept-status updates; slightly
    *      more aggressive than greedy cluster-first-wins on transitive
    *      chains A~B~C with A≁C);
    *   4. append the batch's bands + shingle sets to the index, keep
    *      decisions checkpointed BEFORE the append (read-then-append
    *      hazard, as in [[dedupAppend]]).
    *
    * Both index tables are BUCKETED external tables
    * ([[graft.sources.Layouts.writeBucketed]] discipline): `bands/` on
    * its join keys (band_idx, band_hash), `sigs/` on the verify key
    * (id). Past `bucketReadThresholdBytes` of on-disk index, the
    * per-batch joins read them through the bucketed tables, so the
    * index side is pre-partitioned and only the batch side shuffles —
    * the index is never exchanged, which is what survives a 100×
    * corpus. Below the threshold the batch reads the same files as
    * plain parquet and runs one unioned verify pipeline instead — at
    * toy index sizes the co-location buys nothing and the extra join
    * stages are pure fixed overhead (the same size-gated strategy
    * choice [[Dedup.clusters]] makes; both paths provably drop the
    * same ids). (Catalog table names are content-derived from the
    * index path; a fresh session re-registers them over the existing
    * files.)
    *
    * Documents too short to shingle are always kept and never indexed.
    * Per-batch cost: the batch's own LSH pass plus equi-joins against
    * index tables that grow with corpus DISTINCT content, not corpus
    * bytes; the corpus text is never rescanned. Single-writer contract
    * as [[dedupAppend]]. */
  def nearDedupAppend(spark: SparkSession, indexDir: String, batch: DataFrame,
      threshold: Double = 0.5, n: Int = 3, k: Int = 64, bands: Int = 16,
      idCol: String = "doc_id", textCol: String = "text",
      indexBuckets: Int = 32,
      bucketReadThresholdBytes: Long = 256L << 20): DataFrame =
      graft.util.WriterLease.withLease(spark, indexDir, "nearDedupAppend") {
    val bandsDir = s"$indexDir/bands"
    val sigsDir = s"$indexDir/sigs"
    val bandsTable = indexTableName(indexDir, "bands")
    val sigsTable = indexTableName(indexDir, "sigs")
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an index exists only once it holds FILES: an all-short first batch
    // appends nothing (below), leaving at most an empty dir
    val haveIndex = fs.exists(new Path(bandsDir)) &&
      indexBytes(fs, bandsDir) > 0
    if (!haveIndex) { // fresh index: drop any stale catalog metadata
      spark.sql(s"DROP TABLE IF EXISTS $bandsTable")
      spark.sql(s"DROP TABLE IF EXISTS $sigsTable")
    }

    // tombstoned ids ([[nearDedupRemove]]): their index rows stop
    // suppressing (subtracted broadcast-side below), and batch rows
    // CARRYING a tombstoned id are treated as already-seen — dropped
    // from the output and never re-indexed, which keeps crash-replayed
    // old batches no-ops (ids are immutable handles: restore content by
    // re-ingesting under a fresh id)
    val gone = goneIds(spark, indexDir)
    val batchLive = gone.fold(batch)(g => batch.join(
      broadcast(g.withColumnRenamed("id", idCol)), Seq(idCol), "left_anti"))

    val (shHashed, bnd) =
      batchSignatures(batchLive, n, k, bands, idCol, textCol)

    // within-batch: smaller id wins, candidates from shared buckets
    val candWithin = bnd.as("x").join(bnd.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    // SIZE-GATED layout (the broadcast-join discipline): while the index
    // is SMALL it stays plain parquet — appends are bare file writes and
    // each batch runs ONE unioned candidate set + ONE verify pipeline
    // (fewest stages; at toy sizes every extra join/DDL is pure fixed
    // overhead). The batch that finds the index past
    // `bucketReadThresholdBytes` PROMOTES it once (compactIndex-style
    // rewrite into the bucketed catalog tables); from then on candidate
    // and verify joins read the index pre-partitioned on their keys and
    // only the batch side shuffles — the shape that survives a 100×
    // corpus (plan-pinned in IncrementalNearDedupSpec). Mode is carried
    // by the catalog: table registered ⇒ bucketed.
    val bucketedMode = haveIndex && {
      if (spark.catalog.tableExists(bandsTable)) true
      else if (indexBytes(fs, bandsDir) + indexBytes(fs, sigsDir) >=
          bucketReadThresholdBytes) {
        promoteToBucketed(spark, fs, bandsDir, bandsTable,
          Seq("band_idx", "band_hash"), indexBuckets)
        promoteToBucketed(spark, fs, sigsDir, sigsTable,
          Seq("id"), indexBuckets)
        true
      } else false
    }

    val dropped = if (!haveIndex) {
      Dedup.verifyJaccardPairs(candWithin, shHashed, threshold)
        .select(col("id_b").as("id")).distinct()
    } else if (!bucketedMode) {
      val idxBands = gone.fold(spark.read.parquet(bandsDir))(g =>
        spark.read.parquet(bandsDir)
          .join(broadcast(g), Seq("id"), "left_anti"))
      val candCross = idxBands.as("x").join(bnd.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_hash") === col("y.band_hash"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .distinct()
      val shAll = shHashed.unionByName(
        requireHashedSigs(spark.read.parquet(sigsDir), sigsDir))
      Dedup.verifyJaccardPairs(candWithin.unionByName(candCross), shAll,
          threshold)
        .select(col("id_b").as("id")).distinct()
    } else {
      val droppedWithin = Dedup.verifyJaccardPairs(candWithin, shHashed,
          threshold)
        .select(col("id_b").as("id"))
      val droppedCross = crossDropped(spark, indexDir, bnd, shHashed,
        threshold, indexBuckets, gone)
      droppedWithin.unionByName(droppedCross).distinct()
    }

    val kept = batchLive.join(
        dropped.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      .localCheckpoint() // decided BEFORE the index grows below
    // an all-short batch has nothing to index: a write of an empty frame
    // emits no parquet files, which a later plain read cannot infer a
    // schema from — skip it (sh is checkpointed, so the emptiness probe
    // reads block metadata, not the pipeline)
    if (!shHashed.isEmpty) {
      if (bucketedMode) {
        appendBucketed(bnd, bandsDir, bandsTable,
          Seq("band_idx", "band_hash"), indexBuckets)
        appendBucketed(shHashed, sigsDir, sigsTable, Seq("id"), indexBuckets)
      } else {
        bnd.write.mode("append").parquet(bandsDir)
        shHashed.write.mode("append").parquet(sigsDir)
      }
    }
    kept
  }

  /** One-time layout promotion at the size threshold: rewrite a plain
    * index dir into its bucketed catalog table. Crash-safe, unlike every
    * other index mutation which is append-only: the bucketed copy is
    * written to a DURABLE sibling dir while the plain files are still in
    * place (no executor-storage checkpoint holds the only copy), and the
    * plain dir is deleted only after the copy is fully on disk — the
    * non-atomic window shrinks to two filesystem metadata ops, with the
    * complete copy durable throughout. Single-writer contract as every
    * other index mutation. */
  private def promoteToBucketed(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String, table: String,
      bucketCols: Seq[String], buckets: Int): Unit = {
    val tmp = new Path(dir + ".promote")
    val dst = new Path(dir)
    val tmpTable = table + "_tmp"
    fs.delete(tmp, true) // leftovers of an interrupted earlier attempt
    spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
    // bucketed write to the sibling path, reading the live plain files
    spark.read.parquet(dir)
      .repartition(buckets, bucketCols.map(col): _*)
      .write.mode("overwrite").format("parquet").option("path", tmp.toString)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(tmpTable)
    val ddl = spark.table(tmpTable).schema.toDDL
    spark.sql(s"DROP TABLE $tmpTable") // external: the files stay put
    // swap: bucket ids live in the FILE NAMES (BucketingUtils), so the
    // renamed files reinterpret identically under the table registered
    // over the final location
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"promotion rename $tmp -> $dst failed")
    val cols = bucketCols.mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table ($ddl) USING parquet " +
      s"CLUSTERED BY ($cols) SORTED BY ($cols) INTO $buckets BUCKETS " +
      s"LOCATION '$dir'")
  }

  /** total bytes of the parquet files under an index dir */
  private def indexBytes(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Long = {
    val p = new Path(dir)
    if (!fs.exists(p)) return 0L
    var sum = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) sum += f.getLen
    }
    sum
  }

  /** One batch's signature tables, both materialized: (sh = (id,
    * sh: array<long> FNV-base-hashed shingle set), bnd = (band_idx,
    * band_hash, id) exploded LSH bands). Both come from ONE native pass
    * per document (graft.functions.ShingleSketch): the band hashes are
    * bit-identical to the string pipeline — identical recall to
    * [[Dedup.minhashPairs]] — and the stored set hashes are the very
    * base values the minhash ladder seeds from, so no string shingle
    * array is ever materialized. */
  private[graft] def batchSignatures(batch: DataFrame, n: Int, k: Int,
      bands: Int, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val sk = batch.select(col(idCol).as("id"),
        graft.functions.functions.shingle_sketch(
          col(textCol), n, k, bands).as("sk"))
      .filter(size(col("sk.sh")) > 0)
      .localCheckpoint()
    // bnd derives from the checkpointed sketch by a bare posexplode —
    // re-evaluating that per consumer is cheaper than a second
    // materialization job per batch
    val bnd = sk.select(col("id"),
        posexplode(col("sk.bands")).as(Seq("band_idx", "band_hash")))
      .select(col("band_idx"), col("band_hash"), col("id"))
    (sk.select(col("id"), col("sk.sh").as("sh")), bnd)
  }

  /** Batch ids dropped by some doc in the index history: LSH candidate
    * equi-join against the bucketed `bands/` table (co-located on
    * (band_idx, band_hash)), exact-Jaccard verify with the id_a side
    * read from the bucketed `sigs/` table (co-located on id) — the
    * index side of both joins is exchange-free (pinned in
    * IncrementalNearDedupSpec). */
  private[graft] def crossDropped(spark: SparkSession, indexDir: String,
      bnd: DataFrame, shHashed: DataFrame, threshold: Double,
      indexBuckets: Int,
      gone: Option[DataFrame] = None): DataFrame = {
    val idxBands0 = bucketedIndexTable(spark, s"$indexDir/bands",
      indexTableName(indexDir, "bands"), Seq("band_idx", "band_hash"),
      indexBuckets)
    // tombstoned ids subtract via a broadcast anti-join: the bucketed
    // band scan stays exchange-free
    val idxBands = gone.fold(idxBands0)(g =>
      idxBands0.join(broadcast(g), Seq("id"), "left_anti"))
    val idxSigs = requireHashedSigs(
      bucketedIndexTable(spark, s"$indexDir/sigs",
        indexTableName(indexDir, "sigs"), Seq("id"), indexBuckets),
      s"$indexDir/sigs")
    val candCross = idxBands.as("x").join(bnd.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    Dedup.verifyJaccardPairsAB(candCross, idxSigs, shHashed, threshold)
      .select(col("id_b").as("id"))
  }

  /** REMOVE documents (by id) from the near-dup index — the mutation
    * face of [[nearDedupAppend]] (editorial takedown / erasure: a
    * removed document must stop suppressing future near-duplicates of
    * itself). O(removed + gone), never an index rewrite: matched ids
    * land in a small versioned `gone_ids` snapshot that every index-side
    * read subtracts via a forced broadcast (the bucketed exchange-free
    * plan keeps its shape); [[compactIndex]] drops their rows physically
    * and resets the snapshot.
    *
    * Ids are IMMUTABLE handles here: removal is permanent for the id —
    * restore content by re-ingesting under a FRESH id (sigs are per-id
    * shingle sets, so resurrecting an id could mix two content versions
    * into one set and corrupt every Jaccard it appears in). Batch rows
    * carrying a tombstoned id are treated as already-seen: dropped from
    * the output, never re-indexed — a crash-replayed old batch stays a
    * no-op. Unknown / already-removed ids no-op. Returns the number of
    * ids tombstoned. */
  def nearDedupRemove(spark: SparkSession, indexDir: String, ids: DataFrame,
      idCol: String = "doc_id"): Long =
      graft.util.WriterLease.withLease(spark, indexDir, "nearDedupRemove") {
    val sigsDir = s"$indexDir/sigs"
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(sigsDir)) || indexBytes(fs, sigsDir) == 0L)
      return 0L
    val sigsTable = indexTableName(indexDir, "sigs")
    val idx = if (spark.catalog.tableExists(sigsTable)) spark.table(sigsTable)
      else spark.read.parquet(sigsDir)
    val gone0 = goneIds(spark, indexDir)
    val tgt = ids.select(col(idCol).cast("long").as("id")).distinct()
      .join(idx.select(col("id")), Seq("id"), "left_semi")
    val fresh = gone0.fold(tgt)(g =>
      tgt.join(g, Seq("id"), "left_anti")).localCheckpoint()
    val n = fresh.count()
    if (n == 0L) return 0L
    writeSnap(spark, goneIdsDir(indexDir),
      gone0.fold(fresh)(g => g.unionByName(fresh)), Seq("id"))
    n
  }

  /** REMOVE vectors (by id) from the embedding near-dup index — the
    * mutation face of [[embedDedupAppend]], same contract as
    * [[nearDedupRemove]]: O(removed + gone) versioned `gone_ids`
    * tombstones, broadcast-subtracted from the vecs scan (exchange-free
    * shape preserved), permanent per id, batch rows carrying a
    * tombstoned id treated as already-seen. Stored radii stay put:
    * they are UPPER bounds per cell, so pruning remains lossless after
    * a removal — only slightly less tight until [[compactIndex]] drops
    * the rows physically (its opt-in model refresh recomputes radii
    * from the surviving vectors). */
  def embedDedupRemove(spark: SparkSession, indexDir: String, ids: DataFrame,
      idCol: String = "vec_id"): Long =
      graft.util.WriterLease.withLease(spark, indexDir, "embedDedupRemove") {
    val vecsDir = s"$indexDir/vecs"
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(vecsDir)) || indexBytes(fs, vecsDir) == 0L)
      return 0L
    val vecsTable = indexTableName(indexDir, "vecs")
    val idx = if (spark.catalog.tableExists(vecsTable)) spark.table(vecsTable)
      else spark.read.parquet(vecsDir)
    val gone0 = goneIds(spark, indexDir)
    val tgt = ids.select(col(idCol).cast("long").as("id")).distinct()
      .join(idx.select(col("id")), Seq("id"), "left_semi")
    val fresh = gone0.fold(tgt)(g =>
      tgt.join(g, Seq("id"), "left_anti")).localCheckpoint()
    val n = fresh.count()
    if (n == 0L) return 0L
    writeSnap(spark, goneIdsDir(indexDir),
      gone0.fold(fresh)(g => g.unionByName(fresh)), Seq("id"))
    n
  }

  /** Index format guard: format v2 stores `sh` xxhash64'd as
    * array<long>; the original format stored raw shingle strings. With
    * a v1 index on disk, unionByName / array_intersect would type-coerce
    * long vs string to array<string>, every cross-history Jaccard would
    * be 0, and duplicates against pre-upgrade history would silently
    * PASS — fail fast instead (r8 ADVICE). The element type doubles as
    * the version stamp: it is the one thing the old files cannot fake. */
  private def requireHashedSigs(df: DataFrame, where: String): DataFrame =
    df.schema("sh").dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, _) => df
      case other => throw new IllegalStateException(
        s"$where stores sh as $other — a pre-v2 (string-shingle) near-dup " +
          "index; rebuild the index (or re-hash sigs/ with xxhash64) " +
          "before appending to it")
    }

  /** Deterministic catalog name for a bucketed index table at `dir` —
    * content-derived so any session over the same path re-registers the
    * identical table (Spark's bucketing contract puts bucket metadata in
    * the catalog, not the files). */
  private[graft] def indexTableName(indexDir: String, part: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(indexDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString
    s"graft_ndidx_${part}_$h"
  }

  /** Read an index table bucketed; (re)register the external table over
    * the existing files when this session's catalog doesn't know it yet
    * (schema rediscovered from the parquet footers — same DDL, same
    * buckets, so the files are reinterpreted identically). */
  private def bucketedIndexTable(spark: SparkSession, dir: String,
      table: String, bucketCols: Seq[String], buckets: Int): DataFrame = {
    if (!spark.catalog.tableExists(table)) {
      val ddl = spark.read.parquet(dir).schema.toDDL
      val cols = bucketCols.mkString(", ")
      spark.sql(s"CREATE TABLE $table ($ddl) USING parquet " +
        s"CLUSTERED BY ($cols) SORTED BY ($cols) INTO $buckets BUCKETS " +
        s"LOCATION '$dir'")
    }
    spark.table(table)
  }

  /** Append one batch's rows to a bucketed index table (creates the
    * table on first append). The pre-write repartition uses the SAME
    * hash keys and partition count as the bucket spec, so each task
    * holds exactly one bucket's rows and writes exactly one file —
    * without it, bucketed writes emit one file per (task × bucket
    * present), and the per-batch small-file count compounds into the
    * next batch's read. */
  private def appendBucketed(df: DataFrame, dir: String, table: String,
      bucketCols: Seq[String], buckets: Int): Unit =
    df.repartition(buckets, bucketCols.map(col): _*)
      .write.mode("append").format("parquet").option("path", dir)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  // ------------------------------------------ incremental EMBEDDING dedup

  /** Append-only EXACT embedding near-duplicate removal via a durable
    * IVF-cell-blocked index — the vector sibling of [[nearDedupAppend]],
    * built on [[graft.operators.Similarity.exactPairs]]' lossless
    * centroid-angle pruning rather than LSH banding (banding needs a
    * similarity gap for recall; the cell bound is complete at ANY
    * threshold). The index holds:
    *
    *   - `model/`: the spherical-k-means centroids fit ONCE on the
    *     FIRST batch and FROZEN — append-only indexes cannot re-fit (a
    *     drifted model would re-assign history), and the pruning bound
    *     is lossless under any fixed centroid set, so model quality
    *     only affects pruning efficiency, never recall;
    *   - `radii/`: per-cell max member-to-centroid angle over every
    *     vector ever seen — radii only GROW (max-merge per batch), so
    *     the triangle-inequality bound stays valid as cells accumulate
    *     members beyond the fit sample;
    *   - `vecs/`: (id, e, cell) for every vector ever seen.
    *
    * A batch assigns against the frozen centroids, prunes cell pairs
    * with the UPDATED radii, verifies exact cosine inside the cell-pair
    * equi-join (never an all-pairs product), and drops a vector if ANY
    * earlier vector matches it (drop-if-any-earlier, as the whole
    * family). Vectors the assigner cannot place (null/zero-norm) are
    * always kept and never indexed.
    *
    * Layout follows [[nearDedupAppend]]'s size gate: `vecs/` is plain
    * parquet while small and promotes once past
    * `bucketReadThresholdBytes` into a catalog table BUCKETED by `cell`
    * — the cross-history join's key — so at scale the wide embedding
    * payload is never exchanged; only the batch side shuffles.
    * Single-writer contract as [[dedupAppend]]. */
  def embedDedupAppend(spark: SparkSession, indexDir: String, batch: DataFrame,
      threshold: Double = 0.4, cells: Int = 32, sampleN: Int = 1024,
      iters: Int = 6, seed: Long = 42L,
      idCol: String = "vec_id", embCol: String = "embedding",
      indexBuckets: Int = 32,
      bucketReadThresholdBytes: Long = 256L << 20): DataFrame =
      graft.util.WriterLease.withLease(spark, indexDir, "embedDedupAppend") {
    import graft.functions.functions.cosine_similarity
    val vecsDir = s"$indexDir/vecs"
    val modelDir = s"$indexDir/model"
    val radiiDir = s"$indexDir/radii"
    val vecsTable = indexTableName(indexDir, "vecs")
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a compaction-time model refresh interrupted mid-commit must finish
    // before this batch reads the (model, radii, vecs) triple
    recoverIvfRefresh(spark, fs, indexDir)
    val haveIndex = fs.exists(new Path(modelDir)) &&
      indexBytes(fs, vecsDir) > 0
    if (!haveIndex) spark.sql(s"DROP TABLE IF EXISTS $vecsTable")

    // tombstoned ids ([[embedDedupRemove]]): index rows stop suppressing,
    // batch rows carrying a tombstoned id are already-seen (dropped,
    // never re-indexed) — replayed old batches stay no-ops
    val gone = goneIds(spark, indexDir)
    val batchLive = gone.fold(batch)(g => batch.join(
      broadcast(g.withColumnRenamed("id", idCol)), Seq(idCol), "left_anti"))

    val model =
      if (haveIndex) loadCentroids(spark, modelDir)
      else {
        val m = IVF.fit(batchLive, cells, sampleN, iters, seed, idCol, embCol)
        saveCentroids(spark, modelDir, m)
        m
      }
    val k = model.centroids.length

    val assigned = IVF.index(batchLive, model, embCol)
      .select(col(idCol).as("id"), col(embCol).as("e"),
        col("ivf_cell").as("cell"))
      .localCheckpoint()
    val placeable = assigned.filter(col("cell").isNotNull)

    def clamp(x: Double): Double = math.max(-1.0, math.min(1.0, x))
    val centsLit = array(model.centroids.map(c => array(c.map(lit): _*)): _*)
    val batchRadii: Map[Int, Double] = placeable.groupBy("cell")
      .agg(min(cosine_similarity(col("e"),
        element_at(centsLit, col("cell") + 1))).as("mc"))
      .collect().map(r => r.getInt(0) -> math.acos(clamp(r.getDouble(1))))
      .toMap
    val storedRadii: Map[Int, Double] =
      if (haveIndex) loadRadii(spark, radiiDir) else Map.empty
    val radii = (batchRadii.keySet ++ storedRadii.keySet).map(c =>
      c -> math.max(batchRadii.getOrElse(c, 0.0),
        storedRadii.getOrElse(c, 0.0))).toMap

    val tAngle = math.acos(clamp(threshold))
    def centAngle(i: Int, j: Int): Double = {
      val (a, b) = (model.centroids(i), model.centroids(j))
      var dot = 0.0; var na = 0.0; var nb = 0.0; var d = 0
      while (d < a.length) {
        dot += a(d) * b(d); na += a(d) * a(d); nb += b(d) * b(d); d += 1
      }
      if (na == 0 || nb == 0) 0.0 else math.acos(clamp(dot / math.sqrt(na * nb)))
    }
    val keep = for {
      i <- 0 until k; j <- 0 until k
      ri <- radii.get(i); rj <- radii.get(j)
      if i == j || centAngle(i, j) <= tAngle + ri + rj
    } yield (i, j)
    import spark.implicits._
    val cellPairs = broadcast(keep.toDF("ca", "cb"))

    val yb = placeable.select(col("id").as("id_b"), col("e").as("e_b"),
      col("cell").as("cb"))
    val xWithin = placeable.select(col("id").as("id_a"), col("e").as("e_a"),
      col("cell").as("ca"))
    val droppedWithin = embedDroppedVs(xWithin, yb, cellPairs,
      ordered = true, threshold)
    val dropped = (if (haveIndex) {
      val hist =
        if (spark.catalog.tableExists(vecsTable)) spark.table(vecsTable)
        else if (indexBytes(fs, vecsDir) >= bucketReadThresholdBytes) {
          promoteToBucketed(spark, fs, vecsDir, vecsTable, Seq("cell"),
            indexBuckets)
          spark.table(vecsTable)
        } else spark.read.parquet(vecsDir)
      val histLive = gone.fold(hist)(g =>
        hist.join(broadcast(g), Seq("id"), "left_anti"))
      val xCross = histLive.select(col("id").as("id_a"), col("e").as("e_a"),
        col("cell").as("ca"))
      droppedWithin.unionByName(
        embedDroppedVs(xCross, yb, cellPairs, ordered = false, threshold))
    } else droppedWithin).distinct()

    val kept = batchLive.join(
        dropped.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      .localCheckpoint() // decided BEFORE the index grows below
    if (!placeable.isEmpty) {
      // radii BEFORE vectors: a crash in between leaves radii covering
      // vectors not yet indexed — conservatively large, still lossless.
      // The reverse order could leave indexed vectors OUTSIDE the stored
      // radii, silently losing recall on every later batch.
      saveRadii(spark, radiiDir, radii)
      if (spark.catalog.tableExists(vecsTable))
        appendBucketed(placeable, vecsDir, vecsTable, Seq("cell"),
          indexBuckets)
      else placeable.write.mode("append").parquet(vecsDir)
    }
    kept
  }

  /** Cell-pair-pruned exact-cosine candidate check, oriented for scale:
    * the SMALL batch side (`yb`) expands by the broadcast `cellPairs`
    * (≤k× rows), and the expanded batch then equi-joins `xSide` on
    * `xSide`'s OWN cell column `ca`. For the cross-history join `xSide`
    * is the vecs index, bucketed on `cell` = `ca`, so the join key IS
    * the bucket column: the wide embedding payload is read
    * pre-partitioned and never exchanged — only the expanded batch
    * shuffles (plan-pinned in IncrementalNearDedupSpec). The reversed
    * orientation (expanding history by cellPairs, joining on `cb`)
    * would shuffle the embeddings whenever the batch is too big to
    * broadcast. */
  private[graft] def embedDroppedVs(xSide: DataFrame, yb: DataFrame,
      cellPairs: DataFrame, ordered: Boolean, threshold: Double): DataFrame = {
    import graft.functions.functions.cosine_similarity
    val ybExp = yb.join(cellPairs, Seq("cb"))
    xSide.join(ybExp, xSide("ca") === ybExp("ca") &&
        (if (ordered) col("id_a") < col("id_b") else lit(true)))
      .filter(cosine_similarity(col("e_a"), col("e_b")) >= threshold)
      .select(col("id_b").as("id"))
  }

  private def saveCentroids(spark: SparkSession, dir: String,
      model: IVF.Model): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex.flatMap { case (c, i) =>
      c.zipWithIndex.map { case (v, p) => (i, p, v) }
    }.toSeq.toDF("cell", "pos", "v").coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  private def loadCentroids(spark: SparkSession, dir: String): IVF.Model = {
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val k = rows.map(_._1).max + 1
    val dim = rows.map(_._2).max + 1
    val cents = Array.ofDim[Double](k, dim)
    rows.foreach { case (c, p, v) => cents(c)(p) = v }
    IVF.Model(cents)
  }

  /** radii are k tiny driver-held rows: rewritten whole per batch */
  private def saveRadii(spark: SparkSession, dir: String,
      radii: Map[Int, Double]): Unit = {
    import spark.implicits._
    radii.toSeq.toDF("cell", "radius").coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  private def loadRadii(spark: SparkSession, dir: String): Map[Int, Double] =
    spark.read.parquet(dir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap

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
      gram: Int = 8, idCol: String = "doc_id", textCol: String = "text",
      indexBuckets: Int = 32,
      bucketReadThresholdBytes: Long = 256L << 20): DataFrame =
      graft.util.WriterLease.withLease(spark, indexDir, "spanDedupAppend") {
    val gramsDir = s"$indexDir/grams"
    val table = indexTableName(indexDir, "grams")
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val haveIndex = fs.exists(new Path(gramsDir)) &&
      indexBytes(fs, gramsDir) > 0
    if (!haveIndex) spark.sql(s"DROP TABLE IF EXISTS $table")
    // size gate as dedupAppend: plain while small, promoted once into a
    // table BUCKETED on `h` — both the duplicated-hash semi join and the
    // novel-hash anti join then read the index co-located on their key
    val bucketed = haveIndex && (spark.catalog.tableExists(table) ||
      (indexBytes(fs, gramsDir) >= bucketReadThresholdBytes && {
        promoteToBucketed(spark, fs, gramsDir, table, Seq("h"), indexBuckets)
        true
      }))
    // lazy: the eager `spans` checkpoint below is the single
    // materializing job for the whole per-batch tree (g is shared by the
    // duplicated-span join and, via distinctH, both index lookups — the
    // lazy persist still computes it once)
    val g = Dedup.gramHashes(batch, gram, idCol, textCol)
      .localCheckpoint(eager = false)
    val distinctH = g.select(col("h")).distinct()
      .localCheckpoint(eager = false)
    val within = g.groupBy(col("h")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= 2).select(col("h"))
    // append only hashes the index does not already hold: batches sharing
    // content would otherwise re-append their overlap every run, so index
    // growth is bounded by distinct windows as documented (duplicate rows
    // from a crash re-run remain harmless — lookups are left_semi — and
    // compactIndex cleans them)
    val (dupH, novelH) = if (haveIndex) {
      val (dupSemi, novelAnti) =
        spanIndexLookups(spark, indexDir, distinctH, bucketed)
      (within.unionByName(dupSemi).distinct(),
        // lazy: consumed exactly once, by the index append's own write
        // job — whose scan of grams/ is planned (file list snapshotted)
        // before any new file lands, so the read-then-append hazard
        // cannot bite; the eager `spans` checkpoint has already fixed
        // the batch's REPORTED spans by then
        novelAnti.localCheckpoint(eager = false))
    } else (within, distinctH)
    val spans = Dedup.mergeSpanIslands(
        g.join(dupH, Seq("h"), "left_semi"), gram)
      .localCheckpoint() // decided BEFORE the index grows below
    if (bucketed) appendBucketed(novelH, gramsDir, table, Seq("h"),
      indexBuckets)
    else novelH.write.mode("append").parquet(gramsDir)
    spans
  }

  /** The per-batch gram-index lookups: (duplicated-hash semi join,
    * novel-hash anti join), both keyed on `h`. In bucketed mode the
    * index scan arrives pre-partitioned on `h`, so only the batch's
    * distinct hashes shuffle (plan-pinned in IncrementalNearDedupSpec). */
  private[graft] def spanIndexLookups(spark: SparkSession, indexDir: String,
      distinctH: DataFrame, bucketed: Boolean): (DataFrame, DataFrame) = {
    val idx = if (bucketed) spark.table(indexTableName(indexDir, "grams"))
      else spark.read.parquet(s"$indexDir/grams")
    (distinctH.join(idx, Seq("h"), "left_semi"),
      distinctH.join(idx, Seq("h"), "left_anti"))
  }

  // --------------------------------------------------- index compaction

  /** Rewrite every table of a dedup index to one row per DISTINCT entry —
    * crash-rerun hygiene: an append that ran after its batch's result
    * was materialized but crashed before completion can leave duplicate
    * index rows on a re-run. Duplicates never change dedup decisions
    * (every lookup is a semi/anti join), but they grow the index and its
    * per-batch scan forever; one compaction pass reclaims them, like
    * [[graft.sources.Layouts.compact]] does for corpora.
    *
    * Handles every index layout this module writes: the flat exact-dedup
    * key table at `indexDir` itself, a `grams/` span index, and the
    * bucketed `bands/`/`sigs/` near-dup tables (compacted THROUGH their
    * catalog tables so the rewrite preserves the bucketed layout). The
    * distinct result is materialized before the overwrite (an overwrite
    * cannot read the files it replaces). Runs under the same
    * single-writer contract as the appends — don't compact an index a
    * concurrent batch is appending to.
    *
    * @return per compacted table: path -> (rowsBefore, rowsAfter) */
  // --------------------------------------------- incremental CLUSTERING

  /** Append-only near-duplicate CLUSTER maintenance — incremental
    * connected components over the growing duplicate-pair stream, the
    * missing incremental member of the dedup family (exact / near / span
    * / embed dedup all judge a batch against history; this keeps the
    * CLUSTER LABELS current so survivor selection never recomputes
    * components over the whole corpus).
    *
    * Pairs-driven: the caller feeds each batch's duplicate pairs
    * (`id_a`, `id_b` — from [[nearDedupAppend]], [[Dedup.minhashPairs]],
    * embed pairs, any detector). Durable state under `indexDir`:
    *
    *   - `labels/`  (id, label): one APPEND-ONLY row per node ever seen,
    *     stamped with its component's min id at insert time;
    *   - `remaps/`  (src, dst): the APPEND-ONLY merge log — a batch that
    *     connects two existing components records `old root → new root`
    *     (dst < src always: roots are component MINIMA, so merging only
    *     lowers them — the log is acyclic by construction).
    *
    * A batch's work is BATCH-SIZED, never corpus-sized: endpoints look
    * up their current roots (a broadcast semi-join against `labels/` —
    * one index scan, no exchange of the label table — then the merge-log
    * closure, a pointer-doubled self-join of a table bounded by the
    * number of merges ever), the pair set CONTRACTS to root space, and
    * [[Dedup.clusters]] runs on the contracted graph (old roots + new
    * ids — |batch pairs| edges). New ids append to `labels/`; moved
    * roots append to `remaps/`. [[resolvedClusters]] equals the one-shot
    * [[Dedup.clusters]] over the cumulative pair set EXACTLY (components
    * are order-free and min labels compose: the min of a merged
    * component is the min over its constituent roots) — pinned in
    * IncrementalClusterSpec by a generated multi-batch property.
    *
    * Crash contract (same as the other appenders): the two appends are
    * not atomic — re-send the batch after a failure. A replayed batch is
    * a no-op: endpoints resolve to already-merged roots, the contracted
    * components re-derive, src==dst remaps are dropped, and known ids
    * anti-join away. `remaps/` is written FIRST (a lost `labels/` append
    * replays cleanly; the reverse order would leave old members split
    * from the new ids' labels until replay). [[compactIndex]] folds the
    * merge log into `labels/` so read-time closure stays shallow. */
  def clusterAppend(spark: SparkSession, indexDir: String, pairs: DataFrame,
      maxDriverEdges: Long = 1L << 18): Unit =
      graft.util.WriterLease.withLease(spark, indexDir, "clusterAppend") {
    val labelsDir = s"$indexDir/labels"
    val remapsDir = s"$indexDir/remaps"
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompactLeftover(fs, labelsDir)
    // lazy checkpoints throughout (optimization r13): each per-append
    // materialization fuses into the first downstream action instead of
    // its own eager job — ordering contracts below are preserved because
    // every lazy frame that reads an index dir is forced by an action
    // that runs BEFORE that dir is appended to (remapNew.count before the
    // remaps write; newLabels.count before the labels write).
    val e = pairs.select(col("id_a").cast("long").as("a"),
      col("id_b").cast("long").as("b")).localCheckpoint(eager = false)
    val nodes = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id"))).distinct()
      .localCheckpoint(eager = false)
    val haveLabels = indexBytes(fs, labelsDir) > 0
    // current root of every KNOWN endpoint: stored label resolved
    // through the merge-log closure
    val closure = remapClosure(spark, remapsDir).localCheckpoint(eager = false)
    val known = (if (haveLabels)
        spark.read.parquet(labelsDir).join(nodes, Seq("id"), "left_semi")
          .join(closure, col("label") === closure("src"), "left")
          .select(col("id"), coalesce(col("dst"), col("label")).as("root"))
      else spark.range(0).select(col("id"), col("id").as("root"))
      ).localCheckpoint(eager = false)
    // contract the batch graph to root space (unknown endpoints are
    // their own roots) and re-cluster — batch-sized work
    val ka = known.select(col("id").as("a"), col("root").as("ra"))
    val kb = known.select(col("id").as("b"), col("root").as("rb"))
    val contracted = e.join(ka, Seq("a"), "left").join(kb, Seq("b"), "left")
      .select(coalesce(col("ra"), col("a")).as("id_a"),
        coalesce(col("rb"), col("b")).as("id_b"))
    val lab = Dedup.clusters(contracted, maxDriverEdges = maxDriverEdges)
      .select(col("id").as("node"), col("cluster_id").as("newRoot"))
      .localCheckpoint(eager = false)
    // merge log first (see crash contract above): roots that moved.
    // The count() gate is ALSO the materializer: it forces remapNew (and
    // transitively closure/known/lab, which read remaps/ and labels/)
    // before either dir grows.
    val remapNew = known.select(col("root")).distinct()
      .join(lab, col("root") === col("node"))
      .filter(col("newRoot") =!= col("root"))
      .select(col("root").as("src"), col("newRoot").as("dst"))
      .localCheckpoint(eager = false)
    if (remapNew.count() > 0)
      remapNew.write.mode("append").parquet(remapsDir)
    // then the new ids, stamped with their final component min; the
    // count() forces the labels/ anti-join before labels/ grows
    val newIds = if (haveLabels)
      nodes.join(spark.read.parquet(labelsDir), Seq("id"), "left_anti")
    else nodes
    val newLabels = newIds.join(lab, newIds("id") === lab("node"))
      .select(col("id"), col("newRoot").as("label"))
      .localCheckpoint(eager = false)
    if (newLabels.count() > 0)
      newLabels.write.mode("append").parquet(labelsDir)
  }

  /** Every node ever fed to [[clusterAppend]] with its CURRENT component
    * label (= the component's min id): `labels/` joined through the
    * merge-log closure. Equals the one-shot [[Dedup.clusters]] over the
    * cumulative pair multiset. */
  def resolvedClusters(spark: SparkSession, indexDir: String): DataFrame = {
    recoverCompactLeftover(new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration),
      s"$indexDir/labels")
    val closure = remapClosure(spark, s"$indexDir/remaps")
    spark.read.parquet(s"$indexDir/labels")
      .join(closure, col("label") === closure("src"), "left")
      .select(col("id"), coalesce(col("dst"), col("label")).as("cluster_id"))
  }

  /** Corpus rows that SURVIVE incremental near-dup clustering: drop
    * every doc that is a NON-canonical member of a cluster (its resolved
    * label is some other doc's id); docs in no cluster — never fed to
    * [[clusterAppend]] in any pair — survive untouched. Equals the
    * one-shot [[Dedup.dropNearDuplicates]] over the cumulative pair set
    * by the [[resolvedClusters]] equivalence, but the per-epoch cost is
    * one anti-join against the label index instead of recomputing
    * components over the whole corpus. */
  def clusterSurvivors(docs: DataFrame, indexDir: String,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val dropped = resolvedClusters(spark, indexDir)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }

  /** The merge log transitively CLOSED: (src → final root) for every
    * root that ever moved. Pointer doubling over the log — a table
    * bounded by the number of merges, log₂(chain) self-join rounds;
    * chains only grow one hop per batch and [[compactIndex]] resets them
    * to zero. Conflicting duplicates (replayed batches) collapse
    * deterministically to the min target. */
  private[graft] def remapClosure(spark: SparkSession,
      remapsDir: String): DataFrame = {
    val fs = new Path(remapsDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (indexBytes(fs, remapsDir) == 0)
      return spark.range(0).select(col("id").as("src"), col("id").as("dst"))
    var m = spark.read.parquet(remapsDir)
      .groupBy(col("src")).agg(org.apache.spark.sql.functions.min(col("dst")).as("dst"))
      .localCheckpoint(eager = false) // unresolved() probe materializes
    var iters = 0
    def unresolved(d: DataFrame): Boolean =
      d.join(d.select(col("src").as("_s")), col("dst") === col("_s"),
        "left_semi").limit(1).count() > 0
    var pending = unresolved(m)
    while (iters < 64 && pending) {
      val l = m.select(col("src"), col("dst"))
      val r = m.select(col("src").as("_rs"), col("dst").as("_rd"))
      m = l.join(r, col("dst") === col("_rs"), "left")
        .select(col("src"), coalesce(col("_rd"), col("dst")).as("dst"))
        .localCheckpoint(eager = false)
      pending = unresolved(m)
      iters += 1
    }
    // pointer doubling covers 2^64-deep chains in 64 rounds, so this is
    // practically unreachable — but a partially-resolved closure would
    // silently mislabel clusters; fail loudly instead
    if (pending) throw new IllegalStateException(
      s"remapClosure($remapsDir) did not converge after $iters " +
        "pointer-doubling rounds — merge log may be cyclic/corrupt; " +
        "rebuild the index or run compactIndex from a backup")
    m
  }

  /** `refreshIvfModel`: opt-in RE-CLUSTER of the embedding index's frozen
    * IVF model at compaction time. [[embedDedupAppend]] fits its
    * centroids once on the first batch and freezes them — correct at any
    * quality (the cell-pair bound is lossless under ANY fixed centroid
    * set) but under DRIFT the first-batch model's cells skew: a few cells
    * absorb most of the corpus and their ever-growing radii make the
    * pruning keep almost every cell pair. The refresh rebuilds centroids
    * from the index's OWN vectors (index-sized work, never a corpus
    * rescan), re-assigns every indexed vector, and recomputes radii
    * EXACTLY from the members (tighter than the grown running maxima).
    * Dedup decisions are unaffected — past survivors are already
    * recorded, and future batches verify exact cosine inside the (still
    * lossless) pruned pairs; only pruning efficiency changes. The three
    * dirs (model/radii/vecs) must stay mutually consistent, so the
    * refresh stages complete copies first, then commits via a READY
    * marker + per-dir swaps; [[recoverIvfRefresh]] replays an
    * interrupted commit idempotently at the next lease acquisition. */
  def compactIndex(spark: SparkSession, indexDir: String,
      indexBuckets: Int = 32,
      refreshIvfModel: Boolean = false,
      refreshSampleN: Int = 1024,
      refreshIters: Int = 6,
      refreshSeed: Long = 42L): Map[String, (Long, Long)] =
      graft.util.WriterLease.withLease(spark, indexDir, "compactIndex") {
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs.exists(new Path(p))
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    recoverIvfRefresh(spark, fs, indexDir)

    def compactPlain(dir: String,
        xform: DataFrame => DataFrame = identity): Unit = {
      recoverCompactLeftover(fs, dir)
      if (exists(dir)) {
        val df = spark.read.parquet(dir)
        val before = df.count()
        val d = xform(df).distinct().localCheckpoint()
        val after = d.count()
        if (after < before) swapInPlace(fs, dir, d)
        out(dir) = (before, after)
      }
    }
    def compactBucketed(dir: String, part: String, bucketCols: Seq[String],
        xform: DataFrame => DataFrame = identity): Unit = if (exists(dir)) {
      val table = indexTableName(indexDir, part)
      val src = if (spark.catalog.tableExists(table)) spark.table(table)
        else spark.read.parquet(dir)
      val before = src.count()
      val d = xform(src).distinct().localCheckpoint()
      val after = d.count()
      if (after < before) {
        // same tmp-dir-then-swap discipline as promoteToBucketed: the
        // compacted bucketed copy becomes durable at a sibling path while
        // the live files stay put (the checkpointed `d` lives in executor
        // storage — never the only copy of index state)
        val tmp = new Path(dir + ".compact")
        val tmpTable = table + "_tmp"
        fs.delete(tmp, true)
        spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
        d.write.mode("overwrite").format("parquet")
          .option("path", tmp.toString)
          .bucketBy(indexBuckets, bucketCols.head, bucketCols.tail: _*)
          .sortBy(bucketCols.head, bucketCols.tail: _*)
          .saveAsTable(tmpTable)
        val ddl = spark.table(tmpTable).schema.toDDL
        spark.sql(s"DROP TABLE $tmpTable") // external: the files stay put
        spark.sql(s"DROP TABLE IF EXISTS $table")
        fs.delete(new Path(dir), true)
        if (!fs.rename(tmp, new Path(dir)))
          throw new java.io.IOException(s"compaction rename $tmp -> $dir failed")
        val cols = bucketCols.mkString(", ")
        spark.sql(s"CREATE TABLE $table ($ddl) USING parquet " +
          s"CLUSTERED BY ($cols) SORTED BY ($cols) INTO $indexBuckets BUCKETS " +
          s"LOCATION '$dir'")
      }
      out(dir) = (before, after)
    }

    // layout-aware: a dir whose catalog table exists compacts THROUGH
    // the table (preserving the bucketed layout); a still-plain dir
    // compacts as bare parquet and stays plain
    def compactAuto(dir: String, part: String, bucketCols: Seq[String],
        xform: DataFrame => DataFrame = identity): Unit =
      if (spark.catalog.tableExists(indexTableName(indexDir, part)))
        compactBucketed(dir, part, bucketCols, xform)
      else compactPlain(dir, xform)

    // flat exact-dedup index: parquet files directly under indexDir.
    // Outstanding [[dedupRemove]] tombstones drop PHYSICALLY here (the
    // rewrite anti-joins them away) and the snapshot resets — after
    // compaction every surviving index row is live again.
    val flatFiles = exists(indexDir) &&
      fs.listStatus(new Path(indexDir)).exists(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (flatFiles) {
      val gone = goneKeys(spark, indexDir)
      val ra = readdedKeys(spark, indexDir)
      compactAuto(indexDir, "keys", Seq("_h1", "_h2"), df => {
        val d1 = gone.fold(df)(g =>
          df.join(broadcast(g), Seq("_h1", "_h2"), "left_anti"))
        // re-admitted keys: keep only the CURRENT keeper's row — the
        // stale pre-removal rows drop here, after which the ledger can
        // clear (the plain index-row keeper match is exact again)
        ra.fold(d1) { r =>
          val idName = d1.columns.filterNot(Seq("_h1", "_h2").contains).head
          d1.join(broadcast(r.withColumnRenamed("_id", "_ra_id")),
              Seq("_h1", "_h2"), "left")
            .filter(col("_ra_id").isNull || col("_ra_id") === col(idName))
            .drop("_ra_id")
        }
      })
      if (gone.isDefined) dropGone(spark, indexDir)
      if (ra.isDefined) dropSnap(spark, readdedDir(indexDir))
    }
    compactAuto(s"$indexDir/grams", "grams", Seq("h"))
    // id tombstones (nearDedupRemove / embedDedupRemove) drop PHYSICALLY
    // here from every id-keyed table — but the gone_ids snapshot itself
    // SURVIVES: ids are permanent handles, and a crash-replayed OLD
    // batch carrying a removed id must stay a no-op after compaction
    // too (dropping the snapshot would let the replay re-index the
    // removed doc and undo the takedown). The snapshot is bounded by
    // total removals ever — tombstoning is rare, rows are 8 bytes.
    val goneI = goneIds(spark, indexDir)
    def dropIds(df: DataFrame): DataFrame =
      goneI.fold(df)(g => df.join(broadcast(g), Seq("id"), "left_anti"))
    compactAuto(s"$indexDir/bands", "bands", Seq("band_idx", "band_hash"),
      dropIds)
    compactAuto(s"$indexDir/sigs", "sigs", Seq("id"), dropIds)
    compactAuto(s"$indexDir/vecs", "vecs", Seq("cell"), dropIds)
    // opt-in IVF model re-cluster (see the method doc): rebuild
    // centroids from the index's own vectors, re-assign, recompute radii
    // exactly, and commit the consistent (model, radii, vecs) triple via
    // staged copies + READY marker
    if (refreshIvfModel && exists(s"$indexDir/model") &&
        indexBytes(fs, s"$indexDir/vecs") > 0) {
      import graft.functions.functions.cosine_similarity
      val vecsTable = indexTableName(indexDir, "vecs")
      val oldModel = loadCentroids(spark, s"$indexDir/model")
      val src = if (spark.catalog.tableExists(vecsTable)) spark.table(vecsTable)
        else spark.read.parquet(s"$indexDir/vecs")
      val nVecs = src.count()
      val m2 = IVF.fit(src, oldModel.centroids.length, refreshSampleN,
        refreshIters, refreshSeed, "id", "e")
      // every indexed vector was placeable under the old model (non-zero
      // norm), so reassignment against the new centroids never nulls
      val reassigned = IVF.index(src.select(col("id"), col("e")), m2, "e")
        .select(col("id"), col("e"), col("ivf_cell").as("cell"))
        .localCheckpoint()
      def clamp(x: Double): Double = math.max(-1.0, math.min(1.0, x))
      val centsLit = array(m2.centroids.map(c => array(c.map(lit): _*)): _*)
      val radii2: Map[Int, Double] = reassigned.filter(col("cell").isNotNull)
        .groupBy("cell")
        .agg(min(cosine_similarity(col("e"),
          element_at(centsLit, col("cell") + 1))).as("mc"))
        .collect().map(r => r.getInt(0) -> math.acos(clamp(r.getDouble(1))))
        .toMap
      val stageModel = s"$indexDir/model.refresh"
      val stageRadii = s"$indexDir/radii.refresh"
      val stageVecs = s"$indexDir/vecs.refresh"
      Seq(stageModel, stageRadii, stageVecs)
        .foreach(p => fs.delete(new Path(p), true))
      saveCentroids(spark, stageModel, m2)
      saveRadii(spark, stageRadii, radii2)
      // preserve the vecs layout: bucketed-by-cell when the catalog table
      // exists (same bucket spec ⇒ the external table's metadata stays
      // valid across the file swap), plain parquet otherwise
      if (spark.catalog.tableExists(vecsTable)) {
        val tmpTable = vecsTable + "_refresh"
        spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
        // repartition by the bucket column first (the promoteToBucketed
        // discipline): without it every input partition writes its own
        // file per bucket and the refreshed layout fragments into up to
        // partitions × buckets small files
        reassigned.repartition(indexBuckets, col("cell"))
          .write.mode("overwrite").format("parquet")
          .option("path", stageVecs)
          .bucketBy(indexBuckets, "cell").sortBy("cell")
          .saveAsTable(tmpTable)
        spark.sql(s"DROP TABLE $tmpTable") // external: the files stay put
      } else reassigned.write.mode("overwrite").parquet(stageVecs)
      // READY marker only after every staged copy is complete; the swaps
      // below (and their crash recovery) are then idempotent
      val marker = new Path(indexDir, IvfRefreshMarker)
      val mo = fs.create(marker, true); mo.close()
      commitIvfRefresh(fs, indexDir)
      // the external table's LOCATION is unchanged but its files are
      // new — drop Spark's cached file listing or the next reader
      // resolves the swapped-out part files (observed FAILED_READ_FILE)
      if (spark.catalog.tableExists(vecsTable))
        spark.sql(s"REFRESH TABLE $vecsTable")
      out(s"$indexDir/ivf.refresh") = (nVecs, nVecs)
    }
    // incremental-cluster state: fold the merge log into labels/ so the
    // read-time remap closure resets to depth zero. labels/ is the SOLE
    // durable copy of every cluster membership ever recorded, so the
    // folded copy is written to a sibling dir and rename-swapped (a plain
    // overwrite deletes-then-writes: a crash mid-write would lose it
    // unrecoverably, unlike clusterAppend whose contract is batch
    // re-send). remaps/ is deleted only after the swap completes — a
    // crash before that point replays the fold idempotently.
    val remapsDir = s"$indexDir/remaps"
    recoverCompactLeftover(fs, s"$indexDir/labels")
    if (indexBytes(fs, remapsDir) > 0 && indexBytes(fs, s"$indexDir/labels") > 0) {
      val before = spark.read.parquet(remapsDir).count()
      val folded = resolvedClusters(spark, indexDir)
        .select(col("id"), col("cluster_id").as("label")).localCheckpoint()
      swapInPlace(fs, s"$indexDir/labels", folded)
      fs.delete(new Path(remapsDir), true)
      out(remapsDir) = (before, 0L)
    }
    out.toMap
  }

  /** Crash-safe in-place rewrite (the promoteToBucketed discipline): the
    * new copy is written COMPLETE to a durable `.compact` sibling while
    * the live files stay put, then swapped in with two metadata ops. At
    * no point is the only durable copy a half-written dir; the window
    * between delete and rename is healed by [[recoverCompactLeftover]]. */
  private def swapInPlace(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, d: DataFrame): Unit = {
    val tmp = new Path(dir + ".compact")
    val dst = new Path(dir)
    fs.delete(tmp, true) // leftovers of an interrupted earlier attempt
    d.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"compaction rename $tmp -> $dir failed")
  }

  /** marker proving every `.refresh`-staged dir of an IVF model refresh
    * is COMPLETE — swaps after it are replayable */
  private val IvfRefreshMarker = "ivf.refresh.READY"

  /** Swap each staged `.refresh` dir into place and drop the marker.
    * Idempotent: a dir whose stage is already gone was swapped by the
    * interrupted run. Only called with the marker present (all stages
    * complete) — under the writer lease. */
  private def commitIvfRefresh(fs: org.apache.hadoop.fs.FileSystem,
      indexDir: String): Unit = {
    Seq("model", "radii", "vecs").foreach { part =>
      val stage = new Path(s"$indexDir/$part.refresh")
      val live = new Path(s"$indexDir/$part")
      if (fs.exists(stage)) {
        fs.delete(live, true)
        if (!fs.rename(stage, live)) throw new java.io.IOException(
          s"IVF refresh rename $stage -> $live failed")
      }
    }
    fs.delete(new Path(indexDir, IvfRefreshMarker), false)
    ()
  }

  /** Heal an interrupted IVF model refresh at lease acquisition: with
    * the READY marker present the staged triple is complete — finish the
    * swaps; without it any leftover stage is an incomplete write — the
    * live triple is authoritative, discard the stages. */
  private def recoverIvfRefresh(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, indexDir: String): Unit = {
    if (fs.exists(new Path(indexDir, IvfRefreshMarker))) {
      commitIvfRefresh(fs, indexDir)
      val vecsTable = indexTableName(indexDir, "vecs")
      if (spark.catalog.tableExists(vecsTable))
        spark.sql(s"REFRESH TABLE $vecsTable")
    } else Seq("model", "radii", "vecs").foreach(p =>
      fs.delete(new Path(s"$indexDir/$p.refresh"), true))
  }

  /** Heal an interrupted [[swapInPlace]]. Only-tmp-exists means the
    * original was already deleted, which only happens AFTER the tmp copy
    * is complete — rename it into place. Both-exist means the crash hit
    * during the tmp write; the original is intact and authoritative
    * (compaction is idempotent), so drop the partial tmp. */
  private def recoverCompactLeftover(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit = {
    val tmp = new Path(dir + ".compact")
    val dst = new Path(dir)
    if (fs.exists(tmp)) {
      if (!fs.exists(dst)) {
        if (!fs.rename(tmp, dst)) throw new java.io.IOException(
          s"compaction recovery rename $tmp -> $dir failed")
      } else fs.delete(tmp, true)
    }
  }

  /** Fresh per-run index dir under java.io.tmpdir (test/query scaffold). */
  def scratchIndexDir(spark: SparkSession, tag: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_dedup_idx/$tag"
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    // the sibling tombstone + re-admission snapshots go with it
    dropGone(spark, dir)
    dropSnap(spark, readdedDir(dir))
    dir
  }
}
