package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftshim.Shims

import graft.functions.functions.{minhash_band_hashes, minhash_signature, simhash64, word_shingles}

/** Deduplication operators for training-data pipelines, each designed so
  * the expensive step is an equi-join/aggregation Spark can shuffle by
  * key — never an all-pairs comparison:
  *
  *  - exact:     hash-groupBy on content
  *  - MinHash:   shingle → k-seed min-hash signature → band hash →
  *               bucket equi-join → exact Jaccard verify on candidates
  *  - SimHash:   64-bit signature → 16-bit sub-band equi-join (any pair
  *               within Hamming distance 3 shares ≥1 of 4 bands) →
  *               Hamming verify
  *  - n-gram Jaccard: inverted-index self-join on shingles (exact, but
  *               only pairs sharing ≥1 shingle are ever materialized)
  *  - embedding: random-hyperplane bucket join + exact cosine verify
  *
  * All signatures are computed by deterministic native expressions
  * (graft.functions) inside whole-stage codegen.
  */
object Dedup {

  // ------------------------------------------------------------- exact

  /** One surviving doc_id per exact content: min(id) per text.
    * Scale note: group key is the content itself so the comparison is
    * exact; Spark hash-partitions on the key, so 100 TB dedups with one
    * shuffle. If typical documents are large, pre-hash to
    * (hash, min_id) and rejoin — same shape, smaller shuffle. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  // ----------------------------------------------------------- shingles

  /** distinct word n-gram shingles per document (native single-pass
    * expression — see graft.functions.WordShingles) */
  def shingles(text: Column, n: Int = 3): Column = word_shingles(text, n)

  // ------------------------------------------------------------ minhash

  /** k-element MinHash signature of a shingle array (native) */
  def minhashSignature(shingleCol: Column, k: Int = 64): Column =
    minhash_signature(shingleCol, k)

  /** Near-duplicate pairs by MinHash+LSH, verified with exact Jaccard
    * over the shingle sets. Returns (id_a, id_b, jaccard), id_a < id_b. */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.7,
      n: Int = 3, k: Int = 64, bands: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0) // sub-n docs have no signature
      .localCheckpoint() // one materialization feeds signature + verify sides
    val sig = sh.withColumn("bands", minhash_band_hashes(col("sh"), k, bands))
    val buckets = sig.select(col("id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    // NOTE a singleton-bucket pre-filter (count ≥2 per (band_idx,
    // band_hash) + AQE-broadcast semi-join before this self-join) was
    // measured NEGATIVE at sf0.1 (r6: minhash 3.3→4.2 s, survivors
    // 5.2→6.1 s): the synthetic corpus is template-shared, so nearly every
    // bucket is multi-occupant and the extra aggregation prunes nothing.
    // On a mostly-unique open-web corpus the filter is the standard win —
    // revisit with a representative corpus before re-adding.
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    verifyJaccardPairs(cand, sh, threshold)
  }

  /** Exact Jaccard for candidate id pairs given (id, sh) shingle sets.
    * |A∪B| = |A|+|B|-|A∩B|, so only the intersection is materialized —
    * array_union would allocate a fresh union array per pair just to
    * take its size (all sizes are integers; the division is the same
    * exact double either way). */
  private[graft] def verifyJaccardPairs(cand: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame =
    verifyJaccardPairsAB(cand, sh, sh, threshold)

  /** Two-sided exact-Jaccard verify: the id_a side and id_b side draw
    * their shingle sets from DIFFERENT tables (incremental near-dup:
    * id_a ∈ durable index, id_b ∈ current batch — joining each side
    * against its own table keeps the bucketed index side exchange-free
    * instead of unioning history into the batch's shuffle). */
  private[graft] def verifyJaccardPairsAB(cand: DataFrame, shA: DataFrame,
      shB: DataFrame, threshold: Double): DataFrame = {
    val a = shA.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = shB.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------------------ simhash

  /** Near-duplicate pairs by 64-bit SimHash: pairs within `maxHamming`
    * bit flips. With 4 sub-bands of 16 bits, any pair with Hamming ≤ 3
    * shares at least one exact band (pigeonhole) — so candidates come
    * from 4 equi-joins, not an all-pairs scan. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming <= 3, "4x16-bit banding guarantees recall only to Hamming 3")
    val sigs = docs.select(col(idCol).as("id"),
      simhash64(split(lower(col(textCol)), "\\s+")).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => Shims.column(org.apache.spark.sql.catalyst.expressions.ShiftRight(
          Shims.expression(col("sig")), Shims.expression((b * lit(16)).cast("int")))).bitwiseAND(lit(0xffffL))))
        .as(Seq("band_idx", "band_val")))
    banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      // Hamming filter BEFORE the dedup shuffle: a pair sharing several
      // bands is emitted once per shared band, but filtering first means
      // the distinct() exchange carries only true near-dup pairs (rare)
      // instead of every banding candidate
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ------------------------------------------------- cluster & survive

  /** Connected components over near-duplicate pairs → one canonical
    * (minimum-id) survivor per cluster.
    *
    * Distributed min-label propagation WITH SHORTCUTTING (pointer
    * doubling): every doc starts labeled with its own id; each round a
    * node takes the min of (its label, its neighbors' labels, the label
    * OF its label). The label-of-label hop halves chain depth every
    * round, giving genuine O(log diameter) convergence — plain
    * single-hop propagation needs O(diameter) rounds. Each round is two
    * equi-joins + one aggregation (all shuffles on id), nothing
    * driver-side, so it holds at corpus scale.
    *
    * Hygiene: every round (and the returned result) is materialized via
    * localCheckpoint, never cache() — checkpoint blocks are released by
    * the ContextCleaner once unreferenced, so repeated calls leave no
    * residue in the shared session's CacheManager.
    *
    * Small-graph fast path (broadcast-join spirit): near-duplicate EDGES
    * are sparse relative to corpus size — most corpora yield a pair set
    * orders of magnitude smaller than the document count. When the
    * deduplicated edge list fits comfortably on the driver
    * (≤ `maxDriverEdges`; the default admits ~262k collected Rows,
    * ~30-40 MB transient with boxing — sized for a modest driver, raise
    * it on a large one), a single
    * collect + union-find replaces O(log diameter) rounds of join JOBS,
    * exactly the size-gated strategy choice a broadcast join makes; the
    * distributed propagation below remains the path for genuinely large
    * edge sets. The count that gates it scans the already-checkpointed
    * edge blocks, not the candidate pipeline. Both paths return
    * identical labels (union always roots at the smaller id, so every
    * root is its component's minimum).
    *
    * @param pairs (id_a, id_b) near-duplicate edges (from minhashPairs /
    *              simhashPairs / ngramJaccardPairs / embedding pairs)
    * @return (id, cluster_id) for every id that appears in a pair;
    *         cluster_id = min id of its component
    */
  def clusters(pairs: DataFrame, maxIters: Int = 8,
      requireConverged: Boolean = false,
      maxDriverEdges: Long = 1L << 18): DataFrame = {
    // LAZY checkpoint throughout this function (optimization r13): every
    // materialization below is fused into the first action that needs it
    // instead of paying a separate eager-checkpoint job — a multi-batch
    // incremental caller runs clusters() per append, so each saved job is
    // a saved scheduler round-trip per batch. Lineage truncation and
    // exactly-once compute are unchanged (lazy localCheckpoint persists
    // on first computation).
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(eager = false)
    val idsAreIntegral = edges.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    if (idsAreIntegral) {
      val spark = pairs.sparkSession
      import spark.implicits._
      import scala.collection.mutable
      def getL(r: org.apache.spark.sql.Row, i: Int): Long = r.get(i) match {
        case l: java.lang.Long => l
        case n: java.lang.Integer => n.toLong
        case other => throw new IllegalStateException(s"non-integral id $other")
      }
      // <= keeps self-pairs (id_a == id_b): the distributed path labels
      // every id in the edge set, including self-edge-only ids — both
      // paths must agree on membership. One limit-gated collect replaces
      // the former count-then-collect pair of jobs: all undirected edges
      // arrive when they fit (limit maxDriverEdges+1 returns everything
      // below the bound), and an overflow row diverts to the distributed
      // path. The gate is now on UNDIRECTED edges (≈ half the former
      // directed-row count) — same order of magnitude, same driver-memory
      // intent, and both paths return identical labels either way.
      val undirected = edges.filter(col("src") <= col("dst"))
        .limit(math.min(maxDriverEdges + 1, Int.MaxValue.toLong).toInt)
        .collect()
      if (undirected.length <= maxDriverEdges) {
        val parent = mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        undirected.foreach { r =>
          val (a, b) = (getL(r, 0), getL(r, 1))
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val ids = undirected.iterator.flatMap(r => Iterator(getL(r, 0), getL(r, 1)))
          .toArray.distinct
        val idType = edges.schema.fields.head.dataType
        return ids.sorted.map(i => (i, find(i))).toSeq.toDF("id", "cluster_id")
          .select(col("id").cast(idType).as("id"),
            col("cluster_id").cast(idType).as("cluster_id"))
      }
    }
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(eager = false)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("label")).as("nlabel"))
      val lmap = labels.select(col("id").as("pid"), col("label").as("plabel"))
      // one-hop neighbor min, then shortcut through the previous round's
      // label map (label-of-label); the changed flag rides in the same
      // projection, so convergence detection is a near-free scan of the
      // materialized round, not a second join job
      val joined = labels.select(col("id"), col("label").as("l0"))
        .join(neighborMin, col("id") === col("id2"), "left")
        .withColumn("l1", least(col("l0"), coalesce(col("nlabel"), col("l0"))))
        .join(lmap, col("l1") === col("pid"), "left")
        .withColumn("l2", least(col("l1"), coalesce(col("plabel"), col("l1"))))
        .select(col("id"), col("l2").as("label"), (col("l2") < col("l0")).as("_chg"))
      // lazy; the convergence probe right below is the materializing
      // action (lineage still truncates every round)
      val updated = joined.localCheckpoint(eager = false)
      val changed = updated.filter(col("_chg")).limit(1).count() > 0
      labels = updated.drop("_chg")
      converged = !changed
      i += 1
    }
    if (!converged) {
      // with shortcutting, maxIters rounds cover components of diameter
      // ~2^maxIters; hitting the bound still means possibly-split clusters
      val msg = s"label propagation did not converge within $maxIters rounds — " +
        "cluster_ids may split extremely deep components (raise maxIters)"
      if (requireConverged) throw new IllegalStateException(msg)
      System.err.println(s"[graft.Dedup.clusters] WARN: $msg")
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Drop all but the canonical doc of every near-duplicate cluster:
    * the end-to-end dedup pipelines chain to (candidate pairs -> clusters
    * -> anti-join). */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val toDrop = clusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(toDrop, Seq(idCol), "left_anti")
  }

  // ----------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard pairs via a PREFIX-FILTERED inverted index.
    *
    * Plain inverted-index joins fan out quadratically on hot shingles (a
    * stopword trigram shared by every doc). Prefix filtering (PPJoin
    * family) fixes that WITHOUT losing recall: order all shingles by
    * (document frequency asc, shingle asc) — a global total order with
    * the rarest first — and index only each doc's first
    * ⌊(1-t)·|sh|⌋+1 shingles under that order. Any pair with
    * Jaccard ≥ t must share at least one prefix shingle (if all shared
    * shingles sat beyond both prefixes, the intersection would be
    * < t/(1+t)·(|A|+|B|), forcing J < t), so candidate generation is
    * exact — and a hot shingle lands at the END of the order, where it
    * is almost never part of a prefix. Candidates are then verified with
    * the true Jaccard over the full shingle sets.
    *
    * Window-free plan: annotate the exploded index with each shingle's
    * df (equi-join on the shingle key), collect each doc's (df, shingle)
    * structs back with one groupBy(id), and take the prefix with
    * sort_array + slice — struct ordering is exactly (df asc, shingle
    * asc), and a per-doc array sort costs |doc| log |doc| inside one
    * task instead of a global window sort. The doc's set size needed for
    * the prefix length is just size(collect_list(...)) — no extra
    * sizes join. Total: 3 shuffles (df count, collect-back, candidate
    * self-join) before the candidate-only verify.
    *
    * Shingles are hashed to int64 (xxhash64) up front: every downstream
    * shuffle/sort/join keys on 8 bytes instead of ~25-byte strings, and
    * the verify intersects long arrays. Jaccard over hashed sets equals
    * Jaccard over the strings unless two distinct shingles of a compared
    * pair collide in 64 bits (~|union|²/2⁶⁴ per pair — negligible), and
    * the hash is deterministic, so results are stable run to run. The
    * prefix order becomes (df asc, hash asc); recall does not depend on
    * the tie-break, only on SOME global total order. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // materialized ONCE (index build + both verify sides read it); a
    // localCheckpoint leaves no CacheManager residue — blocks are freed
    // by the ContextCleaner when the result is no longer referenced
    val sh = docs.select(col(idCol).as("id"),
      transform(shingles(col(textCol), n), s => xxhash64(s)).as("sh"))
      .localCheckpoint()
    val inv = sh.select(col("id"), explode(col("sh")).as("shingle"))
    val df = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
    val prefix = inv.join(df, "shingle")
      .groupBy("id")
      .agg(collect_list(struct(col("df"), col("shingle"))).as("ds"))
      .select(col("id"), size(col("ds")).as("sz"),
        explode(slice(sort_array(col("ds")), lit(1),
          (floor(lit(1.0 - threshold) * size(col("ds"))) + lit(1)).cast("int"))).as("p"))
      // df==1 prefix entries can never produce a candidate: a pair's
      // shared prefix shingle appears in BOTH docs, so df >= 2. On
      // open-web corpora (most shingles unique) this drops the bulk of
      // the rare-first prefix; the df rides in the struct — zero extra
      // jobs either way.
      .filter(col("p.df") >= 2)
      .select(col("id"), col("sz"), col("p.shingle").as("shingle"))
    // length filter (PPJoin family): J(A,B) <= min/max of the set sizes,
    // so J >= t forces min >= t*max — evaluated inside the join so
    // size-incompatible pairs never reach the distinct() exchange or the
    // array-intersect verify (sf0.1: cuts candidates ~28%)
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id") &&
          least(col("x.sz"), col("y.sz")).cast("double") >=
            lit(threshold) * greatest(col("x.sz"), col("y.sz")))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    verifyJaccardPairs(cand, sh, threshold)
  }

  // --------------------------------------------------- fuzzy edit match

  /** Blocked fuzzy nearest neighbor: within each block (a cheap blocking
    * key — source, language, length band…), every document's closest
    * OTHER document by Levenshtein distance over the first `prefixChars`
    * characters. Ties break to the smaller distance, then the smaller
    * neighbor id. Returns (doc_id, match_id, dist).
    *
    * Scale shape: the self-join is an equi-join on the block key, so
    * comparisons are Σ block² — bounded by the blocking discipline the
    * caller chooses, never corpus². The prefix cap bounds each DP to
    * O(prefixChars²) regardless of document length, and the argmin is a
    * plain struct-min aggregate (map-side combinable), not a window. */
  def fuzzyNearest(docs: DataFrame, blockCol: Column, prefixChars: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val p = docs.select(blockCol.as("blk"), col(idCol).as("id"),
      substring(col(textCol), 1, prefixChars).as("pfx"))
    p.as("a").join(p.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("doc_id"),
        levenshtein(col("a.pfx"), col("b.pfx")).as("dist"),
        col("b.id").as("match_id"))
      .groupBy("doc_id")
      .agg(min(struct(col("dist"), col("match_id"))).as("m"))
      .select(col("doc_id"), col("m.match_id").as("match_id"),
        col("m.dist").cast("long").as("dist"))
  }

  // ------------------------------------------------- segment-level dedup

  /** Corpus-level SEGMENT dedup — the CCNet/C4 paragraph-dedup shape,
    * expressed over fixed `segTokens`-token windows because the fixture
    * corpus has no newlines: split each document into non-overlapping
    * segments, keep only the corpus-wide FIRST occurrence of each
    * distinct segment (in (doc_id, seg_idx) order — also removes
    * within-doc repeats), and reassemble the survivors in order.
    * Documents consisting entirely of already-seen segments disappear
    * (the fully-boilerplate case). Returns (doc_id, n_segs_kept,
    * text_dedup).
    *
    * Scale shape: segment → 64-bit content hash up front, so the
    * first-occurrence groupBy and the rejoin shuffle 8-byte keys, never
    * segment text; the rebuild groups by doc_id with a bounded
    * collect_list (≤ segments per doc). Three shuffles total (hash,
    * rejoin, rebuild), each on a key with no corpus-level skew — the
    * hottest hash key is the most-duplicated boilerplate segment, and
    * its group only computes min(doc_id, seg_idx). */
  def segmentDedup(docs: DataFrame, segTokens: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val segs = docs
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.functions.word_chunks(col(textCol),
          segTokens, 0)))
      .select(col("doc_id"), col("pos").cast("long").as("seg_idx"),
        col("col").as("seg"))
    val hashed = segs.withColumn("h",
      graft.functions.functions.seeded_hash64(
        concat(lit("pg:"), col("seg")), lit(0L)))
    val firsts = hashed.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("first"))
    hashed.join(firsts, Seq("h"))
      .filter(col("doc_id") === col("first.doc_id") &&
        col("seg_idx") === col("first.seg_idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          s => s.getField("seg"))).as("text_dedup"))
  }

  // ----------------------------------------------------- duplicate spans

  /** Duplicated token SPANS at ANY alignment — the exact-substring-dedup
    * shape ("Deduplicating Training Data Makes Language Models Better",
    * Lee et al. 2022): a span is reported wherever a `gram`-token window
    * occurs MORE THAN ONCE corpus-wide (across documents or repeated
    * inside one), regardless of where it falls in either document.
    * [[segmentDedup]]'s fixed 32-token blocks miss any duplicate that is
    * not block-aligned; this operator slides a 1-token-stride window, so
    * alignment cannot hide a duplicate — at the cost of one gram per
    * token position instead of one per block.
    *
    * Returns `(doc_id, span_start, span_end)` — maximal merged intervals
    * (token offsets, end exclusive) covering every duplicated window.
    *
    * Scale shape (the suffix-array of the paper is a single-machine
    * design; this is its shuffle-native equivalent):
    *   1. one narrow map stage emits (hash64(window), doc, pos) per
    *      token position — grams never leave the stage as strings;
    *   2. one hash aggregation counts occurrences per 64-bit gram hash
    *      (map-side partial combine absorbs within-partition repeats);
    *   3. a semi join keeps duplicated positions (AQE broadcasts the
    *      duplicated-hash side when small — on a mostly-unique corpus it
    *      is orders of magnitude smaller than the gram stream);
    *   4. interval merging is a per-document window cumsum — skew
    *      bounded by the longest document, no driver participation.
    * A 64-bit hash stands in for the window text; at 10¹² windows the
    * expected number of colliding PAIRS corpus-wide is ~27 (birthday
    * bound), each of which can only over-mark one `gram`-token span —
    * acceptable for corpus hygiene; verify spans exactly before using
    * them for anything destructive at that scale. */
  /** (doc_id, pos, h) — one tagged 64-bit hash per full-length
    * `gram`-token sliding window (1-token stride). Shared by
    * [[duplicateSpans]] and the incremental span index. The native
    * one-pass expression emits hash values bit-identical to
    * `seeded_hash64(concat(lit("dsp:"), windowText), 0)` (the oracle
    * replays that definition) without materializing any window string
    * — the previous WordChunks→concat→hash pipeline was the span
    * family's dominant map cost (pinned equal in DupSpanSpec). */
  private[graft] def gramHashes(docs: DataFrame, gram: Int,
      idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.functions.tagged_window_hashes(
          col(textCol), gram, "dsp:")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("h"))

  /** (doc_id, pos) duplicated positions → maximal merged
    * `[span_start, span_end)` intervals per document: a window cumsum of
    * break flags — adjacent duplicated positions (gap <= gram) extend
    * the island, larger gaps open a new one. */
  private[graft] def mergeSpanIslands(hits: DataFrame, gram: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val isl = hits
      .withColumn("_brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= gram, lit(0L))
          .otherwise(lit(1L))) // first row: NULL comparison -> 1
      .withColumn("_isl", sum(col("_brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    isl.groupBy(col("doc_id"), col("_isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(gram.toLong)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** @param keepFirst false (default): every occurrence of a duplicated
    *        window is a span — the boilerplate-stripping semantics.
    *        true: the lexicographically FIRST (doc_id, pos) occurrence
    *        of each duplicated window is exempt — remove-all-but-one,
    *        the Lee et al. 2022 semantics proper (one copy of each
    *        duplicated run survives a subsequent
    *        [[removeDuplicateSpans]]; a first occurrence can still fall
    *        inside a NEIGHBORING non-first window's span — positional
    *        fine print of sliding windows, documented not hidden). */
  def duplicateSpans(docs: DataFrame, gram: Int = 8,
      idCol: String = "doc_id", textCol: String = "text",
      keepFirst: Boolean = false): DataFrame = {
    require(gram > 0, s"gram=$gram")
    val grams = gramHashes(docs, gram, idCol, textCol)
    val agg = grams.groupBy(col("h")).agg(count(lit(1)).as("_n"),
      min(struct(col("doc_id"), col("pos"))).as("_first"))
    val hits =
      if (!keepFirst)
        grams.join(agg.filter(col("_n") >= 2).select(col("h")),
          Seq("h"), "left_semi")
      else grams.join(agg.filter(col("_n") >= 2), Seq("h"))
        .filter(col("doc_id") =!= col("_first.doc_id") ||
          col("pos") =!= col("_first.pos"))
        .select(col("doc_id"), col("pos"))
    mergeSpanIslands(hits, gram)
  }

  /** Rewrite each document with every duplicated span REMOVED — all
    * occurrences by default (boilerplate stripping), or all-but-the-
    * first with `keepFirst` (one surviving copy of each duplicated run,
    * the Lee et al. 2022 recipe). Returns `(doc_id, clean_text)` for
    * EVERY input document;
    * documents with no duplicated span pass through verbatim, fully
    * duplicated documents come back empty. The span set rides into a
    * per-doc array (islands are disjoint, bounded by doc length) and the
    * rewrite is a per-row token filter — no second shuffle beyond
    * [[duplicateSpans]]'s own. */
  def removeDuplicateSpans(docs: DataFrame, gram: Int = 8,
      idCol: String = "doc_id", textCol: String = "text",
      keepFirst: Boolean = false): DataFrame = {
    val spans = duplicateSpans(docs, gram, idCol, textCol, keepFirst)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("_spans"))
    val emptySpans = array()
      .cast("array<struct<span_start:bigint,span_end:bigint>>")
    docs.select(col(idCol).as("doc_id"), col(textCol).as("_text"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        array_join(
          filter(split(col("_text"), " "), (_, i) =>
            !exists(coalesce(col("_spans"), emptySpans), s =>
              i >= s.getField("span_start") && i < s.getField("span_end"))),
          " ").as("clean_text"))
  }
}
