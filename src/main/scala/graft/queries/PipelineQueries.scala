package graft.queries

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Decontaminate, Dedup, IncrementalDedup, Multimodal, Packing, RangeJoin, Retrieval, Sampling, Similarity, Sketches, TextAnalysis, TextClean}
import graft.sources.Tables

/** LLM-data-pipeline operator inventory: dedup family, similarity search,
  * text analysis, multimodal plumbing, as-of/range joins. Oracles are
  * provided wherever the computation is exactly expressible in DuckDB SQL
  * (integer/string logic, shared double arithmetic); hash-family-based
  * operators (minhash/simhash/LSH) are deterministic but not
  * SQL-expressible, so they get rows-only checks.
  */
object PipelineQueries {
  import Tables._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------ text analysis
    "q_text_stats" -> ((s, d) => {
      val t = col("text")
      documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(t).as("n_tokens"),
        TextAnalysis.bpeTokenCount(t).as("n_tokens_bpe"),
        TextAnalysis.punctCount(t).as("n_punct"),
        round(TextAnalysis.stopwordRatio(t), 6).as("stopword_ratio"),
        TextAnalysis.languageId(t).as("lang_pred"))
    }),
    "q_text_quality" -> ((s, d) => {
      documents(s, d).select(
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    }),
    // cleaning pass: markup strip + control removal + whitespace
    // collapse. The synthetic corpus has no markup, so both engines
    // augment the text with the SAME deterministic HTML/control wrapper
    // before cleaning — the operator is exercised on real constructs.
    "q_text_clean" -> ((s, d) => {
      val aug = concat(lit("<p class=\"body\">"), col("text"),
        lit("</p>\n\t<a href='x'>link</a> \u0007tail  end"))
      documents(s, d).select(
        col("doc_id"), TextClean.cleanCol(aug).as("clean_text"))
    }),
    // PII masking: emails / IPv4 / +international phones, deterministic
    // augmentation as above (doc_id-derived address, phone, and IP)
    "q_text_redact" -> ((s, d) => {
      val id = col("doc_id").cast("string")
      val aug = concat(col("text"), lit(" contact user"), id,
        lit("@example.com or +1 (555) 010-"), lpad(id, 4, "0"),
        lit(" at 10.1."), (col("doc_id") % 256).cast("string"),
        lit(".7 now"))
      documents(s, d).select(
        col("doc_id"), TextClean.redactCol(aug).as("redacted"))
    }),
    // custom 64-bit content hash: deterministic but not SQL-expressible
    "q_text_fingerprint" -> ((s, d) => {
      documents(s, d).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    }),
    // corpus vocabulary: top-100 tokens by frequency — one shuffle keyed
    // on token (map-side combine), TakeOrderedAndProject top-k, total
    // (count desc, token asc) order so ties at the 100th place are
    // deterministic
    "q_text_vocab" -> ((s, d) =>
      TextAnalysis.vocabulary(documents(s, d), topK = 100)),
    // ------------------------------------------ subword tokenizer seam
    // (graft.operators.Tokenizer): the same token-denominated operators
    // under SUBWORD accounting — greedy longest-match against the
    // fixture vocab, oracle replays the segmentation with a recursive
    // CTE over the (few) distinct words
    // per-document subword cost: one codegen-fallback map pass, no
    // piece array materialized (countOnly)
    "q_text_subword" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        graft.operators.SubwordTokenizer(
          graft.operators.SubwordTokenizer.demoVocab)
          .count(col("text")).as("n_subwords"))),
    // corpus piece vocabulary under the subword tokenizer — the
    // q_text_vocab shape with pieces instead of words
    "q_text_vocab_subword" -> ((s, d) =>
      documents(s, d)
        .select(explode(graft.operators.SubwordTokenizer(
          graft.operators.SubwordTokenizer.demoVocab)
          .tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("token"))
        .limit(100)),
    // concat-and-slice packing budgeted in SUBWORD tokens; the vocab is
    // LOADED AS DATA (SubwordTokenizer.fromTable) — the deployment seam
    "q_pack_subword" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val tok = graft.operators.SubwordTokenizer.fromTable(
        graft.operators.SubwordTokenizer.demoVocab.toDF("token"))
      Packing.concatSlicePack(
          documents(s, d).select(col("doc_id"), col("source"),
            tok.count(col("text")).as("n_tokens")),
          col("source"), col("doc_id"), col("n_tokens"), budget = 512)
        .select("doc_id", "source", "n_tokens", "pack_seq", "pack_offset")
    }),
    // word-boundary chunking under a 48-SUBWORD budget (RAG prep with
    // real token budgets): next-fit recurrence per doc, chunk text
    // rebuilt in word order
    "q_text_chunks_budget" -> ((s, d) =>
      TextAnalysis.chunksByTokenBudget(documents(s, d), budget = 48,
        tokenizer = graft.operators.SubwordTokenizer(
          graft.operators.SubwordTokenizer.demoVocab))),
    // the same chunking operator under the BPE currency — one operator,
    // three token accountings, all oracle-checked
    "q_text_chunks_bpe" -> ((s, d) =>
      TextAnalysis.chunksByTokenBudget(documents(s, d), budget = 48,
        tokenizer = graft.operators.BpeTokenizer(
          graft.operators.BpeTokenizer.demoMerges))),
    // BPE proper (merges-table-driven, the third tokenizer face):
    // per-document BPE token cost; merges LOADED AS DATA via fromTable
    "q_text_bpe" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val tok = graft.operators.BpeTokenizer.fromTable(
        graft.operators.BpeTokenizer.demoMerges.zipWithIndex
          .map { case ((a, b), r) => (a, b, r) }.toDF("a", "b", "rank"))
      documents(s, d).select(col("doc_id"),
        tok.count(col("text")).as("n_bpe"))
    }),
    // concat-and-slice packing budgeted in BPE tokens
    "q_pack_bpe" -> ((s, d) =>
      Packing.concatSlicePack(
          documents(s, d).select(col("doc_id"), col("source"),
            graft.operators.BpeTokenizer(
              graft.operators.BpeTokenizer.demoMerges)
              .count(col("text")).as("n_tokens")),
          col("source"), col("doc_id"), col("n_tokens"), budget = 1024)
        .select("doc_id", "source", "n_tokens", "pack_seq", "pack_offset")),
    // byte-level BPE (the FOURTH tokenizer face, GPT-2 vocab family):
    // per-document token cost under a regex pre-tokenizer with no case
    // folding — space bytes ride into the pieces; merges (expressed in
    // the published byte alphabet) loaded AS DATA via fromTable
    "q_text_bpe_bytes" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val tok = graft.operators.BpeBytesTokenizer.fromTable(
        graft.operators.BpeBytesTokenizer.demoMerges.zipWithIndex
          .map { case ((a, b), r) => (a, b, r) }.toDF("a", "b", "rank"))
      documents(s, d).select(col("doc_id"),
        tok.count(col("text")).as("n_bpe_bytes"))
    }),
    // concat-and-slice packing budgeted in byte-level BPE tokens
    "q_pack_bpe_bytes" -> ((s, d) =>
      Packing.concatSlicePack(
          documents(s, d).select(col("doc_id"), col("source"),
            graft.operators.BpeBytesTokenizer(
              graft.operators.BpeBytesTokenizer.demoMerges)
              .count(col("text")).as("n_tokens")),
          col("source"), col("doc_id"), col("n_tokens"), budget = 1024)
        .select("doc_id", "source", "n_tokens", "pack_seq", "pack_offset")),
    // the same chunking operator under the byte-BPE currency (words lose
    // their leading space when split, so each word costs its unprefixed
    // byte tokenization)
    "q_text_chunks_bpe_bytes" -> ((s, d) =>
      TextAnalysis.chunksByTokenBudget(documents(s, d), budget = 48,
        tokenizer = graft.operators.BpeBytesTokenizer(
          graft.operators.BpeBytesTokenizer.demoMerges))),
    // BPE merge TRAINING — the learning half of the tokenizer seam: a
    // distributed pair-count/argmax/merge loop over the distinct-word
    // table learns the ranked merges [[BpeTokenizer.fromTable]] loads.
    // The oracle replays the identical algorithm as 8 unrolled SQL
    // stages (materialized CTEs; left-to-right `replace` over a
    // bracket-delimited symbol string == the trainer's greedy fold).
    "q_text_bpe_train" -> ((s, d) =>
      graft.operators.BpeTrainer.trainDF(documents(s, d), numMerges = 8)),
    // Gopher-style intra-document repetition signals: dup word / bigram /
    // line fractions — pure codegen map stage, zero shuffles
    "q_text_repetition" -> ((s, d) =>
      TextAnalysis.repetitionSignals(documents(s, d))),
    // unigram commonness quality score: integer corpus-count numerator /
    // one exact double division — broadcast vocab join, one doc-keyed
    // shuffle, none on the token stream
    "q_text_commonness" -> ((s, d) =>
      TextAnalysis.commonness(documents(s, d))),
    // unigram LM negative mean log-prob (the CCNet perplexity-filter
    // shape; commonness above is its integer-seam little sibling):
    // token-stream tf + token-keyed model join + 1-row stats broadcast
    "q_text_logprob" -> ((s, d) =>
      TextAnalysis.unigramLogProb(documents(s, d))),
    // per-doc TF-IDF top terms: tf + broadcast df + one doc-keyed window;
    // ranking on the ROUNDED score (token tie-break) so the selected set
    // is reproducible across math libraries
    // winnowing fingerprints (MOSS): per-window rightmost-min hash
    // selection over the 5-gram stream — the sub-document overlap index
    // at ~2/(w+1) the gram stream's size
    "q_text_winnow" -> ((s, d) =>
      TextAnalysis.winnow(documents(s, d), gram = 5, window = 4)),
    "q_text_tfidf" -> ((s, d) =>
      TextAnalysis.tfidfTopTerms(documents(s, d), topK = 3)),
    // the SAME tokenize-once index that serves BM25 also serves TF-IDF
    // keyword extraction (every scoring input derives from the stored
    // tf): two appends + a replayed batch, scored from the index alone
    "q_text_tfidf_incr" -> ((s, d) => {
      import graft.operators.IncrementalText
      val dir = s"${sys.props("java.io.tmpdir")}/graft_qc/" +
        s"${new java.io.File(d).getName}/tfidfidx"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val dd = documents(s, d)
      IncrementalText.bm25Append(s, dir, dd.filter(pmod(col("doc_id"), lit(2)) === 1))
      IncrementalText.bm25Append(s, dir, dd.filter(pmod(col("doc_id"), lit(2)) === 0))
      IncrementalText.bm25Append(s, dir, dd.filter(pmod(col("doc_id"), lit(2)) === 1))
      IncrementalText.tfidfTopTermsFromIndex(s, dir, topK = 2)
    }),
    // BM25 retrieval scoring against a fixed query bag: pinned IEEE op
    // order + fixed-column term sum (never a float sum over row order),
    // TakeOrderedAndProject top-k
    "q_text_bm25" -> ((s, d) =>
      TextAnalysis.bm25(documents(s, d),
        queryTerms = Seq("spark", "hash", "window"), topK = 20)),
    // INCREMENTAL BM25: the corpus arrives in two appends (doc_id mod 3
    // split) into a durable inverted index — each append tokenizes ONLY
    // its batch, a replayed batch is a no-op (novelty anti-join on
    // committed doc ids), and scoring runs from the index alone with the
    // term filter pushed to the token-sorted parquet. The scores are
    // bit-identical to the one-shot q_text_bm25 math (shared scoring
    // core), which is exactly what the oracle replays.
    "q_text_bm25_incr" -> ((s, d) => {
      import graft.operators.IncrementalText
      val dir = s"${sys.props("java.io.tmpdir")}/graft_qc/" +
        s"${new java.io.File(d).getName}/bm25idx"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val dd = documents(s, d)
      IncrementalText.bm25Append(s, dir, dd.filter(pmod(col("doc_id"), lit(3)) =!= 0))
      IncrementalText.bm25Append(s, dir, dd.filter(pmod(col("doc_id"), lit(3)) === 0))
      // replayed first batch: dropped whole by the novelty anti-join
      IncrementalText.bm25Append(s, dir, dd.filter(pmod(col("doc_id"), lit(3)) =!= 0))
      IncrementalText.bm25FromIndex(s, dir,
        queryTerms = Seq("spark", "hash", "window"), topK = 15)
    }),
    // BM25 index MUTATIONS: a third of the corpus first arrives STALE
    // (edited later), the upsert delivers the truth — only the changed
    // third re-tokenizes, its higher-ver postings supersede the stale
    // ones at read time, and the per-batch stats rows absorb the dl
    // delta additively. An editorial delete then tombstones every 7th
    // doc (replayed delete = no-op). The oracle replays one-shot BM25
    // over exactly the LIVE corpus (true text, %7 docs removed) — stale
    // postings leaking into a score, a wrong n_docs/avgdl after the
    // mutation chain, or a resurrected deleted doc all hash-mismatch.
    "q_text_bm25_upsert" -> ((s, d) => {
      import graft.operators.IncrementalText
      val dir = s"${sys.props("java.io.tmpdir")}/graft_qc/" +
        s"${new java.io.File(d).getName}/bm25idx_upsert"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val dd = documents(s, d)
      IncrementalText.bm25Append(s, dir,
        dd.filter(pmod(col("doc_id"), lit(3)) === 0)
          .withColumn("text", concat(lit("stale "), substring(col("text"), 1, 24))))
      IncrementalText.bm25Upsert(s, dir, dd)
      IncrementalText.bm25Delete(s, dir,
        dd.filter(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")))
      // crash replay of the delete: already-dead ids are ignored
      IncrementalText.bm25Delete(s, dir,
        dd.filter(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")))
      IncrementalText.bm25FromIndex(s, dir,
        queryTerms = Seq("spark", "hash", "window"), topK = 15)
    }),
    // count-min sketch frequency estimates for the exact top-20 tokens:
    // constant-width (4×1024-cell) partial state and shuffle regardless
    // of vocabulary size — all-integer output, no rounding anywhere
    "q_freq_cms" -> ((s, d) =>
      Sketches.cmsTopTokenEstimates(documents(s, d), topK = 20)),
    // Misra-Gries heavy hitters over the token stream: 256-counter
    // mergeable summary (state O(k) per partition, shuffle carries one
    // summary per partition — never the vocabulary). Emitted as the
    // envelope check the guarantee makes deterministic: every token with
    // true count > n/(k+1) must be FOUND in the summary with its true
    // count inside the summary's [cnt, ub] bounds; the summary itself is
    // partitioning-dependent, the booleans are not.
    "q_freq_topk" -> ((s, d) => {
      import graft.functions.functions.heavy_hitters
      val k = 256
      val toks = documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      val hh = toks.agg(heavy_hitters(col("token"), k).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("token"), col("e.cnt").as("cnt"),
          col("e.ub").as("ub"))
      val tot = toks.agg(count(lit(1)).as("n"))
      val heavy = toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(tot))
        .filter(col("n_exact") > expr(s"n DIV ${k + 1}"))
      heavy.join(broadcast(hh), Seq("token"), "left")
        .select(col("token"), col("n_exact"),
          col("cnt").isNotNull.as("found"),
          (col("cnt") <= col("n_exact") &&
            col("n_exact") <= col("ub")).as("bound_ok"))
    }),
    // deterministic train/val/test assignment: append-stable content-hash
    // split (exact binary boundaries 0.75 / 0.875 so the oracle's CASE
    // replays bit-identically), zero shuffles
    "q_split_assign" -> ((s, d) =>
      Sampling.splitAssign(
        documents(s, d).select(col("doc_id"), col("source")), col("doc_id"),
        splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))),
    // ------------------------------------------------------------- dedup
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(documents(s, d)).select("doc_id", "text", "n_copies")),
    // corpus-wide segment (paragraph) dedup: 32-token windows, keep the
    // corpus-first occurrence of each distinct segment, reassemble —
    // hash-keyed shuffles only (segment text never crosses the wire)
    "q_dedup_segments" -> ((s, d) =>
      Dedup.segmentDedup(documents(s, d), segTokens = 32)),
    // blocked fuzzy match: nearest other doc by Levenshtein over the
    // first 64 chars, blocked on source — block-bounded quadratic cost
    "q_fuzzy_match" -> ((s, d) =>
      Dedup.fuzzyNearest(documents(s, d), col("source"), prefixChars = 64)),
    // duplicated token spans at ANY alignment (exact-substring-dedup
    // shape): 8-token sliding windows, corpus-wide occurrence count,
    // per-doc interval merge — gram hash agg + semi join + one window
    "q_dedup_spans" -> ((s, d) =>
      Dedup.duplicateSpans(documents(s, d), gram = 8)),
    // the destructive follow-up: every duplicated span stripped from
    // every document (boilerplate-removal semantics), full corpus out
    "q_text_despan" -> ((s, d) =>
      Dedup.removeDuplicateSpans(documents(s, d), gram = 8)),
    // keep-first variant: the lexicographically first occurrence of each
    // duplicated window is exempt (remove-all-but-one — Lee et al. 2022)
    "q_dedup_spans_first" -> ((s, d) =>
      Dedup.duplicateSpans(documents(s, d), gram = 8, keepFirst = true)),
    // the keep-first REWRITE: one copy of each duplicated run survives
    "q_text_despan_first" -> ((s, d) =>
      Dedup.removeDuplicateSpans(documents(s, d), gram = 8,
        keepFirst = true)),
    // incremental exact dedup against the durable fingerprint index:
    // three batches (phase = doc_id mod 3) — batch 0 initializes the
    // index, later batches anti-join it and never rescan the corpus
    "q_dedup_incr" -> ((s, d) => {
      val p = documents(s, d)
        .withColumn("phase", pmod(col("doc_id"), lit(3)))
      val idx = IncrementalDedup.scratchIndexDir(s,
        new java.io.File(d).getName)
      val r0 = IncrementalDedup.indexInit(p.filter(col("phase") === 0), idx)
      val r1 = IncrementalDedup.dedupAppend(s, idx, p.filter(col("phase") === 1))
      val r2 = IncrementalDedup.dedupAppend(s, idx, p.filter(col("phase") === 2))
      r0.unionByName(r1).unionByName(r2).select(col("doc_id"), col("phase"))
    }),
    // exact-dedup index MUTATION: after two phases, the keepers with
    // doc_id % 5 == 0 are REMOVED from the corpus (dedupRemove — an
    // O(removed) tombstone, never an index rewrite), so phase 2's
    // re-occurrences of those contents are NOVEL again with a fresh
    // keeper, while still-covered contents keep deduping. The oracle
    // replays the phase-ordered keeper semantics with the removal in
    // between — a tombstone that failed to bite (phase-2 copy dropped)
    // or leaked (still-covered content re-admitted) hash-mismatches.
    "q_dedup_incr_remove" -> ((s, d) => {
      val p = documents(s, d)
        .withColumn("phase", pmod(col("doc_id"), lit(3)))
      val idx = IncrementalDedup.scratchIndexDir(s,
        "remove_" + new java.io.File(d).getName)
      val r0 = IncrementalDedup.indexInit(p.filter(col("phase") === 0), idx)
      val r1 = IncrementalDedup.dedupAppend(s, idx, p.filter(col("phase") === 1))
      val kept01 = r0.unionByName(r1).localCheckpoint()
      val removed = kept01.filter(pmod(col("doc_id"), lit(5)) === 0)
      IncrementalDedup.dedupRemove(s, idx, removed)
      // replayed removal: already-tombstoned keys no-op
      IncrementalDedup.dedupRemove(s, idx, removed)
      val r2 = IncrementalDedup.dedupAppend(s, idx, p.filter(col("phase") === 2))
      kept01.filter(pmod(col("doc_id"), lit(5)) =!= 0).unionByName(r2)
        .select(col("doc_id"), col("phase"))
    }),
    "q_dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairs(documents(s, d), threshold = 0.5)),
    // incremental NEAR-dup via the durable LSH band index: three
    // append batches; each dedups against all earlier history without
    // rescanning it (drop-if-any-earlier semantics, exact-Jaccard
    // verified against the stored shingle sets)
    "q_dedup_incr_near" -> ((s, d) => {
      val p = documents(s, d)
        .withColumn("phase", pmod(col("doc_id"), lit(3)))
      val idx = IncrementalDedup.scratchIndexDir(s,
        "near_" + new java.io.File(d).getName)
      val parts = (0 to 2).map { ph =>
        IncrementalDedup.nearDedupAppend(s, idx,
          p.filter(col("phase") === ph), threshold = 0.5)
      }
      parts.reduce(_.unionByName(_)).select(col("doc_id"), col("phase"))
    }),
    // near-dup index MUTATION: after phases 0-1, every id with
    // doc_id % 5 == 0 is REMOVED (nearDedupRemove — id-grain tombstones,
    // O(removed), broadcast-subtracted from the index side), so phase
    // 2's near-duplicates of those docs are KEPT (their suppressors are
    // gone) while everything else still dedups drop-if-any-earlier. The
    // oracle replays exact-Jaccard suppression with the removed ids
    // excluded from the suppressor set — a tombstone that failed to
    // bite or leaked hash-mismatches.
    "q_dedup_incr_nearrm" -> ((s, d) => {
      val p = documents(s, d)
        .withColumn("phase", pmod(col("doc_id"), lit(3)))
      val idx = IncrementalDedup.scratchIndexDir(s,
        "nearrm_" + new java.io.File(d).getName)
      val k0 = IncrementalDedup.nearDedupAppend(s, idx,
        p.filter(col("phase") === 0), threshold = 0.5)
      val k1 = IncrementalDedup.nearDedupAppend(s, idx,
        p.filter(col("phase") === 1), threshold = 0.5)
      val r = p.filter(col("phase") <= 1 &&
        pmod(col("doc_id"), lit(5)) === 0).select(col("doc_id"))
      IncrementalDedup.nearDedupRemove(s, idx, r)
      IncrementalDedup.nearDedupRemove(s, idx, r) // replay: no-op
      val k2 = IncrementalDedup.nearDedupAppend(s, idx,
        p.filter(col("phase") === 2), threshold = 0.5)
      k0.unionByName(k1).filter(pmod(col("doc_id"), lit(5)) =!= 0)
        .unionByName(k2).select(col("doc_id"), col("phase"))
    }),
    // incremental duplicate-SPAN detection via the durable gram index:
    // three append batches; each reports spans duplicated within itself
    // or against any earlier batch, without rescanning history
    "q_dedup_incr_spans" -> ((s, d) => {
      val p = documents(s, d)
        .withColumn("phase", pmod(col("doc_id"), lit(3)))
      val idx = IncrementalDedup.scratchIndexDir(s,
        "spans_" + new java.io.File(d).getName)
      val parts = (0 to 2).map { ph =>
        IncrementalDedup.spanDedupAppend(s, idx,
            p.filter(col("phase") === ph), gram = 8)
          .withColumn("phase", lit(ph.toLong))
      }
      parts.reduce(_.unionByName(_))
    }),
    // incremental CLUSTER maintenance: the exact duplicate-pair set is
    // split by arrival phase (an edge arrives when its LATER endpoint's
    // phase does — matching an append-only corpus where a pair is
    // discovered by the batch that completes it); three clusterAppend
    // batches maintain the durable labels + merge log, and the RESOLVED
    // labels must equal connected components over the full pair set —
    // which is what the recursive-CTE oracle computes.
    "q_dedup_incr_clusters" -> ((s, d) => {
      val pairs = Dedup.ngramJaccardPairs(documents(s, d), threshold = 0.5)
        .select(col("id_a"), col("id_b"))
        .withColumn("ph", greatest(pmod(col("id_a"), lit(3)),
          pmod(col("id_b"), lit(3))))
        .localCheckpoint()
      val idx = IncrementalDedup.scratchIndexDir(s,
        "clusters_" + new java.io.File(d).getName)
      (0 to 2).foreach { ph =>
        IncrementalDedup.clusterAppend(s, idx, pairs.filter(col("ph") === ph))
      }
      IncrementalDedup.resolvedClusters(s, idx)
    }),
    // incremental SURVIVOR selection over the durable cluster index:
    // after the three clusterAppend batches, the survivor set (drop
    // every non-canonical cluster member) must equal the one-shot
    // dropNearDuplicates over the full corpus — the q_dedup_survivors
    // oracle verbatim, now answered by one anti-join against the label
    // index instead of recomputing components corpus-wide.
    "q_dedup_incr_survivors" -> ((s, d) => {
      val pairs = Dedup.ngramJaccardPairs(documents(s, d), threshold = 0.5)
        .select(col("id_a"), col("id_b"))
        .withColumn("ph", greatest(pmod(col("id_a"), lit(3)),
          pmod(col("id_b"), lit(3))))
        .localCheckpoint()
      val idx = IncrementalDedup.scratchIndexDir(s,
        "survivors_" + new java.io.File(d).getName)
      (0 to 2).foreach { ph =>
        IncrementalDedup.clusterAppend(s, idx, pairs.filter(col("ph") === ph))
      }
      IncrementalDedup.clusterSurvivors(documents(s, d), idx)
        .select("doc_id", "n_chars")
    }),
    // pretraining prep chain over the NEW ops: strip duplicated spans,
    // gate on the CLEAN token count, concat-and-slice pack what's left —
    // one fused plan (span pipeline + window cumsum), no intermediate
    // materialization
    "q_pipeline_pretrain" -> ((s, d) => {
      val clean = Dedup.removeDuplicateSpans(documents(s, d), gram = 8)
        .join(documents(s, d).select("doc_id", "source"), Seq("doc_id"))
      val tc = clean.select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("clean_text")).cast("long")
            .as("n_tokens"))
        .filter(col("n_tokens") >= 16)
      Packing.concatSlicePack(tc, col("source"), col("doc_id"),
          col("n_tokens"), budget = 512)
        .select("doc_id", "source", "n_tokens", "pack_seq", "pack_offset")
    }),
    // end-to-end near-dup removal: candidate pairs -> connected
    // components -> keep the min-id survivor of every cluster
    "q_dedup_survivors" -> ((s, d) => {
      val docsDF = documents(s, d)
      Dedup.dropNearDuplicates(docsDF,
          Dedup.ngramJaccardPairs(docsDF, threshold = 0.5))
        .select("doc_id", "n_chars")
    }),
    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(documents(s, d), threshold = 0.5)),
    // composed CURATION pipeline — the chain a real training-data run
    // strings together, as ONE declarative plan: exact dedup → quality
    // gate → language bucket → token-budget accounting. One shuffle for
    // the dedup, narrow fused maps for scoring, one partial+final agg;
    // Catalyst pipelines the whole middle into a single codegen stage.
    "q_pipeline_curate" -> ((s, d) => {
      val t = col("text")
      Dedup.exact(documents(s, d)).select(t)
        .select(
          TextAnalysis.languageId(t).as("lang_pred"),
          TextAnalysis.qualityScore(t).as("quality"),
          TextAnalysis.tokenCount(t).cast("long").as("n_tokens"))
        .filter(col("quality") >= 0.7)
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          max(col("quality")).as("max_quality"),
          min(col("n_tokens")).as("min_tokens"))
    }),
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(documents(s, d), maxHamming = 3)),
    // ------------------------------------------- sampling / decontamination
    // reproducible per-stratum quota draw (training-data mixing): at most
    // 10 docs per source, selected by content-hash order — the same set
    // on any cluster size / partitioning
    "q_sample_stratified" -> ((s, d) =>
      Sampling.stratifiedTopN(documents(s, d), col("source"), col("doc_id"),
          n = 10)
        .select("doc_id", "source")),
    // append-stable Bernoulli thinning: zero-shuffle codegen filter; a
    // row's fate depends only on (key, seed)
    "q_sample_bernoulli" -> ((s, d) =>
      Sampling.bernoulli(events(s, d), col("event_id"), fraction = 0.1)
        .select("event_id", "event_type", "value")),
    // budget-driven domain mixture: count agg + broadcast fraction join +
    // zero-shuffle hash draw; weights 4:2:1:1 over four sources, the
    // rest dropped (exact binary fractions so the oracle's doubles match)
    "q_mix_domains" -> ((s, d) =>
      Sampling.mixture(documents(s, d), col("source"), col("doc_id"),
          weights = Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0,
            "src3" -> 1.0),
          budget = 60)
        .select("doc_id", "source")),
    // fractional epoch upsampling: src0 runs 2.5 epochs, src1 0.5,
    // src2 1.25, everything else passes through once; the .5/.25 extra
    // copy is the deterministic content-hash draw
    "q_sample_upsample" -> ((s, d) =>
      Sampling.upsample(documents(s, d), col("source"), col("doc_id"),
          factors = Map("src0" -> 2.5, "src1" -> 0.5, "src2" -> 1.25))
        .select("doc_id", "source", "copy_idx")),
    // temperature-based domain resampling (exponentiated smoothing,
    // alpha = 0.5): per-domain factors DERIVED from observed counts —
    // the order-sensitive Σ n^α rounds each power to 6 dp and sums in
    // DECIMAL so the oracle replays it order-free; one formula
    // downsamples and upsamples via the shared content-hash draw
    "q_mix_temperature" -> ((s, d) =>
      Sampling.temperatureResample(documents(s, d), col("source"),
          col("doc_id"), alpha = 0.5, budget = 10000L)
        .select("doc_id", "source", "copy_idx")),
    // sliding-window token chunking (RAG / embedding prep): 64-token
    // chunks, 16-token overlap — a narrow codegen map stage, no shuffle
    "q_text_chunks" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunks(col("text"), size = 64,
            overlap = 16)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          col("col").as("chunk_text"))),
    // deterministic epoch shuffle: content-hash shard + reproducible
    // within-shard position — one shuffle, the shard writer's own cost
    "q_shuffle_epoch" -> ((s, d) =>
      Sampling.epochShuffle(documents(s, d), col("doc_id"), shards = 8)
        .select("doc_id", "shard", "shard_pos")),
    // concat-and-slice sequence packing: per-source token stream sliced
    // into 1024-token training sequences; each doc labeled with the pack
    // it starts in + its offset — one window shuffle
    "q_pack_sequences" -> ((s, d) =>
      Packing.concatSlicePack(
          documents(s, d).select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens")),
          col("source"), col("doc_id"), col("n_tokens"), budget = 1024)
        .select("doc_id", "source", "pack_seq", "pack_offset")),
    // per-group top-k via the bounded-state aggregate (NOT window
    // row_number): partial state is a k-element heap, the exchange
    // carries <= k rows per partition-group instead of the whole table
    "q_topk_groups" -> ((s, d) =>
      documents(s, d)
        .groupBy(col("source"))
        .agg(graft.functions.functions.top_k(
          struct(col("n_chars").cast("long").as("n_chars"),
            col("doc_id").as("doc_id")), 5).as("top"))
        .select(col("source"), explode(col("top")).as("t"))
        .select(col("source"), col("t.n_chars").as("n_chars"),
          col("t.doc_id").as("doc_id"))),
    // greedy NEXT-FIT packing (no straddling): sequential recurrence per
    // source — one hash exchange + secondary sort + linear pass; the
    // oracle replays the recurrence with a recursive CTE
    "q_pack_greedy" -> ((s, d) =>
      Packing.greedyPack(
          documents(s, d).select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens")),
          col("source"), col("doc_id"), col("n_tokens"), budget = 1024)
        .select("doc_id", "source", "pack_seq", "pack_offset")),
    // eval-set leakage scores: 5% of the corpus plays the benchmark, the
    // rest is scored by shared-shingle overlap
    "q_decontaminate" -> ((s, d) => {
      val all = documents(s, d)
      Decontaminate.contaminationScores(
        all.filter(col("doc_id") % 20 =!= 0),
        all.filter(col("doc_id") % 20 === 0))
    }),
    // robust outlier detection (median/MAD per source): two grouped
    // exact percentiles + broadcast joins back onto the corpus — no
    // corpus-wide sort; every intermediate is an exact double (integer
    // inputs, 0.5-factor interpolation), so the boolean cut is
    // deterministic at any parallelism
    "q_quality_outliers" -> ((s, d) => {
      val x = documents(s, d).select(col("doc_id"), col("source"),
        col("n_chars").cast("double").as("x"))
      val med = x.groupBy("source")
        .agg(percentile(col("x"), lit(0.5)).as("med"))
      val dev = x.join(broadcast(med), "source")
        .withColumn("adev", abs(col("x") - col("med")))
      val mad = dev.groupBy("source")
        .agg(percentile(col("adev"), lit(0.5)).as("mad"))
      dev.join(broadcast(mad), "source")
        .select(col("doc_id"), col("source"),
          col("x").cast("long").as("n_chars"),
          (col("adev") > lit(3.0) * col("mad")).as("is_outlier"))
    }),
    // bloom-prefiltered decontamination: the benchmark shingle set rides
    // as a constant bloom into a map-side might_contain, so clean docs'
    // shingles die before the exchange; the exact refilter join makes
    // the result bit-identical to q_decontaminate (same oracle)
    "q_decontaminate_bloom" -> ((s, d) => {
      val all = documents(s, d)
      Decontaminate.bloomContaminationScores(
        all.filter(col("doc_id") % 20 =!= 0),
        all.filter(col("doc_id") % 20 === 0))
    }),
    // -------------------------------------------------------- similarity
    // JL random projection 64 -> 8 dims: one native MatrixProject node
    // per row (codegen k×d product), zero shuffles; signs are hash-
    // derived so the oracle regenerates the identical matrix
    "q_embed_project" -> ((s, d) =>
      Similarity.randomProject(embeddings(s, d), k = 8)),
    // per-label centroid (class prototypes) in long form: one posexplode
    // + one hash agg keyed (label, dim) — the shuffle carries dims ×
    // labels partials, never whole vectors; decimal sums keep the mean
    // order-independent at any parallelism
    "q_embed_centroids" -> ((s, d) =>
      embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(round(Render.dsumd(col("v").cast("double"), 12) /
          count(lit(1)), 6).as("centroid"))),
    // HYBRID RETRIEVAL: BM25 lexical leg + embedding-cosine semantic leg
    // fused by reciprocal rank (RRF, c=60). Each leg retrieves its own
    // top-50 (ranks over ROUNDED scores with id tie-breaks, so rank
    // order is engine-reproducible); the fusion touches ≤100 rows. The
    // oracle replays both legs and the exact reciprocal arithmetic.
    "q_text_hybrid" -> ((s, d) => {
      val q = embeddings(s, d).filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      Retrieval.hybridTopK(documents(s, d), embeddings(s, d),
        queryTerms = Seq("spark", "hash", "window"), queryVec = q,
        k = 10, perLeg = 50)
    }),
    // BATCHED hybrid retrieval: a TABLE of queries (per-query term bag +
    // query embedding) scored in one pass — per-(doc, token) BM25
    // contributions computed once over the union of terms, per-query
    // totals summed in DECIMAL (order-independent), cosine leg as one
    // broadcast join, RRF per query. The scale face of retrieval: the
    // corpus is tokenized/scanned once no matter how many queries ride.
    "q_text_hybrid_batch" -> ((s, d) => {
      import s.implicits._
      val terms = Seq(
        (0L, Seq("spark", "hash", "window")),
        (100L, Seq("data", "query", "table")),
        (200L, Seq("scan", "filter")),
        (300L, Seq("merge", "sort", "batch")),
        (400L, Seq("join", "key"))).toDF("qid", "terms")
      val qv = embeddings(s, d).filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Retrieval.hybridTopKBatch(documents(s, d), embeddings(s, d),
        terms.join(qv, "qid"), k = 10, perLeg = 20)
    }),
    // INDEX-SERVED batched hybrid — the serving path: the lexical leg
    // reads the durable inverted index built in two appends (+ one
    // replayed batch, a no-op), no query touches document text. The
    // oracle is the SAME SQL as q_text_hybrid_batch: the index path
    // must be bit-identical to the corpus path (shared scoring cores).
    "q_text_hybrid_batch_incr" -> ((s, d) => {
      import s.implicits._
      import graft.operators.IncrementalText
      val dir = s"${sys.props("java.io.tmpdir")}/graft_qc/" +
        s"${new java.io.File(d).getName}/hybatchidx"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val dd = documents(s, d)
      IncrementalText.bm25Append(s, dir, dd.filter(pmod(col("doc_id"), lit(2)) === 1))
      IncrementalText.bm25Append(s, dir, dd.filter(pmod(col("doc_id"), lit(2)) === 0))
      IncrementalText.bm25Append(s, dir, dd.filter(pmod(col("doc_id"), lit(2)) === 1))
      val terms = Seq(
        (0L, Seq("spark", "hash", "window")),
        (100L, Seq("data", "query", "table")),
        (200L, Seq("scan", "filter")),
        (300L, Seq("merge", "sort", "batch")),
        (400L, Seq("join", "key"))).toDF("qid", "terms")
      val qv = embeddings(s, d).filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Retrieval.hybridTopKBatchFromIndex(s, dir, embeddings(s, d),
        terms.join(qv, "qid"), k = 10, perLeg = 20)
    }),
    // MMR DIVERSIFICATION over the batched hybrid candidates: greedy
    // λ·relevance − (1−λ)·max-sim-to-picked per query, one bounded
    // flatMapGroups task per query. Deterministic (every step ties-break
    // on (score, id)) but greedy iteration is not SQL-expressible —
    // rows-only check; the semantics spec lives in RetrievalSpec.
    "q_text_mmr" -> ((s, d) => {
      import s.implicits._
      val terms = Seq(
        (0L, Seq("spark", "hash", "window")),
        (100L, Seq("data", "query", "table")),
        (200L, Seq("scan", "filter")),
        (300L, Seq("merge", "sort", "batch")),
        (400L, Seq("join", "key"))).toDF("qid", "terms")
      val qv = embeddings(s, d).filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cands = Retrieval.hybridTopKBatch(documents(s, d),
        embeddings(s, d), terms.join(qv, "qid"), k = 20, perLeg = 20)
      Retrieval.mmr(cands, embeddings(s, d), k = 5, lambda = 0.7)
        .orderBy("qid", "mmr_rank")
    }),
    // RETRIEVAL EVALUATION: recall@10 / MRR@10 / nDCG@10 of the batched
    // cosine leg against same-cluster labels (embeddings.label — a doc
    // is relevant to a query iff they share the label). DCG terms round
    // to 9 dp and sum in DECIMAL so the metric is aggregation-order-
    // independent; the oracle replays rankings, qrels, and all three
    // metric formulas.
    "q_ann_eval" -> ((s, d) => {
      val e = embeddings(s, d)
      val queries = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlabel"))
      val rankings = Retrieval.cosineLegBatch(e, queries, perLeg = 10)
        .withColumnRenamed("vec_id", "doc_id")
      val labels = queries.select("qid", "qlabel")
        .join(e.select(col("vec_id").as("doc_id"), col("label")),
          col("qlabel") === col("label"))
        .select(col("qid"), col("doc_id"), lit(1.0).as("grade"))
      Retrieval.evaluate(rankings, labels, k = 10)
    }),
    "q_ann_bruteforce" -> ((s, d) => {
      val q = embeddings(s, d).filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      // round(.,4): DuckDB's list_cosine_similarity accumulates in float32,
      // ~1e-8 off the double-precision value
      Similarity.bruteForceTopK(embeddings(s, d), q, k = 10)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
    }),
    "q_ann_lsh" -> ((s, d) => {
      val q = embeddings(s, d).filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      // round(.,4): the oracle's list_cosine_similarity accumulates in
      // float32 (same tolerance as q_ann_ivf/q_ann_pq); bucket membership
      // itself is integer-exact both sides (Rademacher hyperplanes)
      Similarity.lshTopK(embeddings(s, d), q, k = 10,
        probeRadius = 4, planes = 10)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
    }),
    // IVF index with EXACT pruned search: probe cells in centroid-bound
    // order, prune cells that provably can't reach the running k-th
    // cosine — output equals brute force (oracle-checked), cost scales
    // with matching cells on clustered data
    "q_ann_ivf" -> ((s, d) => {
      import graft.operators.IVF
      val emb = embeddings(s, d)
      val model = IVF.fitCached(emb, k = 32, sampleN = 1024, iters = 6)
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      IVF.searchExact(IVF.index(emb, model), model, q, k = 10)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
    }),
    // FILTERED vector search (the metadata-restricted top-k every vector
    // store serves): exact IVF search under `label = 2` (~10% of the
    // corpus). The predicate applies INSIDE each probed cell scan (pushes
    // to the parquet scan next to the cell filter), cells prune against
    // the k-th best FILTERED cosine — still lossless, unfiltered radii
    // upper-bound the filtered subset — and unlike post-filter rerank the
    // result never comes up short of k under a selective predicate
    "q_ann_filtered" -> ((s, d) => {
      import graft.operators.IVF
      val emb = embeddings(s, d)
      val model = IVF.fitCached(emb, k = 32, sampleN = 1024, iters = 6)
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      IVF.searchExact(IVF.index(emb, model), model, q, k = 10,
          pred = Some(col("label") === 2))
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
    }),
    // batched EXACT kNN join (every 400th vector as the query table):
    // two ivf_cell equi-joins + per-query candidate windows, lossless
    // cell-bound pruning — oracle = the full brute-force cross join
    "q_knn_join" -> ((s, d) => {
      import graft.operators.IVF
      val emb = embeddings(s, d)
      val model = IVF.fitCached(emb, k = 32, sampleN = 1024, iters = 6)
      val queries = emb.filter(col("vec_id") % 400 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("q_embedding"))
      IVF.knnJoin(IVF.index(emb, model), model, queries, k = 5)
        .select(col("qid"), col("vec_id"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
    }),
    // product quantization with exact rerank: the ADC scan reads ONLY the
    // 8-byte code column (32x smaller than the embeddings — the memory-
    // bounded path at 100 TB), then the top-256 shortlist is re-scored
    // with exact cosines. Oracle = brute force: verified at sf0.001/0.01/
    // 0.1 that the 256-deep ADC shortlist contains the true top-10, so
    // the reranked result IS the exact top-10 (same empirical-recall
    // argument as the q_dedup_minhash oracle)
    "q_ann_pq" -> ((s, d) => {
      import graft.operators.PQ
      val emb = embeddings(s, d)
      val model = PQ.fit(emb, m = 8, k = 64, sampleN = 1024, iters = 6)
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      PQ.searchADC(PQ.encode(emb, model), model, q, k = 10, rerank = 256,
          original = emb)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
    }),
    // this corpus has a CONTINUOUS cosine tail (pairs at 0.40, 0.45, …,
    // no gap), so no LSH banding can have recall 1 at threshold 0.4 —
    // exact cell-blocked pairing is the only oracle-faithful algorithm
    // (and at selective thresholds its centroid-angle bound prunes blocks)
    "q_embed_neardup" -> ((s, d) =>
      Similarity.exactPairs(embeddings(s, d), threshold = 0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))),
    // incremental EMBEDDING near-dup via the durable IVF-blocked index:
    // three append batches against a model frozen on the first; each
    // dedups against all earlier history exactly (lossless cell-angle
    // pruning with max-merged radii), no corpus rescan
    "q_embed_incr" -> ((s, d) => {
      val p = embeddings(s, d)
        .withColumn("phase", pmod(col("vec_id"), lit(3)))
      val idx = IncrementalDedup.scratchIndexDir(s,
        "embed_" + new java.io.File(d).getName)
      (0 to 2).map { ph =>
        IncrementalDedup.embedDedupAppend(s, idx,
          p.filter(col("phase") === ph), threshold = 0.4)
      }.reduce(_.unionByName(_)).select(col("vec_id"), col("phase"))
    }),
    // -------------------------------------------------- as-of / range join
    "q_asof_join" -> ((s, d) => {
      val ev = events(s, d).select("event_id", "user_id", "ts")
      // right side unique per (key, time): keep the max orderkey per day
      val ord = orders(s, d).groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max("o_orderkey").as("last_orderkey"))
      AsOfJoin.backward(ev, ord,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        payloadCols = Seq("last_orderkey"))
    }),
    // last-touch attribution: every purchase matched to the SAME user's
    // latest click in the preceding hour (as-of backward + tolerance) —
    // single-shuffle union+window plan, no per-pair join blowup
    "q_attribution" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), col("value").as("purchase_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .agg(max("event_id").as("click_id"))
      AsOfJoin.backward(purchases, clicks,
        leftKey = "user_id", rightKey = "c_user",
        leftTime = "ts", rightTime = "c_ts",
        payloadCols = Seq("click_id"),
        toleranceMicros = Some(3600L * 1000000L))
    }),
    "q_range_join" -> ((s, d) => {
      // intervals derived from the same table so they always overlap:
      // each purchase anchors a [ts, ts + 2h) window; count the user's
      // events inside it (the anchor itself included — never empty)
      val ev = events(s, d).select("user_id", "ts")
      val anchors = events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id").as("anchor_id"), col("user_id").as("a_user"),
          col("ts").as("a_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("a_end"))
      RangeJoin.byBucket(
          ev, anchors, col("ts"), col("a_start"), col("a_end"),
          bucketWidthMicros = 3600L * 1000000L)
        .filter(col("user_id") === col("a_user"))
        .groupBy("anchor_id")
        .agg(count(lit(1)).as("n_events"))
    }),
    // -------------------------------------------------------- multimodal
    "q_media_features" -> ((s, d) => {
      Multimodal.decodeFeatures(Multimodal.asMedia(documents(s, d)))
        .toDF().select("doc_id", "mime", "n_bytes", "checksum", "width", "height")
    }),
    // nearest-neighbor resize to a 16x16 thumbnail grid: real resample
    // index arithmetic over the stub decoder's byte-grid pixels, batched
    // per partition like the decode
    "q_media_resize" -> ((s, d) =>
      Multimodal.resize(
        Multimodal.asMedia(documents(s, d)), 16, 16).toDF()),
    "q_media_frames" -> ((s, d) => {
      Multimodal.sampleFrames(Multimodal.asMedia(documents(s, d)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"), sum("frame_bytes").as("total_bytes"))
    }),
    // --------------------------------------------- sketch aggregate (HLL)
    // HLL++ estimate validated against the exact distinct count IN the
    // query: the oracle can't reproduce Spark's registers, so the hashed
    // output carries the exact count (DuckDB-matchable) plus a boolean
    // pinning the estimate within the default-rsd error envelope
    // (rsd 0.05, 3sigma => 15%) — an estimator regression flips the
    // boolean and fails the hash compare
    "q_sketch_distinct" -> ((s, d) => {
      lineitem(s, d).groupBy("l_returnflag")
        .agg(
          count_distinct(col("l_orderkey")).as("n_exact"),
          approx_count_distinct(col("l_orderkey")).as("_est"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("_est").cast("double") - col("n_exact").cast("double"))
            <= col("n_exact").cast("double") * 0.15).as("est_in_bounds"))
    }),
    // KMV distinct sketch: unlike HLL++'s opaque registers, every step is
    // relational algebra over the library's documented hash — the DuckDB
    // oracle recomputes the whole sketch from scratch
    // corpus-vs-corpus overlap without materializing either shingle
    // set: KMV union sketch + in-both fraction -> union/intersection/
    // jaccard estimates, exact below k
    "q_sketch_overlap" -> ((s, d) => {
      val docs = documents(s, d)
      def side(src: String) = docs.filter(col("source") === src)
        .select(explode(Dedup.shingles(col("text"), 3)).as("sh"))
      Sketches.kmvOverlap(side("src0"), side("src1"), col("sh"), k = 256)
    }),
    "q_sketch_kmv" -> ((s, d) =>
      graft.operators.Sketches.kmvDistinct(lineitem(s, d),
        groupBy = Seq("l_returnflag"), key = col("l_orderkey"), k = 256)),
    // ------------------------------------- source/sink round trips (csv/json)
    "q_source_csv" -> ((s, d) => {
      val work = s"${sys.props("java.io.tmpdir")}/graft_src/${new java.io.File(d).getName}/csv"
      events(s, d).select("event_id", "event_type", "value")
        .write.mode("overwrite").option("header", "true").csv(work)
      s.read.option("header", "true")
        .schema("event_id LONG, event_type STRING, value DOUBLE").csv(work)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 4))
            .cast("double") // r3 hash probes: decimal cells hash-mismatch, double green
            .as("sum_value"))
    }),
    // XML round-trip (Spark 4 native source): write a row-tagged doc,
    // read it back with an explicit schema, aggregate — equal to the
    // parquet-source aggregate
    "q_source_xml" -> ((s, d) => {
      val work = s"${sys.props("java.io.tmpdir")}/graft_src/${new java.io.File(d).getName}/xml"
      events(s, d).select("event_id", "event_type", "value")
        .write.mode("overwrite").option("rootTag", "events")
        .option("rowTag", "event").xml(work)
      s.read.option("rowTag", "event")
        .schema("event_id LONG, event_type STRING, value DOUBLE").xml(work)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), min(col("value")).as("min_value"))
    }),
    "q_source_orc" -> ((s, d) => {
      val work = s"${sys.props("java.io.tmpdir")}/graft_src/${new java.io.File(d).getName}/orc"
      lineitem(s, d).select("l_orderkey", "l_returnflag", "l_quantity")
        .write.mode("overwrite").orc(work)
      s.read.orc(work)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
    }),
    // skew-resistant two-stage aggregation over the hottest possible keys
    // (3 values across the whole table) — must equal the plain GROUP BY
    "q_agg_salted" -> ((s, d) => {
      import graft.rewrite.Decompose._
      graft.operators.Salting.saltedAgg(
        lineitem(s, d), keys = Seq(col("l_returnflag")), buckets = 16,
        specs = Seq(
          StateSpec("cnt", count(lit(1)), MSum),
          StateSpec("sum_price",
            sum(col("l_extendedprice")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2))), MSum),
          StateSpec("max_qty", max(col("l_quantity")), MMax)))
        .select(col("l_returnflag"), col("cnt"),
          col("sum_price").cast(
            org.apache.spark.sql.types.DecimalType(38, 2)).as("sum_price"),
          col("max_qty"))
    }),
    // grouping sets: cube over two dimensions
    "q_agg_cube" -> ((s, d) => {
      lineitem(s, d).cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
    }),
    // json scalar functions over the events payload
    "q_scalar_json" -> ((s, d) => {
      events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    }),
    // statistical aggregates (rounded: both engines agree to ~1e-12)
    "q_agg_stats" -> ((s, d) => {
      lineitem(s, d).groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"))
    }),
    // exact interpolated percentiles (sort-based agg family)
    "q_agg_percentile" -> ((s, d) => {
      lineitem(s, d).groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("med_qty"),
          expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
          expr("percentile(l_extendedprice, 0.75)").as("p75_price"))
    }),
    "q_source_json" -> ((s, d) => {
      val work = s"${sys.props("java.io.tmpdir")}/graft_src/${new java.io.File(d).getName}/json"
      events(s, d).select("event_id", "event_type", "value")
        .write.mode("overwrite").json(work)
      s.read.schema("event_id LONG, event_type STRING, value DOUBLE").json(work)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          max(col("value")).as("max_value"))
    })
  )

  // DuckDB mirrors. Doubles appear only where both engines perform the
  // identical IEEE op sequence (single division / same-order small sums).

  /** graft.functions.Hash64 (FNV-1a 64 + splitmix64 avalanche, seed 0)
    * re-expressed over DuckDB HUGEINT mod-2^64 arithmetic. The avalanche
    * multiplications would overflow signed 128-bit, so they split the
    * operand at 2^32: a*K mod 2^64 = (lo(a)*K + (hi(a)*K mod 2^32)<<32)
    * mod 2^64 — every intermediate < 2^97. Documents are pure ASCII, so
    * ord(codepoint) == the UTF-8 byte. */
  private val fnvAvalancheStages: Seq[String] = Seq(
    // raw FNV-1a over bytes (seed 0 ⇒ initial = FNV offset basis)
    """list_reduce(list_prepend(14695981039346656037::HUGEINT,
         list_transform(range(1, length(%IN%)+1),
           i -> ord(substr(%IN%, i, 1))::HUGEINT)),
         (acc, b) -> (xor(acc, b) * 1099511628211::HUGEINT)
           % 18446744073709551616::HUGEINT)""",
    "xor(%IN%, %IN% // 1073741824::HUGEINT)", // h ^= h >>> 30
    """((%IN% % 4294967296::HUGEINT) * 13787848793156543929::HUGEINT
         % 18446744073709551616::HUGEINT
       + ((%IN% // 4294967296::HUGEINT) * 13787848793156543929::HUGEINT
         % 4294967296::HUGEINT) * 4294967296::HUGEINT)
       % 18446744073709551616::HUGEINT""", // h *= 0xbf58476d1ce4e5b9
    "xor(%IN%, %IN% // 134217728::HUGEINT)", // h ^= h >>> 27
    """((%IN% % 4294967296::HUGEINT) * 10723151780598845931::HUGEINT
         % 18446744073709551616::HUGEINT
       + ((%IN% // 4294967296::HUGEINT) * 10723151780598845931::HUGEINT
         % 4294967296::HUGEINT) * 4294967296::HUGEINT)
       % 18446744073709551616::HUGEINT""", // h *= 0x94d049bb133111eb
    "xor(%IN%, %IN% // 2147483648::HUGEINT)") // h ^= h >>> 31

  /** q_freq_cms oracle: re-derives the count-min grid and the top-20
    * estimates from scratch — 4 tagged hash chains over the per-
    * occurrence token stream for the grid, 4 more over the top-20 tokens
    * for the probes, identical positive-mod cell mapping, min over the
    * depth cells. Everything is integer arithmetic. */
  private lazy val cmsOracleSql: String = {
    val depth = 4
    val w = 1024
    def cellify(inner: String, carry: String): String =
      s"""SELECT $carry, ((${toSigned("x5")} % $w) + $w) % $w AS cell
          FROM ($inner) t"""
    val cellCtes = (0 until depth).map { d =>
      s"""c$d AS (${cellify(
        hash64Sql(s"'cms$d:' || token", from = "ne", carry = "token"),
        "token")})"""
    }
    val probeCtes = (0 until depth).map { d =>
      s"""p$d AS (SELECT token, n_exact, $d AS d, cell
          FROM (${cellify(
        hash64Sql(s"'cms$d:' || token", from = "top",
          carry = "token, n_exact"),
        "token, n_exact")}) q)"""
    }
    val cmsUnion = (0 until depth)
      .map(d => s"SELECT $d AS d, cell, count(*) AS cnt FROM c$d GROUP BY cell")
      .mkString("\n  UNION ALL ")
    val probesUnion = (0 until depth)
      .map(d => s"SELECT * FROM p$d").mkString("\n  UNION ALL ")
    s"""WITH toks AS (
         SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
         FROM documents),
       ne AS (SELECT token FROM toks WHERE token <> ''),
       top AS (
         SELECT token, count(*) AS n_exact FROM ne GROUP BY token
         ORDER BY n_exact DESC, token LIMIT 20),
       ${cellCtes.mkString(",\n")},
       cms AS ($cmsUnion),
       ${probeCtes.mkString(",\n")},
       probes AS ($probesUnion)
       SELECT token, n_exact, min(cnt) AS est_count
       FROM probes JOIN cms USING (d, cell)
       GROUP BY token, n_exact
       ORDER BY n_exact DESC, token"""
  }

  /** despan reconstruction tail shared by the strip-all and keep-first
    * rewrites: expand spans to covered positions, keep uncovered tokens,
    * ordered string_agg rebuild ('' when nothing survives) */
  private val despanTail: String =
    """, spans AS (
         SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
         FROM isl GROUP BY doc_id, isl),
       cov AS (
         SELECT DISTINCT doc_id, p
         FROM spans, unnest(range(s, e)) AS v(p)),
       tok AS (
         SELECT doc_id, i, tk[CAST(i AS INT) + 1] AS t
         FROM toks, unnest(range(0, len(tk))) AS u(i)),
       kept AS (
         SELECT tok.doc_id, tok.i, tok.t
         FROM tok LEFT JOIN cov
           ON tok.doc_id = cov.doc_id AND tok.i = cov.p
         WHERE cov.p IS NULL)
       SELECT d.doc_id, coalesce(k.ct, '') AS clean_text
       FROM documents d LEFT JOIN (
         SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS ct
         FROM kept GROUP BY doc_id) k USING (doc_id)"""

  /** Shared CTE prefix for the duplicate-span oracles: 8-token sliding
    * windows per position, 'dsp:'-tagged Hash64 per window, corpus-wide
    * occurrence count, duplicated positions, break-flag/cumsum interval
    * islands (exactly Dedup.duplicateSpans's window arithmetic). `tail`
    * is either the final SELECT or further CTEs + SELECT (leading ",");
    * `hits` overrides the duplicated-position rule (default: every
    * occurrence of a count>=2 window). */
  private def dupSpanSql(tail: String,
      hits: String = """SELECT h.doc_id, h.pos
        FROM h JOIN c USING (x5) WHERE c.n >= 2"""): String =
    s"""WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        g AS (
          SELECT doc_id, s AS pos,
            array_to_string(tk[CAST(s AS INT) + 1 : CAST(s AS INT) + 8],
              ' ') AS gram
          FROM toks, unnest(range(0, len(tk) - 7)) AS u(s)),
        h AS (${hash64Sql("'dsp:' || gram", from = "g",
            carry = "doc_id, pos")}),
        c AS (SELECT x5, count(*) AS n FROM h GROUP BY x5),
        hits AS ($hits),
        m AS (
          SELECT doc_id, pos,
            CASE WHEN pos - lag(pos) OVER
                (PARTITION BY doc_id ORDER BY pos) <= 8
              THEN 0 ELSE 1 END AS brk
          FROM hits),
        isl AS (
          SELECT doc_id, pos,
            CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS isl
          FROM m)
        $tail"""

  /** winnowing oracle: identical 'win:'-tagged Hash64 per 5-token
    * window, per-end min over 4 complete hashes, rightmost argmin via
    * the same explode + equi-join + max(pos), distinct pairs */
  private def winnowSql: String =
    s"""WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        g AS (
          SELECT doc_id, s AS pos,
            array_to_string(tk[CAST(s AS INT) + 1 : CAST(s AS INT) + 5],
              ' ') AS gram
          FROM toks, unnest(range(0, len(tk) - 4)) AS u(s)),
        h AS (${hash64Sql("'win:' || gram", from = "g",
            carry = "doc_id, pos")}),
        hh AS (SELECT doc_id, pos, ${toSigned("x5")} AS h FROM h),
        ends AS (
          SELECT doc_id, pos AS e,
            min(h) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS me,
            count(*) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS cnt
          FROM hh),
        full_w AS (SELECT doc_id, e, me FROM ends WHERE cnt = 4),
        members AS (
          SELECT doc_id, e, me, e - i AS pos
          FROM full_w, unnest(range(0, 4)) AS v(i)),
        sel AS (
          SELECT m.doc_id, m.e, m.me, max(m.pos) AS pos
          FROM members m JOIN hh
            ON m.doc_id = hh.doc_id AND m.pos = hh.pos AND hh.h = m.me
          GROUP BY m.doc_id, m.e, m.me)
        SELECT DISTINCT doc_id, pos, me AS fp_hash FROM sel"""

  /** unsigned-HUGEINT → signed BIGINT two's-complement wrap */
  private def toSigned(in: String): String =
    s"""CAST(CASE WHEN $in >= 9223372036854775808::HUGEINT
        THEN $in - 18446744073709551616::HUGEINT ELSE $in END AS BIGINT)"""

  /** Hash64 of a scalar string expression as chained subqueries
    * (lateral aliases keep each stage's SQL linear-sized); `carry`
    * columns ride along unchanged. */
  private def hash64Sql(textExpr: String, from: String = "documents",
      carry: String = "doc_id"): String = {
    val stages = fnvAvalancheStages.zipWithIndex.map { case (tpl, i) =>
      val in = if (i == 0) textExpr else s"x${i - 1}"
      s"${tpl.replace("%IN%", in)} AS x$i"
    }
    s"SELECT $carry, ${stages.mkString(",\n")} FROM $from"
  }

  /** Shared oracle prelude for the subword-tokenizer family: the fixture
    * vocab as VALUES, every distinct lowercased word of the corpus, and
    * its greedy longest-match segmentation (`seg`, one row per emitted
    * piece) — the graft.functions.SubwordPieces rule replayed as a
    * recursive CTE (the longest matching vocab piece at the cursor is
    * unique, so `ORDER BY len DESC LIMIT 1` is deterministic; the
    * coalesce fallback is the single character). `wtok` is the per-word
    * piece count. */
  private val subwordVocabValues = graft.operators.SubwordTokenizer
    .demoVocab.map(v => s"('$v')").mkString(",")
  private val subwordPrelude: String =
    s"""vocab(tok) AS (VALUES $subwordVocabValues),
       dw AS (
         SELECT doc_id, w FROM (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents) t
         WHERE len(w) > 0),
       seg(w, pos, idx, piece) AS (
         SELECT w, 0, 0, '' FROM (SELECT DISTINCT w FROM dw) t0
         UNION ALL
         SELECT w, pos + len(piece2), idx + 1, piece2 FROM (
           SELECT s.w AS w, s.pos AS pos, s.idx AS idx,
             coalesce((SELECT v.tok FROM vocab v
                       WHERE substr(s.w, s.pos+1, len(v.tok)) = v.tok
                       ORDER BY len(v.tok) DESC LIMIT 1),
                      substr(s.w, s.pos+1, 1)) AS piece2
           FROM seg s WHERE s.pos < len(s.w)) t),
       wtok AS (SELECT w, count(*) AS n FROM seg WHERE idx > 0 GROUP BY 1)"""

  /** Shared oracle prelude for the BPE tokenizer: the fixture merges as
    * ranked VALUES, every distinct lowercased word seeded as its
    * chr(31)-guarded character string, and the pinned inference order
    * (lowest-rank pair present, leftmost occurrence, one merge per
    * recursion step — graft.functions.BpePieces) replayed until no
    * merge applies. `btok` is the per-word final token count. */
  private val bpeMergesValues = graft.operators.BpeTokenizer.demoMerges
    .zipWithIndex.map { case ((a, b), r) => s"('$a','$b',$r)" }.mkString(",")

  private def sqlEsc(x: String): String = x.replace("'", "''")

  /** Byte-level BPE replay, shared with the Scala expression verbatim:
    * the 256-row bytes→unicode alphabet (graft.functions.ByteLevel)
    * keyed by UPPERCASE hex pair, the byte-level fixture merges, and the
    * SAME RE2 pre-token pattern BpeBytesPieces compiles (lookahead-free
    * by design so both engines split identically). Each distinct
    * pre-token's UTF-8 bytes come from hex(encode(w)), map through the
    * alphabet into the chr(31)-guarded seed string, and run the same
    * merge recursion as bpePrelude. `unitsSql` defines bunit(u) — the
    * distinct strings whose total piece cost butok(u, n) reports (whole
    * texts for document costs, bare words for chunk budgets). */
  private val byteMapValues: String = {
    val bc = graft.functions.ByteLevel.byteChar
    (0 until 256).map { b =>
      val hx = f"$b%02X"
      s"('$hx','${sqlEsc(bc(b))}')"
    }.mkString(",")
  }
  private val bpeBytesMergesValues =
    graft.operators.BpeBytesTokenizer.demoMerges.zipWithIndex
      .map { case ((a, b), r) => s"('${sqlEsc(a)}','${sqlEsc(b)}',$r)" }
      .mkString(",")
  private val bpeBytesPattern =
    sqlEsc(graft.functions.BpeBytesPieces.pretokenPattern)
  private def bpeBytesPrelude(unitsSql: String): String =
    s"""bmap(hx, bchar) AS (VALUES $byteMapValues),
       bbmerges(a, b, rank) AS (VALUES $bpeBytesMergesValues),
       bunit(u) AS ($unitsSql),
       bpre AS (
         SELECT u, unnest(regexp_extract_all(u, '$bpeBytesPattern')) AS w
         FROM bunit),
       bpw AS (SELECT DISTINCT w FROM bpre WHERE w <> ''),
       bwb AS (
         SELECT w, i, substr(h, CAST(2*i+1 AS INT), 2) AS hx
         FROM (SELECT w, hex(encode(w)) AS h FROM bpw) t,
              unnest(range(0, len(h)//2)) AS ub(i)),
       bbseed AS (
         SELECT w, chr(31) || string_agg(bchar, chr(31) ORDER BY i)
           || chr(31) AS s
         FROM bwb JOIN bmap USING (hx) GROUP BY w),
       bbpe(w, s, step) AS (
         SELECT w, s, 0 FROM bbseed
         UNION ALL
         SELECT w,
           substr(s, 1, idx-1) || chr(31) || pa || pb || chr(31)
             || substr(s, idx + len(chr(31)||pa||chr(31)||pb||chr(31))),
           step + 1
         FROM (
           SELECT w, s, step,
             (SELECT m.a FROM bbmerges m
              WHERE contains(s, chr(31)||m.a||chr(31)||m.b||chr(31))
              ORDER BY m.rank LIMIT 1) AS pa,
             (SELECT m.b FROM bbmerges m
              WHERE contains(s, chr(31)||m.a||chr(31)||m.b||chr(31))
              ORDER BY m.rank LIMIT 1) AS pb
           FROM bbpe) t
         CROSS JOIN LATERAL (
           SELECT position(chr(31)||pa||chr(31)||pb||chr(31) IN s) AS idx) uu
         WHERE pa IS NOT NULL),
       bptok AS (
         SELECT w, len(list_filter(string_split(s, chr(31)),
           x -> x <> '')) AS n
         FROM (SELECT w, s, row_number() OVER (PARTITION BY w
                 ORDER BY step DESC) AS rn
               FROM bbpe) z
         WHERE rn = 1),
       butok AS (
         SELECT u, sum(n) AS n FROM bpre JOIN bptok USING (w) GROUP BY 1)"""
  private val bpePrelude: String =
    s"""merges(a, b, rank) AS (VALUES $bpeMergesValues),
       dwb AS (
         SELECT doc_id, w FROM (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents) t
         WHERE len(w) > 0),
       bseed AS (
         SELECT w, chr(31) || array_to_string(
           list_transform(range(1, len(w)+1), i -> w[i]), chr(31))
           || chr(31) AS s
         FROM (SELECT DISTINCT w FROM dwb) t0),
       bpe(w, s, step) AS (
         SELECT w, s, 0 FROM bseed
         UNION ALL
         SELECT w,
           substr(s, 1, idx-1) || chr(31) || pa || pb || chr(31)
             || substr(s, idx + len(chr(31)||pa||chr(31)||pb||chr(31))),
           step + 1
         FROM (
           SELECT w, s, step,
             (SELECT m.a FROM merges m
              WHERE contains(s, chr(31)||m.a||chr(31)||m.b||chr(31))
              ORDER BY m.rank LIMIT 1) AS pa,
             (SELECT m.b FROM merges m
              WHERE contains(s, chr(31)||m.a||chr(31)||m.b||chr(31))
              ORDER BY m.rank LIMIT 1) AS pb
           FROM bpe) t
         CROSS JOIN LATERAL (
           SELECT position(chr(31)||pa||chr(31)||pb||chr(31) IN s) AS idx) u
         WHERE pa IS NOT NULL),
       btok AS (
         SELECT w, len(list_filter(string_split(s, chr(31)),
           x -> x <> '')) AS n
         FROM (SELECT w, s, row_number() OVER (PARTITION BY w
                 ORDER BY step DESC) AS rn
               FROM bpe) z
         WHERE rn = 1)"""

  /** The BPE-training oracle, generated for k merges: stage i counts
    * adjacent pairs of the bracket-delimited segmentation, argmaxes with
    * the trainer's exact tie-break, and replace()-applies the merge. */
  private def bpeTrainOracle(k: Int): String = {
    val stages = (0 until k).map { i =>
      s"""pairs_$i AS MATERIALIZED (
           SELECT lst[j] AS a, lst[j + 1] AS b, freq
           FROM (SELECT string_split(trim(seg, '<>'), '><') AS lst, freq
                 FROM seg_$i),
                UNNEST(range(1, len(lst))) AS t(j)
         ),
         best_$i AS MATERIALIZED (
           SELECT a, b FROM pairs_$i GROUP BY a, b
           ORDER BY sum(freq) DESC, a, b LIMIT 1
         ),
         seg_${i + 1} AS MATERIALIZED (
           SELECT replace(seg,
             '<' || (SELECT a FROM best_$i) || '><' ||
               (SELECT b FROM best_$i) || '>',
             '<' || (SELECT a || b FROM best_$i) || '>') AS seg, freq
           FROM seg_$i
         )"""
    }
    val union = (0 until k)
      .map(i => s"SELECT $i AS rank, a, b FROM best_$i")
      .mkString(" UNION ALL ")
    s"""WITH words0 AS MATERIALIZED (
         SELECT w AS word, count(*) AS freq FROM (
           SELECT unnest(string_split(text, ' ')) AS w FROM documents) s
         WHERE w <> '' GROUP BY 1
       ),
       -- the '<sym>' segmentation below is only faithful while no word
       -- contains a literal bracket; a corpus change that introduces one
       -- must fail LOUDLY here, not hash-mismatch mysteriously (the
       -- trainer operates on raw characters and would diverge silently)
       guard AS MATERIALIZED (
         SELECT CASE WHEN count(*) > 0 THEN error(
           'bpe oracle: corpus words contain literal < or > - ' ||
           'the bracket-delimited segmentation is unsound here')
           ELSE 0 END AS ok
         FROM words0 WHERE word LIKE '%<%' OR word LIKE '%>%'
       ),
       seg_0 AS MATERIALIZED (
         SELECT regexp_replace(word, '(.)', '<\\1>', 'g') AS seg, freq
         FROM words0, guard
       ),${stages.mkString(",")}
       $union"""
  }

  val oracle: Map[String, String] = Map(
    // PQ + 256-deep exact rerank returns exactly the brute-force top-k
    // on this corpus (shortlist ⊇ true top-10 verified at every SF)
    // centroid replay: identical float→double→DECIMAL(18,12) per-element
    // staging, exact decimal sum, one double division + round — the
    // established order-independent float seam
    "q_embed_centroids" ->
      """SELECT label, CAST(i AS INT) AS dim,
           round(CAST(sum(CAST(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
               AS DECIMAL(18,12))) AS DOUBLE) / count(*), 6) AS centroid
         FROM embeddings, unnest(range(0, len(embedding))) AS u(i)
         GROUP BY 1, 2""",
    "q_ann_pq" ->
"""SELECT vec_id,
           round(CAST(list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS cosine
         FROM embeddings
         ORDER BY list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
           vec_id ASC
         LIMIT 10""",
    // exact pruned IVF search returns exactly the brute-force top-k
    "q_ann_ivf" ->
      """SELECT vec_id,
           round(CAST(list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS cosine
         FROM embeddings
         ORDER BY list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
           vec_id ASC
         LIMIT 10""",
    "q_ann_filtered" ->
      """SELECT vec_id,
           round(CAST(list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS cosine
         FROM embeddings
         WHERE label = 2
         ORDER BY list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
           vec_id ASC
         LIMIT 10""",
    // LSH probe replayed from scratch: the Rademacher hyperplane matrix
    // is regenerated as ±1 LITERALS (Similarity.hyperplanes is hash-
    // derived, not JVM-random), each vector's sign-bit bucket recomputed
    // with the identical ascending-index double fold, the Hamming-radius
    // filter applied with integer bit ops, then cosine top-10 — bucket
    // membership is integer-exact, so this checks the probe SET, not
    // just rows-nonzero
    "q_ann_lsh" -> {
      val hp = graft.operators.Similarity.hyperplanes(
        dim = 64, planes = 10, seed = 42L)
      def dot(vec: String, plane: Array[Double]): String = {
        val lst = plane.map(s => if (s < 0) "-1.0" else "1.0")
          .mkString("[", ", ", "]")
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, 65),
               i -> CAST($vec[i] AS DOUBLE) * ($lst)[i])),
             (acc, v) -> acc + v)"""
      }
      def bucket(vec: String): String =
        hp.zipWithIndex.map { case (plane, p) =>
          s"(CASE WHEN ${dot(vec, plane)} >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        }.mkString("(", "\n + ", ")")
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           b AS (SELECT e.vec_id, e.embedding, q.qe,
                   ${bucket("e.embedding")} AS bkt,
                   ${bucket("q.qe")} AS qbkt
                 FROM embeddings e, q)
         SELECT vec_id,
           round(CAST(list_cosine_similarity(embedding, qe) AS DOUBLE), 4) AS cosine
         FROM b
         WHERE bit_count(xor(bkt, qbkt)) <= 4
         ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id
         LIMIT 10"""
    },
    // exact kNN join oracle: the full brute-force cross join — the
    // cell-pruned two-phase join must return exactly this
    "q_knn_join" ->
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS q_embedding
           FROM embeddings WHERE vec_id % 400 = 0),
         scored AS (
           SELECT q.qid, e.vec_id,
             list_cosine_similarity(e.embedding, q.q_embedding) AS c
           FROM q, embeddings e)
         SELECT qid, vec_id, round(CAST(c AS DOUBLE), 4) AS cosine,
           CAST(rank AS INTEGER) AS rank
         FROM (
           SELECT qid, vec_id, c, row_number() OVER (
             PARTITION BY qid ORDER BY c DESC, vec_id) AS rank
           FROM scored) r
         WHERE rank <= 5""",
    "q_text_fingerprint" ->
      s"""SELECT doc_id, ${toSigned("x5")} AS fingerprint
          FROM (${hash64Sql("text")}) t""",
    // stratified quota draw recomputed from scratch: staged Hash64 of the
    // id, per-stratum row_number over (signed hash, id), keep rn <= 10
    "q_sample_stratified" ->
      s"""WITH hashed AS (
            SELECT doc_id, source, ${toSigned("x5")} AS h
            FROM (${hash64Sql("'st:' || CAST(doc_id AS VARCHAR)",
              carry = "doc_id, source")}) t),
          ranked AS (
            SELECT doc_id, source,
              row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
            FROM hashed)
          SELECT doc_id, source FROM ranked WHERE rn <= 10""",
    // Bernoulli keep-filter with the identical IEEE normalization
    // (constants are powers of two — exact in both engines)
    "q_sample_bernoulli" ->
      s"""SELECT event_id, event_type, value
          FROM (
            SELECT event_id, event_type, value, ${toSigned("x5")} AS h
            FROM (${hash64Sql("'be:' || CAST(event_id AS VARCHAR)",
              from = "events",
              carry = "event_id, event_type, value")}) t)
          WHERE (CAST(h AS DOUBLE) + 9223372036854775808.0)
                / 18446744073709551616.0 < 0.1""",
    // domain mixture: identical IEEE op order ((budget·w)/n, weights
    // pre-normalized to exact binary fractions) ⇒ bit-equal kept set
    "q_mix_domains" ->
      s"""WITH hashed AS (
            SELECT doc_id, source, ${toSigned("x5")} AS h
            FROM (${hash64Sql("'mx:' || CAST(doc_id AS VARCHAR)",
              carry = "doc_id, source")}) t),
          fracs AS (
            SELECT source AS dmn,
              least(1.0, (60.0 * w) / CAST(count(*) AS DOUBLE)) AS f
            FROM documents
            JOIN (VALUES ('src0', 0.5), ('src1', 0.25),
              ('src2', 0.125), ('src3', 0.125)) AS wt(wd, w)
              ON source = wd
            GROUP BY source, w)
          SELECT doc_id, source
          FROM hashed JOIN fracs ON source = dmn
          WHERE f >= 1.0 OR (CAST(h AS DOUBLE) + 9223372036854775808.0)
                / 18446744073709551616.0 < f""",
    // fractional upsampling: floor(f) copies + one more iff the unit
    // hash falls under frac(f); unlisted sources default to f = 1.0
    "q_sample_upsample" ->
      s"""WITH hashed AS (
            SELECT doc_id, source, ${toSigned("x5")} AS h
            FROM (${hash64Sql("'up:' || CAST(doc_id AS VARCHAR)",
              carry = "doc_id, source")}) t),
          n_tbl AS (
            SELECT doc_id, source,
              CAST(floor(ff) AS BIGINT) +
              CASE WHEN (CAST(h AS DOUBLE) + 9223372036854775808.0)
                        / 18446744073709551616.0 < ff - floor(ff)
                   THEN 1 ELSE 0 END AS n
            FROM (SELECT doc_id, source, h, coalesce(w, 1.0) AS ff
                  FROM hashed LEFT JOIN (VALUES ('src0', 2.5),
                    ('src1', 0.5), ('src2', 1.25)) AS wt(wd, w)
                    ON source = wd) u)
          SELECT doc_id, source,
            unnest(generate_series(0, n - 1)) AS copy_idx
          FROM n_tbl WHERE n > 0""",
    // temperature resampling: counts → 6-dp-rounded powers summed in
    // DECIMAL (order-free) → fixed-op-order double factors → the same
    // unit-hash copy draw as upsample ⇒ bit-equal realized mixture
    "q_mix_temperature" ->
      s"""WITH cnts AS (
            SELECT source AS dom, count(*) AS n FROM documents GROUP BY 1),
          w AS (
            SELECT dom, n,
              CAST(round(pow(CAST(n AS DOUBLE), 0.5), 6) AS DECIMAL(38,6))
                AS w
            FROM cnts),
          tot AS (SELECT sum(w) AS wsum FROM w),
          fac AS (
            SELECT dom, n,
              10000.0 * (CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE))
                / CAST(n AS DOUBLE) AS f
            FROM w CROSS JOIN tot),
          hashed AS (
            SELECT doc_id, source, ${toSigned("x5")} AS h
            FROM (${hash64Sql("'tr:' || CAST(doc_id AS VARCHAR)",
              carry = "doc_id, source")}) t),
          n_tbl AS (
            SELECT doc_id, source,
              CAST(floor(f) AS BIGINT) +
              CASE WHEN (CAST(h AS DOUBLE) + 9223372036854775808.0)
                        / 18446744073709551616.0 < f - floor(f)
                   THEN 1 ELSE 0 END AS nn
            FROM hashed JOIN fac ON source = dom)
          SELECT doc_id, source,
            unnest(generate_series(0, nn - 1)) AS copy_idx
          FROM n_tbl WHERE nn > 0""",
    // train/val/test assignment: identical unit-hash normalization and
    // the same 0.75 / 0.875 boundary literals (exact binary, and the
    // 0.75 + 0.125 cumulative sum is exact in IEEE) ⇒ bit-equal splits
    "q_split_assign" ->
      s"""SELECT doc_id, source,
            CASE WHEN u < 0.75 THEN 'train'
                 WHEN u < 0.875 THEN 'val'
                 ELSE 'test' END AS split
          FROM (
            SELECT doc_id, source,
              (CAST(${toSigned("x5")} AS DOUBLE) + 9223372036854775808.0)
                / 18446744073709551616.0 AS u
            FROM (${hash64Sql("'sp:' || CAST(doc_id AS VARCHAR)",
              carry = "doc_id, source")}) t) v""",
    // token chunking: identical start set (range exclusive-stop == Spark
    // sequence inclusive n-1) and identical inclusive slice bounds
    "q_text_chunks" ->
      """SELECT doc_id, s // 48 AS chunk_idx,
           array_to_string(toks[s+1 : s+64], ' ') AS chunk_text
         FROM (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents) t,
           unnest(range(0, greatest(len(toks), 1), 48)) AS u(s)""",
    // epoch shuffle: positive mod of the signed hash + dense rank within
    // the shard by (hash, key) — exact integer arithmetic both sides
    "q_shuffle_epoch" ->
      s"""WITH hashed AS (
            SELECT doc_id, ${toSigned("x5")} AS h
            FROM (${hash64Sql("'sh:' || CAST(doc_id AS VARCHAR)")}) t)
          SELECT doc_id, ((h % 8) + 8) % 8 AS shard,
            row_number() OVER (PARTITION BY ((h % 8) + 8) % 8
              ORDER BY h, doc_id) - 1 AS shard_pos
          FROM hashed""",
    // concat-and-slice packing: exclusive running token sum per source,
    // intdiv/mod by the budget. DuckDB's windowed sum(BIGINT) is HUGEINT
    // (r6 hash mismatch: HUGEINT renders as float64 downstream while
    // Spark emits int64) — CAST the running sum back to BIGINT before
    // the divide so both sides are int64 end to end.
    "q_pack_sequences" ->
      """SELECT doc_id, source,
           before // 1024 AS pack_seq,
           before % 1024 AS pack_offset
         FROM (
           SELECT doc_id, source,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS before
           FROM (SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents) t) u""",
    // grouped top-k: the window form IS the oracle — the bounded
    // aggregate must return exactly what row_number <= k keeps, with
    // the (n_chars, doc_id) struct ordering as the total tiebreak
    "q_topk_groups" ->
      """SELECT source, n_chars, doc_id FROM (
           SELECT source, CAST(n_chars AS BIGINT) AS n_chars, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id DESC) AS rn
           FROM documents) t
         WHERE rn <= 5""",
    // next-fit packing replayed as the literal recurrence: rows ordered
    // per source, state (pack, offset) carried row to row by a recursive
    // CTE — exact integer arithmetic, BIGINT end to end
    "q_pack_greedy" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           FROM documents),
         rec AS (
           SELECT source, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS pack_seq, CAST(0 AS BIGINT) AS pack_offset
           FROM t WHERE rn = 1
           UNION ALL
           SELECT t.source, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN rec.pack_offset + rec.n_tokens + t.n_tokens <= 1024
                  THEN rec.pack_seq ELSE rec.pack_seq + 1 END,
             CASE WHEN rec.pack_offset + rec.n_tokens + t.n_tokens <= 1024
                  THEN rec.pack_offset + rec.n_tokens ELSE CAST(0 AS BIGINT) END
           FROM rec JOIN t ON t.source = rec.source AND t.rn = rec.rn + 1)
         SELECT doc_id, source, pack_seq, pack_offset FROM rec""",
    // contamination scores over raw string shingles — the Spark side
    // joins on xxhash64(shingle) (8-byte keys), which is count-identical
    // unless two distinct shingles collide in 64 bits (see
    // Decontaminate.scala; q_dedup_ngram relies on the same argument)
    "q_decontaminate" ->
      """WITH bench AS (
           SELECT DISTINCT unnest(list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' ')))) AS s
           FROM documents WHERE doc_id % 20 = 0),
         docsh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' '))) AS sh
           FROM documents WHERE doc_id % 20 <> 0),
         inv AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s FROM docsh)
         SELECT doc_id, count(*) AS n_shared,
           CAST(n_shingles AS INTEGER) AS n_shingles,
           round(CAST(count(*) AS DOUBLE) / n_shingles, 6) AS contamination
         FROM inv JOIN bench USING (s)
         GROUP BY doc_id, n_shingles""",
    // median/MAD replay: quantile_cont == Spark's Percentile on these
    // integer-derived inputs (both interpolations are exact-double
    // 0.5-factor arithmetic, so the values are bit-identical and the
    // outlier boolean can't flip on a ULP)
    "q_quality_outliers" ->
      """WITH med AS (
           SELECT source, quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
           FROM documents GROUP BY 1),
         dev AS (
           SELECT doc_id, d.source, CAST(n_chars AS DOUBLE) AS x,
             abs(CAST(n_chars AS DOUBLE) - med) AS adev
           FROM documents d JOIN med USING (source)),
         mad AS (
           SELECT source, quantile_cont(adev, 0.5) AS mad
           FROM dev GROUP BY 1)
         SELECT doc_id, dev.source, CAST(x AS BIGINT) AS n_chars,
           adev > 3.0 * mad AS is_outlier
         FROM dev JOIN mad USING (source)""",
    // identical oracle: the bloom path is lossless by construction
    "q_decontaminate_bloom" ->
      """WITH bench AS (
           SELECT DISTINCT unnest(list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' ')))) AS s
           FROM documents WHERE doc_id % 20 = 0),
         docsh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' '))) AS sh
           FROM documents WHERE doc_id % 20 <> 0),
         inv AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s FROM docsh)
         SELECT doc_id, count(*) AS n_shared,
           CAST(n_shingles AS INTEGER) AS n_shingles,
           round(CAST(count(*) AS DOUBLE) / n_shingles, 6) AS contamination
         FROM inv JOIN bench USING (s)
         GROUP BY doc_id, n_shingles""",
    // exact distinct per group must match, and the HLL++ estimate must
    // sit inside its documented envelope (the Spark side computes the
    // boolean; the oracle demands TRUE) — leaves rows-only-check land
    // while staying honest about what an external engine can replay
    "q_sketch_distinct" ->
      """SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
           TRUE AS est_in_bounds
         FROM lineitem GROUP BY 1""",
    // KMV recomputed from scratch: distinct (flag, key) -> staged Hash64
    // -> per-flag k smallest -> (k-1)/u_k with the identical IEEE op
    // sequence as the Spark side (all scaling constants are powers of 2)
    // overlap replay: identical per-side distinct shingles, identical
    // seeded hash, k smallest union hashes with in-a/in-b flags, and
    // the same IEEE op order for the three estimates
    "q_sketch_overlap" ->
      s"""WITH sa AS (
            SELECT DISTINCT unnest(list_distinct(list_transform(
              range(len(string_split(lower(text),' ')) - 2),
              i -> array_to_string(string_split(lower(text),' ')[i+1:i+3],
                ' ')))) AS sh
            FROM documents WHERE source = 'src0'),
          sb AS (
            SELECT DISTINCT unnest(list_distinct(list_transform(
              range(len(string_split(lower(text),' ')) - 2),
              i -> array_to_string(string_split(lower(text),' ')[i+1:i+3],
                ' ')))) AS sh
            FROM documents WHERE source = 'src1'),
          ha AS (SELECT ${toSigned("x5")} AS h
                 FROM (${hash64Sql("sh", from = "sa", carry = "sh")}) t),
          hb AS (SELECT ${toSigned("x5")} AS h
                 FROM (${hash64Sql("sh", from = "sb", carry = "sh")}) t),
          u AS (
            SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
              SELECT h, 1 AS in_a, 0 AS in_b FROM ha
              UNION ALL SELECT h, 0, 1 FROM hb) z GROUP BY h),
          top AS (SELECT * FROM u ORDER BY h LIMIT 256)
          SELECT count(*) AS n_kmv,
            CAST(coalesce(sum(in_a * in_b), 0) AS BIGINT) AS n_both,
            round(CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
              ELSE 255.0 / ((CAST(max(h) AS DOUBLE)
                + 9223372036854775808.0) / 18446744073709551616.0)
              END, 4) AS est_union,
            round(CAST(sum(in_a * in_b) AS DOUBLE)
                / CAST(count(*) AS DOUBLE)
              * (CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                 ELSE 255.0 / ((CAST(max(h) AS DOUBLE)
                   + 9223372036854775808.0) / 18446744073709551616.0)
                 END), 4) AS est_intersection,
            round(CAST(sum(in_a * in_b) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 4) AS est_jaccard
          FROM top""",
    "q_sketch_kmv" ->
      s"""WITH hashed AS (
            SELECT g, ${toSigned("x5")} AS h
            FROM (${hash64Sql("t",
              from = """(SELECT DISTINCT l_returnflag AS g,
                 CAST(l_orderkey AS VARCHAR) AS t FROM lineitem)""",
              carry = "g")}) s),
          ranked AS (
            SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
            FROM hashed)
          SELECT g AS l_returnflag, count(*) AS n_kmv,
            CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                 ELSE round(255.0 / ((CAST(max(h) AS DOUBLE)
                     + 9223372036854775808.0) / 18446744073709551616.0), 4)
            END AS est_distinct
          FROM ranked WHERE rn <= 256 GROUP BY g""",
    // SimHash recomputed from scratch: per-token Hash64 (staged list
    // transforms), 64 majority-vote bits, then ALL-PAIRS Hamming ≤ 3 —
    // the Spark side's 16-bit band join is candidate generation only and
    // is lossless to Hamming 3 by pigeonhole, so the result sets match.
    "q_dedup_simhash" ->
      """WITH toks AS (
           SELECT doc_id AS id, string_split_regex(lower(text), '\s+') AS ts
           FROM documents),
         h0 AS (SELECT id, list_transform(ts, t ->
             list_reduce(list_prepend(14695981039346656037::HUGEINT,
               list_transform(range(1, length(t)+1),
                 i -> ord(substr(t, i, 1))::HUGEINT)),
               (acc, b) -> (xor(acc, b) * 1099511628211::HUGEINT)
                 % 18446744073709551616::HUGEINT)) AS hs
           FROM toks),
         h1 AS (SELECT id, list_transform(hs,
             h -> xor(h, h // 1073741824::HUGEINT)) AS hs FROM h0),
         h2 AS (SELECT id, list_transform(hs, h ->
             ((h % 4294967296::HUGEINT) * 13787848793156543929::HUGEINT
                % 18446744073709551616::HUGEINT
              + ((h // 4294967296::HUGEINT) * 13787848793156543929::HUGEINT
                % 4294967296::HUGEINT) * 4294967296::HUGEINT)
              % 18446744073709551616::HUGEINT) AS hs FROM h1),
         h3 AS (SELECT id, list_transform(hs,
             h -> xor(h, h // 134217728::HUGEINT)) AS hs FROM h2),
         h4 AS (SELECT id, list_transform(hs, h ->
             ((h % 4294967296::HUGEINT) * 10723151780598845931::HUGEINT
                % 18446744073709551616::HUGEINT
              + ((h // 4294967296::HUGEINT) * 10723151780598845931::HUGEINT
                % 4294967296::HUGEINT) * 4294967296::HUGEINT)
              % 18446744073709551616::HUGEINT) AS hs FROM h3),
         h5 AS (SELECT id, list_transform(hs,
             h -> xor(h, h // 2147483648::HUGEINT)) AS hs FROM h4),
         sigs AS (
           SELECT id,
             CAST(CASE WHEN sig >= 9223372036854775808::HUGEINT
               THEN sig - 18446744073709551616::HUGEINT ELSE sig END AS BIGINT) AS sig
           FROM (
             SELECT id, list_sum(list_transform(range(0, 64), b -> CASE
                 WHEN 2 * len(list_filter(hs, h -> (h // (1::HUGEINT << b)) % 2 = 1))
                      > len(hs)
                 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)) AS sig
             FROM h5) t)
         SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
         FROM sigs a JOIN sigs b ON a.id < b.id
         WHERE bit_count(xor(a.sig, b.sig)) <= 3""",
    // same deterministic augmentation as the Spark side (chr(10)=\n,
    // chr(9)=\t, chr(7)=BEL), then the three portable regex passes
    "q_text_clean" ->
      """SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
           '<p class="body">' || text || '</p>' || chr(10) || chr(9) ||
             '<a href=''x''>link</a> ' || chr(7) || 'tail  end',
           '<[^>]*>', ' ', 'g'),
           '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'),
           '[ \t\r\n]+', ' ', 'g')) AS clean_text
         FROM documents""",
    "q_text_redact" ->
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
           text || ' contact user' || CAST(doc_id AS VARCHAR) ||
             '@example.com or +1 (555) 010-' ||
             lpad(CAST(doc_id AS VARCHAR), 4, '0') ||
             ' at 10.1.' || CAST(doc_id % 256 AS VARCHAR) || '.7 now',
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
           '\+[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g') AS redacted
         FROM documents""",
    "q_text_stats" ->
      """SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(string_split_regex(text, '\s+'))
             + length(regexp_replace(text, '[^.,!?;:''\"]', '', 'g'))
             AS INTEGER) AS n_tokens_bpe,
           CAST(length(regexp_replace(text, '[^.,!?;:''\"]', '', 'g')) AS INTEGER) AS n_punct,
           round(CASE WHEN len(toks) > 0
             THEN CAST(len(list_filter(toks,
               t -> t IN ('the','a','an','and','or','of','to','in','is','it',
                          'on','for','with','as','at','by','from','that','this')))
               AS DOUBLE) / len(toks)
             ELSE 0.0 END, 6) AS stopword_ratio,
           CASE
             WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
             WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
             WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
             ELSE 'de' END AS lang_pred
         FROM (
           SELECT doc_id, text, string_split(lower(text), ' ') AS toks,
             len(list_filter(string_split(lower(text),' '), t -> t IN
               ('the','and','of','to','in','is','that','it','for','with'))) AS h_en,
             len(list_filter(string_split(lower(text),' '), t -> t IN
               ('el','la','de','que','y','en','un','los','del','por'))) AS h_es,
             len(list_filter(string_split(lower(text),' '), t -> t IN
               ('le','la','de','et','les','des','en','un','du','que'))) AS h_fr,
             len(list_filter(string_split(lower(text),' '), t -> t IN
               ('der','die','und','das','von','zu','mit','den','ist','im'))) AS h_de
           FROM documents) t""",
    "q_text_quality" ->
      """SELECT doc_id, CAST(round(
           (CASE WHEN length(text) BETWEEN 200 AND 20000 THEN 1.0
                 WHEN length(text) BETWEEN 50 AND 199 THEN 0.5 ELSE 0.1 END) * 0.4 +
           (CASE WHEN len(string_split(lower(text),' ')) > 0
                  AND (CAST(length(text) AS DOUBLE) / len(string_split(lower(text),' ')))
                      BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.3 END) * 0.3 +
           (CASE WHEN (CASE WHEN len(string_split(lower(text),' ')) > 0
             THEN CAST(len(list_filter(string_split(lower(text),' '),
               t -> t IN ('the','a','an','and','or','of','to','in','is','it',
                          'on','for','with','as','at','by','from','that','this')))
               AS DOUBLE) / len(string_split(lower(text),' '))
             ELSE 0.0 END) > 0.05 THEN 1.0 ELSE 0.4 END) * 0.3, 4) AS DOUBLE) AS quality
         FROM documents""",
    // commonness: integer Σ n_t numerator and long N·n denominator are
    // exact in both engines; ONE double division (exact operands
    // < 2^53) ⇒ bit-identical scores with no rounding
    "q_text_commonness" ->
      """WITH ne AS (
           SELECT doc_id, tok FROM (
             SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS tok
             FROM documents) u
           WHERE tok <> ''),
         vocab AS (
           SELECT tok, count(*) AS n_t FROM ne GROUP BY tok
           ORDER BY n_t DESC, tok LIMIT 65536),
         tot AS (SELECT count(*) AS n_total FROM ne)
         SELECT ne.doc_id, count(*) AS n_tokens,
           CAST(sum(coalesce(vocab.n_t, 0)) AS DOUBLE)
             / CAST((SELECT n_total FROM tot) * count(*) AS DOUBLE)
             AS commonness
         FROM ne LEFT JOIN vocab ON ne.tok = vocab.tok
         GROUP BY ne.doc_id""",
    // TF-IDF: identical smoothed-idf op order (ints → double, one
    // division, ln, +1.0, ×tf, round 4); ranking on the ROUNDED score
    // with token tie-break matches the Spark window exactly
    "q_text_tfidf" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         ne AS (SELECT doc_id, token FROM toks WHERE token <> ''),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM ne GROUP BY 1, 2),
         df AS (SELECT token, count(*) AS df_docs FROM tf GROUP BY 1),
         nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
         scored AS (
           SELECT tf.doc_id, tf.token, tf.tf, df.df_docs,
             round(CAST(tf.tf AS DOUBLE) *
               (ln((CAST((SELECT n_docs FROM nd) AS DOUBLE) + 1.0)
                   / (CAST(df.df_docs AS DOUBLE) + 1.0)) + 1.0), 4) AS tfidf
           FROM tf JOIN df ON tf.token = df.token)
         SELECT doc_id, token, tf, df_docs, tfidf FROM (
           SELECT *, row_number() OVER (
             PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
           FROM scored) r
         WHERE rn <= 3""",
    // identical replay over the full corpus — the index-served scorer must
    // reproduce the one-shot scores bit-for-bit, only topK differs
    "q_text_tfidf_incr" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         ne AS (SELECT doc_id, token FROM toks WHERE token <> ''),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM ne GROUP BY 1, 2),
         df AS (SELECT token, count(*) AS df_docs FROM tf GROUP BY 1),
         nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
         scored AS (
           SELECT tf.doc_id, tf.token, tf.tf, df.df_docs,
             round(CAST(tf.tf AS DOUBLE) *
               (ln((CAST((SELECT n_docs FROM nd) AS DOUBLE) + 1.0)
                   / (CAST(df.df_docs AS DOUBLE) + 1.0)) + 1.0), 4) AS tfidf
           FROM tf JOIN df ON tf.token = df.token)
         SELECT doc_id, token, tf, df_docs, tfidf FROM (
           SELECT *, row_number() OVER (
             PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
           FROM scored) r
         WHERE rn <= 2""",
    // BM25: pinned op order (k1+1 = 2.2 and 1−b = 0.25 fold to the same
    // doubles the literals parse to), contributions rounded at 6 then
    // summed as FIXED CASE columns in term order, total rounded at 4
    "q_text_bm25" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         ne AS (SELECT doc_id, token FROM toks WHERE token <> ''),
         dl AS (SELECT doc_id, count(*) AS dl FROM ne GROUP BY 1),
         stats AS (SELECT
           (SELECT count(*) FROM documents) AS n_docs,
           CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
             / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM ne
                WHERE token IN ('spark', 'hash', 'window') GROUP BY 1, 2),
         df AS (SELECT token, count(*) AS df_docs FROM tf GROUP BY 1),
         per AS (
           SELECT tf.doc_id, tf.token,
             round(
               ln(1.0 + (CAST(stats.n_docs AS DOUBLE)
                           - CAST(df.df_docs AS DOUBLE) + 0.5)
                        / (CAST(df.df_docs AS DOUBLE) + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * 2.2)
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                                             / stats.avgdl)))), 6) AS c
           FROM tf JOIN df ON tf.token = df.token
                   JOIN dl ON tf.doc_id = dl.doc_id, stats)
         SELECT doc_id,
           round(coalesce(c0, 0.0) + coalesce(c1, 0.0)
                 + coalesce(c2, 0.0), 4) AS bm25
         FROM (
           SELECT doc_id,
             sum(CASE WHEN token = 'spark' THEN c END) AS c0,
             sum(CASE WHEN token = 'hash' THEN c END) AS c1,
             sum(CASE WHEN token = 'window' THEN c END) AS c2
           FROM per GROUP BY doc_id) g
         ORDER BY bm25 DESC, doc_id
         LIMIT 20""",
    // retrieval eval: replay rankings, same-label qrels, and the three
    // metric formulas (DECIMAL DCG sums, ln-based log2)
    "q_ann_eval" ->
      """WITH qv AS (SELECT vec_id AS qid, embedding AS qvec,
             label AS qlabel
           FROM embeddings WHERE vec_id % 100 = 0),
         sem AS (SELECT qv.qid, e.vec_id AS doc_id,
             round(CAST(list_cosine_similarity(e.embedding, qv.qvec)
               AS DOUBLE), 4) AS cosine
           FROM embeddings e, qv),
         rk AS (SELECT qid, doc_id, rn AS rank FROM (
             SELECT qid, doc_id, row_number() OVER (
               PARTITION BY qid ORDER BY cosine DESC, doc_id) AS rn
             FROM sem) t
           WHERE rn <= 10),
         rel AS (SELECT qv.qid, e.vec_id AS doc_id, 1.0 AS grade
           FROM qv JOIN embeddings e ON e.label = qv.qlabel),
         nrel AS (SELECT qid, count(*) AS nrel FROM rel GROUP BY 1),
         hits AS (SELECT r.qid, r.rank, l.grade
           FROM rk r JOIN rel l ON r.qid = l.qid AND r.doc_id = l.doc_id),
         perq AS (SELECT qid, count(*) AS nhit, min(rank) AS first,
             sum(CAST(round((pow(2.0, CAST(grade AS DOUBLE)) - 1.0)
               / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0)), 9)
               AS DECIMAL(28,9))) AS dcg
           FROM hits GROUP BY 1),
         ideal AS (SELECT qid,
             sum(CAST(round((pow(2.0, CAST(grade AS DOUBLE)) - 1.0)
               / (ln(CAST(irank AS DOUBLE) + 1.0) / ln(2.0)), 9)
               AS DECIMAL(28,9))) AS idcg
           FROM (SELECT qid, grade, row_number() OVER (
               PARTITION BY qid ORDER BY grade DESC, doc_id) AS irank
             FROM rel) t
           WHERE irank <= 10 GROUP BY 1)
         SELECT q.qid,
           round(CAST(coalesce(p.nhit, 0) AS DOUBLE)
             / CAST(n.nrel AS DOUBLE), 6) AS recall_at_k,
           round(CASE WHEN p.first IS NOT NULL
               THEN 1.0 / CAST(p.first AS DOUBLE)
             WHEN n.nrel IS NOT NULL THEN 0.0 END, 6) AS mrr_at_k,
           round(CAST(coalesce(p.dcg, 0) AS DOUBLE)
             / CAST(i.idcg AS DOUBLE), 6) AS ndcg_at_k
         FROM (SELECT DISTINCT qid FROM rk) q
         LEFT JOIN nrel n USING(qid)
         LEFT JOIN perq p USING(qid)
         LEFT JOIN ideal i USING(qid)""",
    // hybrid RRF: replay the BM25 leg (top-50), the rounded-cosine leg
    // (top-50), then the exact reciprocal-rank arithmetic — integer
    // c+rank reciprocals sum identically in any IEEE engine
    "q_text_hybrid" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         ne AS (SELECT doc_id, token FROM toks WHERE token <> ''),
         dl AS (SELECT doc_id, count(*) AS dl FROM ne GROUP BY 1),
         stats AS (SELECT
           (SELECT count(*) FROM documents) AS n_docs,
           CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
             / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM ne
                WHERE token IN ('spark', 'hash', 'window') GROUP BY 1, 2),
         df AS (SELECT token, count(*) AS df_docs FROM tf GROUP BY 1),
         per AS (
           SELECT tf.doc_id, tf.token,
             round(
               ln(1.0 + (CAST(stats.n_docs AS DOUBLE)
                           - CAST(df.df_docs AS DOUBLE) + 0.5)
                        / (CAST(df.df_docs AS DOUBLE) + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * 2.2)
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                                             / stats.avgdl)))), 6) AS c
           FROM tf JOIN df ON tf.token = df.token
                   JOIN dl ON tf.doc_id = dl.doc_id, stats),
         bm AS (
           SELECT doc_id,
             round(coalesce(c0, 0.0) + coalesce(c1, 0.0)
                   + coalesce(c2, 0.0), 4) AS bm25
           FROM (
             SELECT doc_id,
               sum(CASE WHEN token = 'spark' THEN c END) AS c0,
               sum(CASE WHEN token = 'hash' THEN c END) AS c1,
               sum(CASE WHEN token = 'window' THEN c END) AS c2
             FROM per GROUP BY doc_id) g
           ORDER BY bm25 DESC, doc_id
           LIMIT 50),
         lexr AS (SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
           FROM bm),
         sem AS (
           SELECT vec_id AS doc_id,
             round(CAST(list_cosine_similarity(embedding,
               (SELECT embedding FROM embeddings WHERE vec_id = 0))
               AS DOUBLE), 4) AS cosine
           FROM embeddings
           ORDER BY cosine DESC, doc_id
           LIMIT 50),
         semr AS (SELECT doc_id,
             row_number() OVER (ORDER BY cosine DESC, doc_id) AS sem_rank
           FROM sem)
         SELECT COALESCE(lexr.doc_id, semr.doc_id) AS doc_id,
           lex_rank, sem_rank,
           round(coalesce(1.0 / (60 + lex_rank), 0.0)
                 + coalesce(1.0 / (60 + sem_rank), 0.0), 6) AS rrf
         FROM lexr FULL OUTER JOIN semr ON lexr.doc_id = semr.doc_id
         ORDER BY coalesce(1.0 / (60 + lex_rank), 0.0)
                  + coalesce(1.0 / (60 + sem_rank), 0.0) DESC,
           COALESCE(lexr.doc_id, semr.doc_id)
         LIMIT 10""",
    // batched hybrid: replay the per-(doc, token) contributions once,
    // per-query DECIMAL sums, both rank windows, and the fusion
    "q_text_hybrid_batch" ->
      """WITH qdef(qid, token) AS (VALUES
           (0,'spark'),(0,'hash'),(0,'window'),
           (100,'data'),(100,'query'),(100,'table'),
           (200,'scan'),(200,'filter'),
           (300,'merge'),(300,'sort'),(300,'batch'),
           (400,'join'),(400,'key')),
         qv AS (SELECT vec_id AS qid, embedding AS qvec
                FROM embeddings
                WHERE vec_id IN (SELECT DISTINCT qid FROM qdef)),
         qterms AS (SELECT CAST(d.qid AS BIGINT) AS qid, d.token
                    FROM qdef d JOIN qv ON d.qid = qv.qid),
         toks AS (
           SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         ne AS (SELECT doc_id, token FROM toks WHERE token <> ''),
         dl AS (SELECT doc_id, count(*) AS dl FROM ne GROUP BY 1),
         stats AS (SELECT
           (SELECT count(*) FROM documents) AS n_docs,
           CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
             / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM ne
                WHERE token IN (SELECT DISTINCT token FROM qterms)
                GROUP BY 1, 2),
         df AS (SELECT token, count(*) AS df_docs FROM tf GROUP BY 1),
         per AS (
           SELECT tf.doc_id, tf.token,
             round(
               ln(1.0 + (CAST(stats.n_docs AS DOUBLE)
                           - CAST(df.df_docs AS DOUBLE) + 0.5)
                        / (CAST(df.df_docs AS DOUBLE) + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * 2.2)
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                                             / stats.avgdl)))), 6) AS c
           FROM tf JOIN df ON tf.token = df.token
                   JOIN dl ON tf.doc_id = dl.doc_id, stats),
         lex AS (SELECT q.qid, p.doc_id,
             round(CAST(sum(CAST(p.c AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS bm25
           FROM qterms q JOIN per p ON q.token = p.token GROUP BY 1, 2),
         lexr AS (SELECT qid, doc_id, lrank FROM (
             SELECT qid, doc_id, row_number() OVER (
               PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS lrank
             FROM lex) t
           WHERE lrank <= 20),
         sem AS (SELECT qv.qid, e.vec_id AS doc_id,
             round(CAST(list_cosine_similarity(e.embedding, qv.qvec)
               AS DOUBLE), 4) AS cosine
           FROM embeddings e, qv),
         semr AS (SELECT qid, doc_id, srank FROM (
             SELECT qid, doc_id, row_number() OVER (
               PARTITION BY qid ORDER BY cosine DESC, doc_id) AS srank
             FROM sem) t
           WHERE srank <= 20),
         fused AS (SELECT
             COALESCE(l.qid, s.qid) AS qid,
             COALESCE(l.doc_id, s.doc_id) AS doc_id,
             l.lrank AS lex_rank, s.srank AS sem_rank,
             coalesce(1.0 / (60 + l.lrank), 0.0)
               + coalesce(1.0 / (60 + s.srank), 0.0) AS f
           FROM lexr l FULL OUTER JOIN semr s
             ON l.qid = s.qid AND l.doc_id = s.doc_id)
         SELECT qid, doc_id, lex_rank, sem_rank,
           round(f, 6) AS rrf, CAST(rn AS INTEGER) AS rank
         FROM (
           SELECT qid, doc_id, lex_rank, sem_rank, f,
             row_number() OVER (
               PARTITION BY qid ORDER BY f DESC, doc_id) AS rn
           FROM fused) t
         WHERE rn <= 10""",
    // identical replay — the incremental index must reproduce the one-shot
    // scores bit-for-bit, only the topK differs
    "q_text_bm25_incr" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         ne AS (SELECT doc_id, token FROM toks WHERE token <> ''),
         dl AS (SELECT doc_id, count(*) AS dl FROM ne GROUP BY 1),
         stats AS (SELECT
           (SELECT count(*) FROM documents) AS n_docs,
           CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
             / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM ne
                WHERE token IN ('spark', 'hash', 'window') GROUP BY 1, 2),
         df AS (SELECT token, count(*) AS df_docs FROM tf GROUP BY 1),
         per AS (
           SELECT tf.doc_id, tf.token,
             round(
               ln(1.0 + (CAST(stats.n_docs AS DOUBLE)
                           - CAST(df.df_docs AS DOUBLE) + 0.5)
                        / (CAST(df.df_docs AS DOUBLE) + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * 2.2)
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                                             / stats.avgdl)))), 6) AS c
           FROM tf JOIN df ON tf.token = df.token
                   JOIN dl ON tf.doc_id = dl.doc_id, stats)
         SELECT doc_id,
           round(coalesce(c0, 0.0) + coalesce(c1, 0.0)
                 + coalesce(c2, 0.0), 4) AS bm25
         FROM (
           SELECT doc_id,
             sum(CASE WHEN token = 'spark' THEN c END) AS c0,
             sum(CASE WHEN token = 'hash' THEN c END) AS c1,
             sum(CASE WHEN token = 'window' THEN c END) AS c2
           FROM per GROUP BY doc_id) g
         ORDER BY bm25 DESC, doc_id
         LIMIT 15""",
    // the mutation chain must land exactly on one-shot BM25 over the
    // LIVE corpus: true text (stale versions superseded), %7 docs gone
    "q_text_bm25_upsert" ->
      """WITH live AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
         toks AS (
           SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM live),
         ne AS (SELECT doc_id, token FROM toks WHERE token <> ''),
         dl AS (SELECT doc_id, count(*) AS dl FROM ne GROUP BY 1),
         stats AS (SELECT
           (SELECT count(*) FROM live) AS n_docs,
           CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
             / CAST((SELECT count(*) FROM live) AS DOUBLE) AS avgdl),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM ne
                WHERE token IN ('spark', 'hash', 'window') GROUP BY 1, 2),
         df AS (SELECT token, count(*) AS df_docs FROM tf GROUP BY 1),
         per AS (
           SELECT tf.doc_id, tf.token,
             round(
               ln(1.0 + (CAST(stats.n_docs AS DOUBLE)
                           - CAST(df.df_docs AS DOUBLE) + 0.5)
                        / (CAST(df.df_docs AS DOUBLE) + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * 2.2)
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                                             / stats.avgdl)))), 6) AS c
           FROM tf JOIN df ON tf.token = df.token
                   JOIN dl ON tf.doc_id = dl.doc_id, stats)
         SELECT doc_id,
           round(coalesce(c0, 0.0) + coalesce(c1, 0.0)
                 + coalesce(c2, 0.0), 4) AS bm25
         FROM (
           SELECT doc_id,
             sum(CASE WHEN token = 'spark' THEN c END) AS c0,
             sum(CASE WHEN token = 'hash' THEN c END) AS c1,
             sum(CASE WHEN token = 'window' THEN c END) AS c2
           FROM per GROUP BY doc_id) g
         ORDER BY bm25 DESC, doc_id
         LIMIT 15""",
    // count-min sketch: all-integer recompute — the 4 tagged hash chains
    // ('cms<d>:' || token, seed 0) replay the library hash per
    // occurrence, cells via the same positive-mod, estimate = min over
    // the 4 cells
    "q_freq_cms" -> cmsOracleSql,
    // heavy hitters envelope: the exact over-threshold token set with
    // TRUE flags — a summary missing a heavy token or overstepping its
    // count bounds hash-mismatches
    "q_freq_topk" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         ne AS (SELECT token FROM toks WHERE token <> ''),
         tot AS (SELECT count(*) AS n FROM ne)
         SELECT token, count(*) AS n_exact, TRUE AS found, TRUE AS bound_ok
         FROM ne, tot
         GROUP BY token, n
         HAVING count(*) > n // 257""",
    // vocabulary: same \s+ tokenization (string_split_regex) + the same
    // total (count desc, token asc) order, so the top-100 SET matches
    // even with count ties at the boundary
    // unigram NLL replayed with the identical pinned op order:
    // tf · ln((c+1)/(N+V)) per distinct (doc, token), mean over the
    // token stream, round 6 (the established ln-seam discipline)
    "q_text_logprob" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         ne AS (SELECT doc_id, token FROM toks WHERE token <> ''),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM ne GROUP BY 1, 2),
         cnt AS (SELECT token, sum(tf) AS c FROM tf GROUP BY 1),
         stats AS (SELECT sum(c) AS n_total, count(*) AS vocab FROM cnt)
         SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           round(-sum(CAST(tf AS DOUBLE) *
               ln((CAST(c AS DOUBLE) + 1.0) /
                  (CAST(n_total AS DOUBLE) + CAST(vocab AS DOUBLE)))) /
             CAST(sum(tf) AS DOUBLE), 6) AS nll
         FROM tf JOIN cnt USING (token) CROSS JOIN stats
         GROUP BY doc_id""",
    "q_text_vocab" ->
      """SELECT token, n_occurrences FROM (
           SELECT tok AS token, count(*) AS n_occurrences
           FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
                 FROM documents) u
           WHERE tok <> ''
           GROUP BY tok) g
         ORDER BY n_occurrences DESC, token
         LIMIT 100""",
    // subword family: the greedy longest-match segmentation is replayed
    // exactly by the recursive `seg` CTE in subwordPrelude (longest
    // vocab piece at the cursor, single-char fallback), tokenizing each
    // DISTINCT lowercased word once
    "q_text_subword" ->
      s"""WITH RECURSIVE $subwordPrelude,
          dn AS (SELECT doc_id, sum(n) AS n
                 FROM dw JOIN wtok USING (w) GROUP BY 1)
          SELECT d.doc_id, CAST(coalesce(dn.n, 0) AS BIGINT) AS n_subwords
          FROM documents d LEFT JOIN dn USING (doc_id)""",
    "q_text_vocab_subword" ->
      s"""WITH RECURSIVE $subwordPrelude,
          wf AS (SELECT w, count(*) AS f FROM dw GROUP BY 1)
          SELECT piece AS token, CAST(sum(f) AS BIGINT) AS n_occurrences
          FROM seg JOIN wf USING (w) WHERE idx > 0
          GROUP BY 1 ORDER BY n_occurrences DESC, token LIMIT 100""",
    // q_pack_sequences' running-sum arithmetic with n_tokens swapped to
    // the subword cost (same HUGEINT->BIGINT cast discipline)
    "q_pack_subword" ->
      s"""WITH RECURSIVE $subwordPrelude,
          dn AS (SELECT doc_id, sum(n) AS n
                 FROM dw JOIN wtok USING (w) GROUP BY 1),
          dt AS (SELECT d.doc_id, d.source,
                   CAST(coalesce(dn.n, 0) AS BIGINT) AS n_tokens
                 FROM documents d LEFT JOIN dn USING (doc_id))
          SELECT doc_id, source, n_tokens,
            before // 512 AS pack_seq, before % 512 AS pack_offset
          FROM (SELECT doc_id, source, n_tokens,
                  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS before
                FROM dt) u""",
    // BPE TRAINING replayed as 8 unrolled SQL stages (one per learned
    // merge; generated — see bpeTrainOracle). Each stage counts adjacent
    // symbol pairs from a bracket-delimited segmentation string, takes
    // the (count DESC, a, b) argmax, and applies the merge with a plain
    // left-to-right `replace` — which equals the trainer's greedy fold
    // because every symbol is fully bracket-delimited (no cross-boundary
    // false matches) and SQL replace consumes matches left-to-right.
    // CTEs are MATERIALIZED: the naive inlining re-expands each stage ~3x
    // per level — exponential in the merge count.
    "q_text_bpe_train" -> bpeTrainOracle(8),
    // BPE family: btok replays the pinned merge order per distinct word
    "q_text_bpe" ->
      s"""WITH RECURSIVE $bpePrelude,
          dn AS (SELECT doc_id, sum(n) AS n
                 FROM dwb JOIN btok USING (w) GROUP BY 1)
          SELECT d.doc_id, CAST(coalesce(dn.n, 0) AS BIGINT) AS n_bpe
          FROM documents d LEFT JOIN dn USING (doc_id)""",
    "q_pack_bpe" ->
      s"""WITH RECURSIVE $bpePrelude,
          dn AS (SELECT doc_id, sum(n) AS n
                 FROM dwb JOIN btok USING (w) GROUP BY 1),
          dt AS (SELECT d.doc_id, d.source,
                   CAST(coalesce(dn.n, 0) AS BIGINT) AS n_tokens
                 FROM documents d LEFT JOIN dn USING (doc_id))
          SELECT doc_id, source, n_tokens,
            before // 1024 AS pack_seq, before % 1024 AS pack_offset
          FROM (SELECT doc_id, source, n_tokens,
                  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS before
                FROM dt) u""",
    // q_text_chunks_budget's recurrence with the per-word cost drawn
    // from the BPE btok instead of the greedy-subword wtok
    "q_text_chunks_bpe" ->
      s"""WITH RECURSIVE $bpePrelude,
          wrd AS (
            SELECT doc_id, s AS word_idx, toks[CAST(s AS INT)+1] AS w
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents) dd,
              unnest(range(0, len(toks))) AS u(s)
            WHERE toks[CAST(s AS INT)+1] <> ''),
          wz AS (SELECT doc_id, word_idx, wrd.w AS w, btok.n AS wt,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY word_idx) AS rn
                 FROM wrd JOIN btok ON lower(wrd.w) = btok.w),
          rec AS (
            SELECT doc_id, rn, word_idx, w, wt,
              CAST(0 AS BIGINT) AS chunk_idx, wt AS off
            FROM wz WHERE rn = 1
            UNION ALL
            SELECT z.doc_id, z.rn, z.word_idx, z.w, z.wt,
              CASE WHEN rec.off + z.wt <= 48 THEN rec.chunk_idx
                   ELSE rec.chunk_idx + 1 END,
              CASE WHEN rec.off + z.wt <= 48 THEN rec.off + z.wt
                   ELSE z.wt END
            FROM rec JOIN wz z
              ON z.doc_id = rec.doc_id AND z.rn = rec.rn + 1)
          SELECT doc_id, chunk_idx,
            string_agg(w, ' ' ORDER BY word_idx) AS chunk_text,
            CAST(sum(wt) AS BIGINT) AS n_tokens
          FROM rec GROUP BY 1, 2""",
    // byte-BPE family: butok replays the pinned pre-tokenize → byte-map
    // → merge order per distinct TEXT (document costs) or WORD (chunk
    // budgets)
    "q_text_bpe_bytes" ->
      s"""WITH RECURSIVE ${bpeBytesPrelude(
            "SELECT DISTINCT text FROM documents")}
          SELECT d.doc_id, CAST(coalesce(butok.n, 0) AS BIGINT) AS n_bpe_bytes
          FROM documents d LEFT JOIN butok ON d.text = butok.u""",
    "q_pack_bpe_bytes" ->
      s"""WITH RECURSIVE ${bpeBytesPrelude(
            "SELECT DISTINCT text FROM documents")},
          dt AS (SELECT d.doc_id, d.source,
                   CAST(coalesce(butok.n, 0) AS BIGINT) AS n_tokens
                 FROM documents d LEFT JOIN butok ON d.text = butok.u)
          SELECT doc_id, source, n_tokens,
            before // 1024 AS pack_seq, before % 1024 AS pack_offset
          FROM (SELECT doc_id, source, n_tokens,
                  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS before
                FROM dt) u""",
    "q_text_chunks_bpe_bytes" ->
      s"""WITH RECURSIVE ${bpeBytesPrelude(
            """SELECT DISTINCT toks[CAST(s AS INT)+1]
               FROM (SELECT string_split(text, ' ') AS toks
                     FROM documents) dd,
                 unnest(range(0, len(toks))) AS us(s)
               WHERE toks[CAST(s AS INT)+1] <> ''""")},
          wrd AS (
            SELECT doc_id, s AS word_idx, toks[CAST(s AS INT)+1] AS w
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents) dd,
              unnest(range(0, len(toks))) AS uw(s)
            WHERE toks[CAST(s AS INT)+1] <> ''),
          wz AS (SELECT doc_id, word_idx, wrd.w AS w, butok.n AS wt,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY word_idx) AS rn
                 FROM wrd JOIN butok ON wrd.w = butok.u),
          rec AS (
            SELECT doc_id, rn, word_idx, w, wt,
              CAST(0 AS BIGINT) AS chunk_idx, wt AS off
            FROM wz WHERE rn = 1
            UNION ALL
            SELECT z.doc_id, z.rn, z.word_idx, z.w, z.wt,
              CASE WHEN rec.off + z.wt <= 48 THEN rec.chunk_idx
                   ELSE rec.chunk_idx + 1 END,
              CASE WHEN rec.off + z.wt <= 48 THEN rec.off + z.wt
                   ELSE z.wt END
            FROM rec JOIN wz z
              ON z.doc_id = rec.doc_id AND z.rn = rec.rn + 1)
          SELECT doc_id, chunk_idx,
            string_agg(w, ' ' ORDER BY word_idx) AS chunk_text,
            CAST(sum(wt) AS BIGINT) AS n_tokens
          FROM rec GROUP BY 1, 2""",
    // q_pack_greedy's next-fit recurrence at word granularity: words in
    // ORIGINAL case rebuild the chunk text, the per-word subword cost
    // joins through the lowercased wtok
    "q_text_chunks_budget" ->
      s"""WITH RECURSIVE $subwordPrelude,
          wrd AS (
            SELECT doc_id, s AS word_idx, toks[CAST(s AS INT)+1] AS w
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents) dd,
              unnest(range(0, len(toks))) AS u(s)
            WHERE toks[CAST(s AS INT)+1] <> ''),
          wz AS (SELECT doc_id, word_idx, wrd.w AS w, wtok.n AS wt,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY word_idx) AS rn
                 FROM wrd JOIN wtok ON lower(wrd.w) = wtok.w),
          rec AS (
            SELECT doc_id, rn, word_idx, w, wt,
              CAST(0 AS BIGINT) AS chunk_idx, wt AS off
            FROM wz WHERE rn = 1
            UNION ALL
            SELECT z.doc_id, z.rn, z.word_idx, z.w, z.wt,
              CASE WHEN rec.off + z.wt <= 48 THEN rec.chunk_idx
                   ELSE rec.chunk_idx + 1 END,
              CASE WHEN rec.off + z.wt <= 48 THEN rec.off + z.wt
                   ELSE z.wt END
            FROM rec JOIN wz z
              ON z.doc_id = rec.doc_id AND z.rn = rec.rn + 1)
          SELECT doc_id, chunk_idx,
            string_agg(w, ' ' ORDER BY word_idx) AS chunk_text,
            CAST(sum(wt) AS BIGINT) AS n_tokens
          FROM rec GROUP BY 1, 2""",
    // repetition signals: shared IEEE shape 1.0 − distinct/total per
    // array; DuckDB range(1, n) is stop-exclusive = Spark
    // sequence(1, n−1); lists are 1-based in both engines
    "q_text_repetition" ->
      """WITH base AS (
           SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
               w -> w <> '') AS words,
             list_filter(list_transform(string_split(text, chr(10)),
               l -> trim(l)), l -> l <> '') AS lines
           FROM documents),
         sized AS (
           SELECT doc_id, words, lines, len(words) AS nw,
             list_transform(range(1, len(words)),
               i -> words[i] || ' ' || words[i+1]) AS bigrams
           FROM base)
         SELECT doc_id, CAST(nw AS INTEGER) AS n_words,
           round(CASE WHEN nw > 0
             THEN 1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / len(words)
             ELSE 0.0 END, 6) AS dup_word_frac,
           round(CASE WHEN nw >= 2
             THEN 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
             ELSE 0.0 END, 6) AS dup_bigram_frac,
           round(CASE WHEN len(lines) > 0
             THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
             ELSE 0.0 END, 6) AS dup_line_frac
         FROM sized""",
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, text, count(*) AS n_copies
         FROM documents GROUP BY text""",
    // segment dedup replayed: identical 32-token windows, identical
    // 'pg:'-tagged Hash64 per segment, first occurrence by
    // (doc_id, seg_idx) via row_number, ordered string_agg rebuild
    "q_dedup_segments" ->
      s"""WITH segs AS (
            SELECT doc_id, CAST(s // 32 AS BIGINT) AS seg_idx,
              array_to_string(toks[s+1 : s+32], ' ') AS seg
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents) t,
              unnest(range(0, greatest(len(toks), 1), 32)) AS u(s)),
          hashed AS (
            SELECT doc_id, seg_idx, seg, x5 AS h
            FROM (${hash64Sql("'pg:' || seg", from = "segs",
                carry = "doc_id, seg_idx, seg")}) hh),
          kept AS (
            SELECT doc_id, seg_idx, seg,
              row_number() OVER (PARTITION BY h
                ORDER BY doc_id, seg_idx) AS rn
            FROM hashed)
          SELECT doc_id, count(*) AS n_segs_kept,
            string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup
          FROM kept WHERE rn = 1 GROUP BY doc_id""",
    "q_text_winnow" -> winnowSql,
    // duplicate-span replay: identical 8-token windows ('dsp:'-tagged
    // Hash64), count >= 2 positions, identical break/cumsum interval
    // merge — all-integer arithmetic end to end
    "q_dedup_spans" -> dupSpanSql(
      """SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end
         FROM isl GROUP BY doc_id, isl"""),
    // keep-first: rn > 1 over (doc_id, pos) within a window hash is
    // exactly "duplicated AND not the first occurrence"
    "q_dedup_spans_first" -> dupSpanSql(
      """SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end
         FROM isl GROUP BY doc_id, isl""",
      hits = """SELECT doc_id, pos FROM (
          SELECT doc_id, pos, row_number() OVER
            (PARTITION BY x5 ORDER BY doc_id, pos) AS rn
          FROM h) r WHERE rn > 1"""),
    // despan replay: expand merged spans to covered positions, anti-side
    // LEFT JOIN keeps uncovered tokens, ordered string_agg rebuild;
    // documents with no kept token come back as ''
    "q_text_despan" -> dupSpanSql(despanTail),
    // keep-first rewrite: same reconstruction over the rn>1 hit rule
    "q_text_despan_first" -> dupSpanSql(despanTail,
      hits = """SELECT doc_id, pos FROM (
          SELECT doc_id, pos, row_number() OVER
            (PARTITION BY x5 ORDER BY doc_id, pos) AS rn
          FROM h) r WHERE rn > 1"""),
    // pretrain chain: despan CTEs -> clean token counts -> gate ->
    // the q_pack_sequences cumsum arithmetic, all composed from proven
    // stage oracles
    "q_pipeline_pretrain" -> dupSpanSql(
      """, spans AS (
           SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
           FROM isl GROUP BY doc_id, isl),
         cov AS (
           SELECT DISTINCT doc_id, p
           FROM spans, unnest(range(s, e)) AS v(p)),
         tok AS (
           SELECT doc_id, i, tk[CAST(i AS INT) + 1] AS t
           FROM toks, unnest(range(0, len(tk))) AS u(i)),
         kept AS (
           SELECT tok.doc_id, tok.i, tok.t
           FROM tok LEFT JOIN cov
             ON tok.doc_id = cov.doc_id AND tok.i = cov.p
           WHERE cov.p IS NULL),
         clean AS (
           SELECT d.doc_id, d.source, coalesce(k.ct, '') AS ct
           FROM documents d LEFT JOIN (
             SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS ct
             FROM kept GROUP BY doc_id) k USING (doc_id)),
         f AS (
           SELECT doc_id, source,
             CAST(len(string_split(ct, ' ')) AS BIGINT) AS n_tokens
           FROM clean
           WHERE len(string_split(ct, ' ')) >= 16),
         cum AS (
           SELECT doc_id, source, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS before
           FROM f)
         SELECT doc_id, source, n_tokens,
           before // 512 AS pack_seq, before % 512 AS pack_offset
         FROM cum"""),
    // same unit-cost Levenshtein metric both engines; argmin replayed
    // as row_number over (dist, match_id)
    "q_fuzzy_match" ->
      """WITH p AS (SELECT source AS blk, doc_id AS id,
              substr(text, 1, 64) AS pfx FROM documents),
          pairs AS (
            SELECT a.id AS doc_id, levenshtein(a.pfx, b.pfx) AS dist,
              b.id AS match_id
            FROM p a JOIN p b ON a.blk = b.blk AND a.id <> b.id),
          r AS (
            SELECT doc_id, dist, match_id,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY dist, match_id) AS rn
            FROM pairs)
          SELECT doc_id, match_id, CAST(dist AS BIGINT) AS dist
          FROM r WHERE rn = 1""",
    // incremental semantics replayed set-wise: a content's keeper is the
    // min doc_id within the FIRST phase that contains it (hash-free —
    // any index hash collision would show up as a missing row here)
    "q_dedup_incr" ->
      """WITH p AS (
           SELECT doc_id, text, doc_id % 3 AS phase FROM documents),
         firstp AS (SELECT text, min(phase) AS ph FROM p GROUP BY 1)
         SELECT min(p.doc_id) AS doc_id, p.phase
         FROM p JOIN firstp ON p.text = firstp.text AND p.phase = firstp.ph
         GROUP BY p.text, p.phase""",
    // phase-ordered keepers with the %5 takedown in between: a content
    // whose phase-0/1 keeper was removed gets a FRESH phase-2 keeper;
    // a surviving content's phase-2 copies still drop
    "q_dedup_incr_remove" ->
      """WITH p AS (
           SELECT doc_id, text, doc_id % 3 AS phase FROM documents),
         p01 AS (SELECT * FROM p WHERE phase <= 1),
         firstp AS (SELECT text, min(phase) AS ph FROM p01 GROUP BY 1),
         k01 AS (
           SELECT min(p01.doc_id) AS doc_id, p01.phase, p01.text
           FROM p01 JOIN firstp
             ON p01.text = firstp.text AND p01.phase = firstp.ph
           GROUP BY p01.text, p01.phase),
         live01 AS (SELECT * FROM k01 WHERE doc_id % 5 <> 0),
         r2 AS (
           SELECT min(doc_id) AS doc_id, CAST(2 AS BIGINT) AS phase
           FROM p WHERE phase = 2
             AND text NOT IN (SELECT text FROM live01)
           GROUP BY text)
         SELECT doc_id, phase FROM live01
         UNION ALL SELECT doc_id, phase FROM r2""",
    // composed curation chain: each stage's SQL is the already-proven
    // oracle body of its standalone query (dedup_exact / text_stats /
    // text_quality), composed via CTEs exactly as the Spark plan chains
    // the operators
    "q_pipeline_curate" ->
      """WITH surv AS (SELECT DISTINCT text FROM documents),
         base AS (
           SELECT text, string_split(lower(text), ' ') AS toks,
             len(list_filter(string_split(lower(text),' '), t -> t IN
               ('the','and','of','to','in','is','that','it','for','with'))) AS h_en,
             len(list_filter(string_split(lower(text),' '), t -> t IN
               ('el','la','de','que','y','en','un','los','del','por'))) AS h_es,
             len(list_filter(string_split(lower(text),' '), t -> t IN
               ('le','la','de','et','les','des','en','un','du','que'))) AS h_fr,
             len(list_filter(string_split(lower(text),' '), t -> t IN
               ('der','die','und','das','von','zu','mit','den','ist','im'))) AS h_de
           FROM surv),
         scored AS (
           SELECT
             CASE
               WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
               WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
               WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
               ELSE 'de' END AS lang_pred,
             CAST(round(
               (CASE WHEN length(text) BETWEEN 200 AND 20000 THEN 1.0
                     WHEN length(text) BETWEEN 50 AND 199 THEN 0.5 ELSE 0.1 END) * 0.4 +
               (CASE WHEN len(toks) > 0
                      AND (CAST(length(text) AS DOUBLE) / len(toks))
                          BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.3 END) * 0.3 +
               (CASE WHEN (CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(toks,
                   t -> t IN ('the','a','an','and','or','of','to','in','is','it',
                              'on','for','with','as','at','by','from','that','this')))
                   AS DOUBLE) / len(toks)
                 ELSE 0.0 END) > 0.05 THEN 1.0 ELSE 0.4 END) * 0.3, 4) AS DOUBLE)
               AS quality,
             len(string_split(text, ' ')) AS n_tokens
           FROM base)
         SELECT lang_pred, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           max(quality) AS max_quality,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens
         FROM scored WHERE quality >= 0.7 GROUP BY 1""",
    "q_dedup_ngram" ->
      """WITH sh AS (
           SELECT doc_id AS id, list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' '))) AS sh
           FROM documents),
         sizes AS (SELECT id, len(sh) AS sz FROM sh),
         inv AS (SELECT id, unnest(sh) AS s FROM sh),
         shared AS (
           SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
           FROM inv x JOIN inv y ON x.s = y.s AND x.id < y.id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           round(CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared), 6) AS jaccard
         FROM shared
         JOIN sizes sa ON sa.id = id_a
         JOIN sizes sb ON sb.id = id_b
         WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5""",
    // incremental near-dup replayed set-wise on the exact pair set (the
    // same recall-1-at-this-banding argument as q_dedup_minhash below):
    // a doc is dropped iff SOME doc earlier in (phase, id) order is a
    // >= 0.5 Jaccard neighbor — kept = complement
    "q_dedup_incr_near" ->
      """WITH sh AS (
           SELECT doc_id AS id, list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' '))) AS sh
           FROM documents),
         sizes AS (SELECT id, len(sh) AS sz FROM sh),
         inv AS (SELECT id, unnest(sh) AS s FROM sh),
         shared AS (
           SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
           FROM inv x JOIN inv y ON x.s = y.s AND x.id < y.id
           GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM shared
           JOIN sizes sa ON sa.id = id_a
           JOIN sizes sb ON sb.id = id_b
           WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
         edges AS (
           SELECT id_a AS e, id_b AS d FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         dropped AS (
           SELECT DISTINCT d FROM edges
           WHERE (e % 3 < d % 3) OR (e % 3 = d % 3 AND e < d))
         SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS phase
         FROM documents
         WHERE doc_id NOT IN (SELECT d FROM dropped)""",
    // near-dup suppression with the %5 ids struck from the suppressor
    // set for phase 2 (they were removed before that batch), and struck
    // from the surviving output entirely
    "q_dedup_incr_nearrm" ->
      """WITH sh AS (
           SELECT doc_id AS id, list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' '))) AS sh
           FROM documents),
         sizes AS (SELECT id, len(sh) AS sz FROM sh),
         inv AS (SELECT id, unnest(sh) AS s FROM sh),
         shared AS (
           SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
           FROM inv x JOIN inv y ON x.s = y.s AND x.id < y.id
           GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM shared
           JOIN sizes sa ON sa.id = id_a
           JOIN sizes sb ON sb.id = id_b
           WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
         edges AS (
           SELECT id_a AS e, id_b AS d FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         dropped01 AS (
           SELECT DISTINCT d FROM edges
           WHERE d % 3 <= 1 AND e % 3 <= 1
             AND ((e % 3 < d % 3) OR (e % 3 = d % 3 AND e < d))),
         dropped2 AS (
           SELECT DISTINCT d FROM edges
           WHERE d % 3 = 2 AND (
             (e % 3 <= 1 AND e % 5 <> 0)
             OR (e % 3 = 2 AND e < d)))
         SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS phase FROM documents
         WHERE doc_id % 3 <= 1 AND doc_id % 5 <> 0
           AND doc_id NOT IN (SELECT d FROM dropped01)
         UNION ALL
         SELECT doc_id, CAST(2 AS BIGINT) AS phase FROM documents
         WHERE doc_id % 3 = 2
           AND doc_id NOT IN (SELECT d FROM dropped2)""",
    // incremental-span replay over raw gram STRINGS (stricter than the
    // hash: a Hash64 collision in the Spark path would fail here): a
    // position in phase p is duplicated iff its window's cumulative
    // count over phases <= p reaches 2 — exactly "within-batch >= 2 OR
    // seen in the index" — then the shared island arithmetic
    "q_dedup_incr_spans" ->
      """WITH toks AS (
           SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS phase,
             string_split(text, ' ') AS tk FROM documents),
         g AS (
           SELECT doc_id, phase, s AS pos,
             array_to_string(tk[CAST(s AS INT) + 1 : CAST(s AS INT) + 8],
               ' ') AS gram
           FROM toks, unnest(range(0, len(tk) - 7)) AS u(s)),
         pc AS (SELECT gram, phase, count(*) AS n FROM g GROUP BY 1, 2),
         cum AS (
           SELECT gram, phase,
             CAST(sum(n) OVER (PARTITION BY gram ORDER BY phase)
               AS BIGINT) AS cn
           FROM pc),
         hits AS (
           SELECT g.doc_id, g.phase, g.pos
           FROM g JOIN cum ON g.gram = cum.gram AND g.phase = cum.phase
           WHERE cum.cn >= 2),
         m AS (
           SELECT doc_id, phase, pos,
             CASE WHEN pos - lag(pos) OVER
                 (PARTITION BY doc_id ORDER BY pos) <= 8
               THEN 0 ELSE 1 END AS brk
           FROM hits),
         isl AS (
           SELECT doc_id, phase, pos,
             CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS isl
           FROM m)
         SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
           phase
         FROM isl GROUP BY doc_id, phase, isl""",
    // minhash LSH at this banding (64 hashes × 16 bands) has recall 1 on
    // every pair ≥ 0.5 Jaccard in this corpus (verified: candidate set ⊇
    // exact pair set; the exact-Jaccard verify filter makes the final
    // result IDENTICAL to the inverted-index exact pairs), so the exact
    // n-gram oracle applies verbatim
    "q_dedup_minhash" ->
      """WITH sh AS (
           SELECT doc_id AS id, list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' '))) AS sh
           FROM documents),
         sizes AS (SELECT id, len(sh) AS sz FROM sh),
         inv AS (SELECT id, unnest(sh) AS s FROM sh),
         shared AS (
           SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
           FROM inv x JOIN inv y ON x.s = y.s AND x.id < y.id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           round(CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared), 6) AS jaccard
         FROM shared
         JOIN sizes sa ON sa.id = id_a
         JOIN sizes sb ON sb.id = id_b
         WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5""",
    // incremental clustering resolves to exactly the components of the
    // full pair set: same recursive-CTE closure as q_dedup_survivors,
    // but emitting (id, cluster_id = component min) for every edge member
    "q_dedup_incr_clusters" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id AS id, list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' '))) AS sh
           FROM documents),
         sizes AS (SELECT id, len(sh) AS sz FROM sh),
         inv AS (SELECT id, unnest(sh) AS s FROM sh),
         shared AS (
           SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
           FROM inv x JOIN inv y ON x.s = y.s AND x.id < y.id
           GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM shared
           JOIN sizes sa ON sa.id = id_a
           JOIN sizes sb ON sb.id = id_b
           WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
         comp AS (SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)
         SELECT id, cluster_id FROM comp""",
    // incremental survivors == one-shot survivors (same components CTE)
    "q_dedup_incr_survivors" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id AS id, list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' '))) AS sh
           FROM documents),
         sizes AS (SELECT id, len(sh) AS sz FROM sh),
         inv AS (SELECT id, unnest(sh) AS s FROM sh),
         shared AS (
           SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
           FROM inv x JOIN inv y ON x.s = y.s AND x.id < y.id
           GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM shared
           JOIN sizes sa ON sa.id = id_a
           JOIN sizes sb ON sb.id = id_b
           WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
         comp AS (SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)
         SELECT doc_id, n_chars FROM documents
         WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)""",
    // connected components of the exact pair set via transitive closure
    // (recursive CTE), survivors = min-id per component + singletons
    "q_dedup_survivors" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id AS id, list_distinct(list_transform(
             range(len(string_split(lower(text),' ')) - 2),
             i -> array_to_string(string_split(lower(text),' ')[i+1:i+3], ' '))) AS sh
           FROM documents),
         sizes AS (SELECT id, len(sh) AS sz FROM sh),
         inv AS (SELECT id, unnest(sh) AS s FROM sh),
         shared AS (
           SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
           FROM inv x JOIN inv y ON x.s = y.s AND x.id < y.id
           GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM shared
           JOIN sizes sa ON sa.id = id_a
           JOIN sizes sb ON sb.id = id_b
           WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
         comp AS (SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)
         SELECT doc_id, n_chars FROM documents
         WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)""",
    // all-pairs exact cosine in double precision; exactPairs' centroid-
    // angle bound is lossless, so the result matches this oracle by
    // construction at any threshold
    "q_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(CAST(list_cosine_similarity(a.embedding::DOUBLE[],
             b.embedding::DOUBLE[]) AS DOUBLE), 6) AS cosine
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding::DOUBLE[],
           b.embedding::DOUBLE[]) >= 0.4""",
    // incremental embedding near-dup replayed set-wise on the exact pair
    // set (the cell-angle pruning is lossless, so the Spark path's pair
    // set IS the brute-force one): a vector is dropped iff SOME vector
    // earlier in (phase, id) order is a >= 0.4 cosine neighbor
    "q_embed_incr" ->
      """WITH pairs AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.embedding::DOUBLE[],
             b.embedding::DOUBLE[]) >= 0.4),
         edges AS (
           SELECT id_a AS e, id_b AS d FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         dropped AS (
           SELECT DISTINCT d FROM edges
           WHERE (e % 3 < d % 3) OR (e % 3 = d % 3 AND e < d))
         SELECT vec_id, CAST(vec_id % 3 AS BIGINT) AS phase
         FROM embeddings
         WHERE vec_id NOT IN (SELECT d FROM dropped)""",
    // the stub decoder's FNV-1a checksum + derived dims, re-expressed in
    // SQL over HUGEINT modular arithmetic (documents are pure ASCII so
    // codepoints == UTF-8 bytes)
    "q_media_features" ->
      """SELECT doc_id, 'text/plain' AS mime,
           CAST(length(text) AS INTEGER) AS n_bytes,
           CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS checksum,
           CAST(64 + h % 64 AS INTEGER) AS width,
           CAST(64 + (h // 64) % 64 AS INTEGER) AS height
         FROM (
           SELECT doc_id, text,
             list_reduce(
               list_prepend(14695981039346656037::HUGEINT,
                 list_transform(range(1, length(text)+1),
                   i -> ord(substr(text, i, 1))::HUGEINT)),
               (acc, b) -> (xor(acc, b) * 1099511628211::HUGEINT)
                 % 18446744073709551616::HUGEINT) AS h
           FROM documents) t""",
    // resize replay: fake dims from the FNV checksum (as q_media_features),
    // the identical ⌊t·src/out⌋ resample indices over the text bytes, and
    // a second FNV over the 256-byte thumbnail — all integer arithmetic
    "q_media_resize" ->
      """WITH base AS (
           SELECT doc_id, text, length(text) AS len,
             list_reduce(list_prepend(14695981039346656037::HUGEINT,
               list_transform(range(1, length(text)+1),
                 i -> ord(substr(text, i, 1))::HUGEINT)),
               (acc, b) -> (xor(acc, b) * 1099511628211::HUGEINT)
                 % 18446744073709551616::HUGEINT) AS h
           FROM documents),
         dims AS (
           SELECT doc_id, text, len,
             CAST(64 + h % 64 AS BIGINT) AS w,
             CAST(64 + (h // 64) % 64 AS BIGINT) AS ht
           FROM base),
         res AS (
           SELECT doc_id, w, ht,
             array_to_string(list_transform(range(0, 256), p ->
               substr(text,
                 CAST((((p // 16) * ht // 16) * w + (p % 16) * w // 16)
                   % len AS INT) + 1, 1)), '') AS rz
           FROM dims),
         chk AS (
           SELECT doc_id, w, ht,
             list_reduce(list_prepend(14695981039346656037::HUGEINT,
               list_transform(range(1, length(rz)+1),
                 i -> ord(substr(rz, i, 1))::HUGEINT)),
               (acc, b) -> (xor(acc, b) * 1099511628211::HUGEINT)
                 % 18446744073709551616::HUGEINT) AS hc
           FROM res)
         SELECT doc_id, CAST(w AS INTEGER) AS src_w,
           CAST(ht AS INTEGER) AS src_h,
           CAST(16 AS INTEGER) AS out_w, CAST(16 AS INTEGER) AS out_h,
           CAST(CASE WHEN hc >= 9223372036854775808::HUGEINT
             THEN hc - 18446744073709551616::HUGEINT ELSE hc END AS BIGINT)
             AS resized_checksum
         FROM chk""",
    // random projection: the SAME hash-derived ±1 matrix (regenerated
    // here as literals) folded left-to-right — sign·x products are exact
    // IEEE sign flips and the sequential fold order matches the native
    // node's loop, so every output double is bit-identical
    "q_embed_project" -> {
      val signs = graft.operators.Similarity.projectSigns(dim = 64, k = 8)
      val cols = (0 until 8).map { j =>
        val lst = signs(j).map(s => if (s < 0) "-1.0" else "1.0")
          .mkString("[", ", ", "]")
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, 65),
               i -> CAST(embedding[i] AS DOUBLE) * ($lst)[i])),
             (acc, v) -> acc + v) AS proj_$j"""
      }.mkString(",\n           ")
      s"SELECT vec_id, $cols FROM embeddings"
    },
    "q_ann_bruteforce" ->
      """SELECT vec_id,
           round(CAST(list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS cosine
         FROM embeddings
         ORDER BY list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
           vec_id ASC
         LIMIT 10""",
    "q_asof_join" ->
      """WITH ord AS (
           SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
           FROM orders GROUP BY 1, 2)
         SELECT event_id, user_id, ts, last_orderkey
         FROM events ASOF LEFT JOIN ord
           ON events.user_id = ord.o_custkey AND events.ts >= ord.o_orderdate""",
    // ASOF picks the latest preceding click; a match outside the hour
    // nulls out (no nearer one can exist) — exactly backward+tolerance
    "q_attribution" ->
      """WITH clicks AS (
           SELECT user_id AS cu, ts AS c_ts, max(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         p AS (
           SELECT event_id AS purchase_id, user_id, ts,
             value AS purchase_value
           FROM events WHERE event_type = 'purchase')
         SELECT purchase_id, user_id, ts, purchase_value,
           CASE WHEN c_ts >= ts - INTERVAL 1 HOUR THEN click_id
                ELSE NULL END AS click_id
         FROM p ASOF LEFT JOIN clicks
           ON p.user_id = clicks.cu AND p.ts >= clicks.c_ts""",
    "q_range_join" ->
      """SELECT a.event_id AS anchor_id, count(*) AS n_events
         FROM events e JOIN events a
           ON e.user_id = a.user_id
          AND e.ts >= a.ts
          AND e.ts < a.ts + INTERVAL 2 HOUR
         WHERE a.event_type = 'purchase'
         GROUP BY 1""",
    // closed form of "ceil(len/32) frames, keep every 4th, last frame may
    // be partial": n_sampled = floor((nf-1)/4)+1; the last sampled frame
    // is short iff it is the final frame (index nf-1)
    "q_media_frames" ->
      """SELECT doc_id,
           CAST(((nf - 1) // 4) + 1 AS BIGINT) AS n_frames,
           CAST(32 * (((nf - 1) // 4) + 1)
             - (CASE WHEN ((nf - 1) // 4) * 4 = nf - 1
                     THEN 32 * nf - len ELSE 0 END) AS BIGINT) AS total_bytes
         FROM (SELECT doc_id, length(text) AS len,
                 greatest(CAST(ceil(CAST(length(text) AS DOUBLE) / 32) AS BIGINT), 1) AS nf
               FROM documents) t""",
    "q_source_csv" ->
      """SELECT event_type, count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1""",
    "q_source_json" ->
      """SELECT event_type, count(*) AS cnt, max(value) AS max_value
         FROM events GROUP BY 1""",
    "q_source_xml" ->
      """SELECT event_type, count(*) AS cnt, min(value) AS min_value
         FROM events GROUP BY 1""",
    "q_source_orc" ->
      """SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY 1""",
    "q_agg_salted" ->
      """SELECT l_returnflag, count(*) AS cnt,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
           max(l_quantity) AS max_qty
         FROM lineitem GROUP BY 1""",
    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
           count(*) AS cnt, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q_scalar_json" ->
      """SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events""",
    "q_agg_stats" ->
      """SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
         FROM lineitem GROUP BY 1""",
    "q_agg_percentile" ->
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS med_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price
         FROM lineitem GROUP BY 1"""
  )
    // the index-served batched hybrid must be BIT-IDENTICAL to the
    // corpus path (shared scoring cores) — one oracle, two query paths
    .pipe(m => m + ("q_text_hybrid_batch_incr" -> m("q_text_hybrid_batch")))
}
