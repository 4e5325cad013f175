package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: tokenization, token counts,
  * quality scoring, language ID, document fingerprinting.
  *
  * Everything here is pure Catalyst built-ins (codegen'd, no UDFs), so the
  * operators run as narrow map stages — at 100 TB they scan once, shuffle
  * nothing, and keep predicate/column pushdown intact.
  */
object TextAnalysis {

  /** whitespace word tokens (lowercased) */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** whitespace token count */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish token estimate: whitespace words plus punctuation marks each
    * counted as their own token (subword splitting proper needs a
    * vocabulary; words + punctuation is the standard cheap proxy). */
  def bpeTokenCount(text: Column): Column =
    size(split(text, "\\s+")) + punctCount(text)

  private val punctClass = "[^.,!?;:'\"]"

  /** punctuation character count */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, punctClass, ""))

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this")

  /** fraction of tokens that are stopwords */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(stops, t)))
        .cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Sliding-window CHUNKS of `size` whitespace tokens with `overlap`
    * tokens shared between consecutive chunks — the RAG / embedding-prep
    * splitter. Returns an array of chunk strings; pair with
    * `posexplode` for (chunk_idx, chunk_text) rows. Chunk starts are
    * 0, stride, 2·stride, … (stride = size − overlap) while < n_tokens,
    * so the final chunk may be short and a document shorter than `size`
    * yields exactly one chunk. Pure Catalyst built-ins (sequence +
    * transform + slice): a narrow codegen map stage — chunking 100 TB
    * is one scan, zero shuffles, and the output explode is map-side. */
  /** Word-boundary chunking under a TOKEN budget: consecutive whole
    * words accumulate into a chunk while the running tokenizer-counted
    * cost stays within `budget`; the next word past the budget opens a
    * new chunk (a single word exceeding the budget gets a chunk alone).
    * This is the RAG/embedding-prep shape when budgets are in SUBWORD
    * tokens but cuts must respect word boundaries — under
    * [[WhitespaceTokenizer]] every word costs 1 and it degenerates to
    * non-overlapping [[chunks]].
    *
    * Relationally this IS next-fit packing of words into chunks, so the
    * plan is [[Packing.greedyPack]] grouped by document and ordered by
    * word position (one hash exchange + in-partition sort + linear
    * pass), followed by one bounded per-doc rebuild aggregation. Empty
    * words (consecutive spaces) cost zero tokens and are dropped from
    * the rebuilt chunk text.
    *
    * @return (doc_id, chunk_idx, chunk_text, n_tokens) */
  def chunksByTokenBudget(docs: DataFrame, budget: Int,
      tokenizer: Tokenizer = WhitespaceTokenizer,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget=$budget")
    val words = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("word_idx", "word")))
      .filter(col("word") =!= "")
      .withColumn("_wt", tokenizer.count(col("word")))
    val packed = Packing.greedyPack(words, col("doc_id"), col("word_idx"),
      col("_wt"), budget)
    packed.groupBy(col("doc_id"), col("pack_seq"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("word_idx"), col("word")))),
          s => s.getField("word"))).as("chunk_text"),
        sum(col("_wt")).as("n_tokens"))
      .select(col("doc_id"), col("pack_seq").as("chunk_idx"),
        col("chunk_text"), col("n_tokens"))
  }

  def chunks(text: Column, size: Int, overlap: Int): Column =
    // native single pass (graft.functions.WordChunks): each chunk is a
    // byte slice of the input — the equivalent sequence+transform+slice
    // HOF chain evaluates an interpreted lambda per chunk and copies
    // tokens per slice (CodegenFallback), the dominant cost of chunking
    // a corpus; semantics pinned equal in PipelineSpec
    graft.functions.functions.word_chunks(text, size, overlap)

  /** Heuristic quality score in [0,1]: length band + word-length sanity +
    * stopword presence (fluent text has them) — the standard cheap filters
    * applied before expensive model-based scoring. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val toks = tokens(text)
    val nWords = size(toks)
    val meanWordLen = when(nWords > 0, nChars.cast("double") / nWords).otherwise(0.0)
    val lenScore = when(nChars.between(200, 20000), 1.0)
      .when(nChars.between(50, 199), 0.5)
      .otherwise(0.1)
    val wordScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.3)
    val stopScore = when(stopwordRatio(text) > 0.05, 1.0).otherwise(0.4)
    round((lenScore * 0.4 + wordScore * 0.3 + stopScore * 0.3), 4)
  }

  /** Tiny per-language stopword profiles for n-gram-free language ID. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "del", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"))

  /** argmax language by stopword hits; ties break lexicographically via
    * the (hits, code) struct ordering so the result is deterministic. */
  def languageId(text: Column): Column = {
    val toks = tokens(text)
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (code, stops) =>
      val stopArr = array(stops.map(lit): _*)
      struct(
        size(filter(toks, t => array_contains(stopArr, t))).as("hits"),
        lit(code).as("code"))
    }
    array_max(array(scored: _*)).getField("code")
  }

  /** Corpus VOCABULARY: the `topK` most frequent whitespace tokens
    * (lowercased, empties dropped) with occurrence counts — the first
    * step of tokenizer training and a standard corpus-drift probe.
    *
    * Scale shape: the explode is map-side; the count aggregates with a
    * map-side partial combine whose state is vocabulary-sized (bounded
    * by distinct tokens per partition, not rows); the top-k is
    * TakeOrderedAndProject (per-partition heaps + driver merge of k
    * rows), never a global sort. Total: one shuffle keyed on token.
    * The (count desc, token asc) order is total, so the returned SET is
    * deterministic even when counts tie at the k-th place. */
  def vocabulary(docs: DataFrame, topK: Int = 100, textCol: String = "text")
      : DataFrame = {
    require(topK > 0, s"topK=$topK")
    docs.select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(topK)
  }

  /** Intra-document REPETITION signals (the Gopher-style quality
    * filters): fraction of repeated words, repeated word bigrams, and
    * repeated non-blank lines. High values flag boilerplate / generated
    * spam that per-document length and stopword heuristics miss.
    *
    * Pure Catalyst built-ins over per-row arrays — a narrow codegen map
    * stage, zero shuffles at any corpus size. Documents too short for a
    * signal (no words / single word / no non-blank lines) score 0.0 by
    * definition, not NULL, so downstream threshold filters need no null
    * guards. The arithmetic is the shared IEEE shape `1 − distinct/total`
    * (one divide, one subtract), reproducible bit-for-bit externally. */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    def dupFrac(arr: Column): Column =
      lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr)
    val words = filter(tokens(t), w => w =!= "")
    val nWords = size(words)
    // element_at is 1-based; sequence(1, n-1) pairs each word with its
    // successor (guarded: sequence would COUNT DOWN for n < 2)
    val bigrams = transform(sequence(lit(1), nWords - 1),
      i => concat(element_at(words, i), lit(" "), element_at(words, i + 1)))
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => l =!= "")
    docs.select(
      col(idCol),
      nWords.as("n_words"),
      round(when(nWords > 0, dupFrac(words)).otherwise(0.0), 6)
        .as("dup_word_frac"),
      round(when(nWords >= 2, dupFrac(bigrams)).otherwise(0.0), 6)
        .as("dup_bigram_frac"),
      round(when(size(lines) > 0, dupFrac(lines)).otherwise(0.0), 6)
        .as("dup_line_frac"))
  }

  /** Per-document UNIGRAM COMMONNESS: the mean corpus probability of the
    * document's tokens, `score = (Σ_t n_t) / (N_corpus · n_doc)` — the
    * rational-arithmetic stand-in for unigram log-likelihood (same
    * ordering intent: low = rare/garbled vocabulary, high = stopword
    * soup; both tails are the standard quality-filter cuts). Keeping the
    * numerator an INTEGER sum of corpus counts makes the score exactly
    * one double division of exact operands — deterministic regardless of
    * aggregation order, which a float log-prob sum is not.
    *
    * Scale shape: the vocabulary is capped at `topV` rows so the
    * frequency table BROADCASTS (tokens outside it count 0 — rare-token
    * mass is exactly what the low tail measures); the token explode is
    * map-side; the per-doc sum aggregates with map-side partials on
    * doc_id — one shuffle keyed on the document, none on the corpus-
    * sized token stream. Documents with zero tokens are absent from the
    * output (their commonness is undefined, not 0). */
  def commonness(docs: DataFrame, topV: Int = 65536,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val vocab = vocabulary(docs, topK = topV, textCol = textCol)
    val toks = docs.select(col(idCol),
        explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val nTotal = toks.agg(count(lit(1)).as("n_total"))
    toks
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("n_occurrences"), lit(0L))).as("s"))
      .crossJoin(broadcast(nTotal))
      .select(col(idCol), col("n_tokens"),
        (col("s").cast("double") /
          (col("n_total") * col("n_tokens")).cast("double"))
          .as("commonness"))
  }

  /** Per-document TF-IDF TOP TERMS: the `topK` highest-scoring tokens per
    * document under smoothed idf (`idf = ln((N+1)/(df+1)) + 1`, the
    * standard add-one smoothing so corpus-universal terms still score
    * > 0) — the classic keyword/topic extraction step ahead of clustering
    * or retrieval indexing.
    *
    * Scale shape: the explode is map-side; tf aggregates with map-side
    * partials on (doc, token); df aggregates over the tf table (vocab-
    * sized) and BROADCASTS back; the per-doc top-k is one window keyed on
    * the document. Two data-sized shuffles total, none wider than the
    * token stream. Ranking uses the ROUNDED score (4 dp) with a token
    * tie-break, so the selected set is deterministic and independently
    * reproducible — `ln` is the one non-exact step, and rounding absorbs
    * any sub-ulp disagreement between math libraries.
    *
    * N (the idf numerator) counts documents with at least one non-empty
    * token — empty/whitespace-only docs contribute no tf rows and are
    * deliberately excluded, since they can't receive top terms anyway.
    * Note [[bm25]] uses raw `count(*)` over `docs` instead; the two
    * differ only when such empty documents exist.
    */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 3, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(topK > 0, s"topK=$topK")
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    tfidfScore(tf, topK, idCol)
  }

  /** The TF-IDF scoring core over a pre-aggregated (idCol, token, tf)
    * frame — shared verbatim by [[tfidfTopTerms]] and
    * [[IncrementalText.tfidfTopTermsFromIndex]] so the one-shot and
    * index-served paths are bit-identical by construction (every input —
    * df, n_docs — derives from `tf` alone). */
  private[graft] def tfidfScore(tf: DataFrame, topK: Int, idCol: String)
      : DataFrame = {
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df_docs"))
    val nd = tf.agg(count_distinct(col(idCol)).as("n_docs"))
    val tfidf = round(
      col("tf").cast("double") *
        (log((col("n_docs").cast("double") + lit(1.0)) /
          (col("df_docs").cast("double") + lit(1.0))) + lit(1.0)), 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("token"))
    tf.join(broadcast(dfT), Seq("token"))
      .crossJoin(broadcast(nd))
      .withColumn("tfidf", tfidf)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topK)
      .select(col(idCol), col("token"), col("tf"), col("df_docs"), col("tfidf"))
  }

  /** BM25 relevance of every document against a fixed bag of query
    * terms — the retrieval scorer used to mine topical subsets out of a
    * crawl (k1/b are the standard Robertson defaults). Returns the
    * `topK` documents by score; documents matching NO query term are
    * omitted (their score is identically 0).
    *
    * Determinism contract: per-term contributions follow one pinned IEEE
    * op order (`idf · (tf·(k1+1)) / (tf + k1·((1−b) + b·(dl/avgdl)))`,
    * avgdl = one division of exact integer sums), are rounded at 6 dp,
    * and the ≤|terms| contributions per document are summed as FIXED
    * columns in term order — never a float sum over a nondeterministic
    * row order. An external engine replaying the same ops reproduces
    * every score bit-for-bit (modulo sub-ulp `ln`, absorbed by the
    * rounding).
    *
    * Scale shape: doc lengths and tf aggregate with map-side partials
    * (tf only over rows matching a query term — the isin filter prunes
    * the token stream before the shuffle); df and the corpus stats are
    * tiny broadcasts; the final top-k is TakeOrderedAndProject. */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 20, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms == queryTerms.distinct, "queryTerms must be distinct")
    val (toks, dl, stats) = bm25Corpus(docs, textCol, idCol)
    val tf = toks.filter(col("token").isin(queryTerms: _*))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    bm25Score(tf, dl, stats, queryTerms, k1, b, topK, idCol)
  }

  /** The corpus-derivation core shared by [[bm25]] and
    * [[Retrieval.bm25Batch]]: (token stream, doc lengths, corpus stats).
    * One definition so the single-query and batched scorers can never
    * drift on tokenization or the avgdl derivation. */
  private[graft] def bm25Corpus(docs: DataFrame, textCol: String,
      idCol: String): (DataFrame, DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum(col("dl")).as("total_dl")))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    (toks, dl, stats)
  }

  /** The per-(doc, token) BM25 contribution expression over columns
    * (tf, df_docs, dl, n_docs, avgdl) — the ONE definition of the
    * scoring formula, shared by [[bm25Score]] (single query, pivoted
    * term sums) and [[Retrieval.bm25Batch]] (query table, DECIMAL
    * sums). Rounded to 6 dp so downstream sums are reproducible. */
  private[graft] def bm25ContribExpr(k1: Double, b: Double): org.apache.spark.sql.Column = {
    val tfD = col("tf").cast("double")
    val dfD = col("df_docs").cast("double")
    val nD = col("n_docs").cast("double")
    val dlD = col("dl").cast("double")
    val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val denom = tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (dlD / col("avgdl")))
    round(idf * ((tfD * lit(k1 + 1.0)) / denom), 6)
  }

  /** The BM25 scoring core over pre-aggregated inputs — shared verbatim
    * by [[bm25]] (which derives the inputs from the raw corpus) and
    * [[IncrementalText.bm25FromIndex]] (which reads them from a durable
    * index), so the two paths are bit-identical by construction.
    * `tf`: one row per (idCol, token ∈ queryTerms) with its count;
    * `dl`: one row per token-bearing doc with its length;
    * `stats`: one row (n_docs, avgdl). */
  private[graft] def bm25Score(tf: DataFrame, dl: DataFrame, stats: DataFrame,
      queryTerms: Seq[String], k1: Double, b: Double, topK: Int,
      idCol: String): DataFrame = {
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df_docs"))
    val contrib = bm25ContribExpr(k1, b)
    val perTerm = tf.join(broadcast(dfT), Seq("token"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("_c", contrib)
    val termCols = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, col("_c"))).as(s"_c$i")
    }
    val total = queryTerms.indices
      .map(i => coalesce(col(s"_c$i"), lit(0.0)))
      .reduceLeft(_ + _)
    perTerm.groupBy(col(idCol))
      .agg(termCols.head, termCols.tail: _*)
      .select(col(idCol), round(total, 4).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** 64-bit content fingerprint (graft native hash — deterministic across
    * executors, unlike JVM hashCode). */
  def fingerprint(text: Column): Column =
    graft.functions.functions.seeded_hash64(text, lit(0L))

  /** Unigram language-model score per document — the CCNet-style cheap
    * "perplexity" filter: train token → count over the corpus itself,
    * then score each document by the negative mean log-probability of
    * its token stream under that model with add-one smoothing over the
    * vocabulary (p(t) = (c_t + 1) / (N + V)). Lower = more typical of
    * the corpus. Returns (doc_id, n_tokens, nll).
    *
    * Determinism contract: counts are exact integers; each distinct
    * (doc, token) contributes tf · ln((c+1)/(N+V)) in that pinned op
    * order; the per-doc mean is rounded at 6 dp (the tfidf/bm25 ln-seam
    * discipline).
    *
    * Scale shape: tf is the token-stream shuffle every text operator
    * pays; the model lookup is an equi-join on token (broadcast while
    * the vocabulary fits, AQE skew-join otherwise — 'the' is the
    * hottest key); corpus stats are a 1-row broadcast. No window, no
    * driver state. */
  def unigramLogProb(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy("token").agg(sum(col("tf")).as("c"))
    val stats = cnt.agg(sum(col("c")).as("n_total"),
      count(lit(1)).as("vocab"))
    tf.join(cnt, Seq("token"))
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        round(-sum(col("tf").cast("double") *
            log((col("c").cast("double") + lit(1.0)) /
              (col("n_total").cast("double") + col("vocab").cast("double")))) /
          sum(col("tf")).cast("double"), 6).as("nll"))
  }

  /** full per-document text-analysis frame */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      tokenCount(t).as("n_tokens"),
      punctCount(t).as("n_punct"),
      round(stopwordRatio(t), 4).as("stopword_ratio"),
      qualityScore(t).as("quality"),
      languageId(t).as("lang_pred"),
      fingerprint(t).as("fingerprint"))
  }

  /** WINNOWING fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
    * scheme): from the stream of `gram`-token window hashes, every
    * window of `window` consecutive hashes selects its MINIMUM (ties →
    * rightmost), and the distinct selected (pos, hash) pairs are the
    * document's fingerprint set. Guarantee: any shared run of at least
    * `window + gram − 1` tokens yields a shared fingerprint, with only
    * ~2/(window+1) of positions retained — the sub-document overlap
    * index at a fraction of the full gram stream's size.
    *
    * Shapes: the hash stream is the native one-pass
    * [[graft.functions.TaggedWindowHashes]]; per-end minima are one
    * window pass; the rightmost-argmin is resolved by exploding each
    * complete window end into its `window` member positions and
    * equi-joining back (a `window`× fanout of the hash stream — all
    * shuffles on (doc, pos), no band join). Returns
    * `(doc_id, pos, fp_hash)` distinct. */
  def winnow(docs: DataFrame, gram: Int = 5, window: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(gram > 0 && window > 1, s"gram=$gram window=$window")
    import org.apache.spark.sql.expressions.Window
    val g = docs.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.functions.tagged_window_hashes(
          col(textCol), gram, "win:")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("h"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(window - 1), 0)
    val ends = g
      .withColumn("me", min(col("h")).over(frame))
      .withColumn("cnt", count(lit(1)).over(frame))
      .filter(col("cnt") === window) // complete windows only
      .select(col("doc_id"), col("pos").as("e"), col("me"))
    val members = ends.select(col("doc_id"), col("e"), col("me"),
      explode(sequence(lit(0L), lit((window - 1).toLong))).as("i"))
      .select(col("doc_id"), col("e"), col("me"),
        (col("e") - col("i")).as("pos"))
    members.join(g, Seq("doc_id", "pos"))
      .filter(col("h") === col("me")) // the window's minima
      .groupBy(col("doc_id"), col("e"), col("me"))
      .agg(max(col("pos")).as("pos")) // rightmost tie wins
      .select(col("doc_id"), col("pos"), col("me").as("fp_hash"))
      .distinct()
  }
}
