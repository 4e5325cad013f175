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
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"size=$size overlap=$overlap")
    val stride = size - overlap
    val toks = split(text, " ")
    val starts = sequence(lit(0),
      greatest(org.apache.spark.sql.functions.size(toks) - 1, lit(0)),
      lit(stride))
    transform(starts, s => array_join(slice(toks, s + 1, lit(size)), " "))
  }

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

  /** 64-bit content fingerprint (graft native hash — deterministic across
    * executors, unlike JVM hashCode). */
  def fingerprint(text: Column): Column =
    graft.functions.functions.seeded_hash64(text, lit(0L))

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
}
