package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.functions.{subword_count, subword_pieces}

/** Pluggable tokenizer seam for every token-DENOMINATED operator —
  * packing budgets ([[Packing]]), chunk budgets
  * ([[TextAnalysis.chunksByTokenBudget]]), vocabularies. Real pipelines
  * budget sequences in SUBWORD tokens, not whitespace words; the seam
  * lets the same operator run under either currency:
  *
  *  - [[WhitespaceTokenizer]] — the zero-cost default, identical to the
  *    library's historical `size(split(text, " "))` accounting;
  *  - [[SubwordTokenizer]] — greedy longest-match segmentation against a
  *    piece vocabulary loaded AS DATA (the WordPiece inference rule;
  *    see graft.functions.SubwordPieces for the exact semantics and the
  *    single-char fallback that makes every word tokenize);
  *  - [[BpeTokenizer]] — BPE proper, driven by an ordered MERGES table
  *    (the `merges.txt` artifact real BPE vocabs ship as; see
  *    graft.functions.BpePieces for the pinned inference order);
  *  - [[BpeBytesTokenizer]] — BYTE-level BPE (the GPT-2 vocab family):
  *    regex pre-tokenizer, no case folding, merges in the published
  *    bytes→unicode alphabet (graft.functions.BpeBytesPieces).
  *
  * All faces are pure Column transforms, so whichever tokenizer is
  * plugged in, the operator's plan shape (shuffles, codegen spans) is
  * unchanged — only the per-row counting expression differs.
  */
trait Tokenizer {
  /** token array of a text column */
  def tokens(text: Column): Column
  /** token COUNT of a text column (long) — cheaper than size(tokens)
    * when the implementation can count without materializing pieces */
  def count(text: Column): Column
}

/** Whitespace-word counting — exactly the library's historical
  * `split(text, " ")` semantics (consecutive spaces yield empty tokens,
  * preserved for oracle parity with `string_split`). */
object WhitespaceTokenizer extends Tokenizer {
  override def tokens(text: Column): Column = split(text, " ")
  override def count(text: Column): Column =
    size(split(text, " ")).cast("long")
}

/** Greedy longest-match subword tokenizer over a fixed piece vocabulary.
  * Empty words vanish (they hold no pieces), so `count` is the true
  * subword cost of the document — the number a sequence budget should
  * charge. */
final case class SubwordTokenizer(vocab: Seq[String]) extends Tokenizer {
  override def tokens(text: Column): Column = subword_pieces(text, vocab)
  override def count(text: Column): Column = subword_count(text, vocab)
}

/** BPE-proper tokenizer driven by an ordered merges list — see
  * graft.functions.BpePieces for the exact (rank, position) inference
  * order. The merges table is the deployment artifact real BPE vocabs
  * ship as (a `merges.txt` of ranked pairs). */
final case class BpeTokenizer(merges: Seq[(String, String)])
    extends Tokenizer {
  override def tokens(text: Column): Column =
    graft.functions.functions.bpe_pieces(text, merges)
  override def count(text: Column): Column =
    graft.functions.functions.bpe_count(text, merges)
}

/** Byte-level BPE tokenizer (the GPT-2 vocab family) — regex
  * pre-tokenizer, NO case folding, merges expressed in the published
  * bytes→unicode alphabet; see graft.functions.BpeBytesPieces for the
  * pinned pre-token pattern and inference order. The face that makes
  * budget numbers transferable to a real `merges.txt`. */
final case class BpeBytesTokenizer(merges: Seq[(String, String)])
    extends Tokenizer {
  override def tokens(text: Column): Column =
    graft.functions.functions.bpe_bytes_pieces(text, merges)
  override def count(text: Column): Column =
    graft.functions.functions.bpe_bytes_count(text, merges)
}

object BpeBytesTokenizer {
  /** Load a merges table (columns a, b, rank) expressed in the byte
    * alphabet — bounded collect as [[BpeTokenizer.fromTable]]. */
  def fromTable(mergesDf: DataFrame, aCol: String = "a", bCol: String = "b",
      rankCol: String = "rank"): BpeBytesTokenizer =
    BpeBytesTokenizer(mergesDf.select(col(aCol), col(bCol), col(rankCol))
      .collect().sortBy(_.getAs[Number](2).longValue())
      .map(r => (r.getString(0), r.getString(1))).toSeq)

  /** The mapped space byte-char (0x20 → U+0120): GPT-2 merges spell
    * word-leading pieces with it. */
  val G: String = "\u0120"

  /** Fixture merges shared verbatim with the oracle SQL: ASCII letters
    * map to themselves in the byte alphabet, so only the space-prefixed
    * entries differ from a char-level table — exactly the byte-level
    * behavior the char face cannot express (" the" → one `Ġthe` piece). */
  val demoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), (G, "th"), (G + "th", "e"), ("i", "n"), ("in", "g"),
    ("e", "r"), ("a", "n"), ("o", "n"), ("r", "e"), ("a", "t"),
    ("e", "n"), ("o", "r"), ("e", "s"), (G, "a"), (G, "s"),
    ("s", "t"), (G + "a", "n"), (G + "an", "d"), (G, "o"), (G + "o", "f"))
}

object BpeTokenizer {
  /** Load a merges table (columns a, b, rank) — rank order is the merge
    * priority. Bounded collect, same discipline as
    * [[SubwordTokenizer.fromTable]]. */
  def fromTable(mergesDf: DataFrame, aCol: String = "a", bCol: String = "b",
      rankCol: String = "rank"): BpeTokenizer =
    BpeTokenizer(mergesDf.select(col(aCol), col(bCol), col(rankCol))
      .collect().sortBy(_.getAs[Number](2).longValue())
      .map(r => (r.getString(0), r.getString(1))).toSeq)

  /** Fixture merges shared verbatim with the oracle SQL: a small ladder
    * that exercises multi-level merges (t+h → th, th+e → the,
    * th+ing → thing). */
  val demoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("e", "r"),
    ("a", "n"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("s", "t"), ("a", "r"), ("th", "ing"),
    ("an", "d"), ("t", "o"), ("o", "f"), ("i", "s"), ("the", "m"))
}

object SubwordTokenizer {
  /** Load a vocabulary from a table — the "vocab as data" path: a real
    * deployment keeps its merges/vocab file as a tiny table next to the
    * corpus. The collect is vocab-sized BY DEFINITION (a vocabulary is
    * a bounded artifact, ~10⁴-10⁵ rows for production BPE vocabs), the
    * same bounded-collect discipline as IVF centroid training. Sorted
    * for a deterministic plan fingerprint regardless of table order. */
  def fromTable(vocabDf: DataFrame, column: String = "token")
      : SubwordTokenizer =
    SubwordTokenizer(vocabDf.select(col(column)).collect()
      .map(_.getString(0)).toSeq.sorted)

  /** The fixture vocabulary the oracle queries share (embedded verbatim
    * in their DuckDB SQL): common English suffix/digram pieces — small
    * enough to audit, rich enough that segmentation is non-trivial
    * ("theater" → the·a·t·er, "thing" → th·ing). */
  val demoVocab: Seq[String] = Seq(
    "the", "ing", "tion", "ent", "ver", "th", "he", "in", "er", "an",
    "re", "on", "at", "en", "ed", "es", "or", "te", "st", "ar")
}
