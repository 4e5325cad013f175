package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims

/** Sequence packing (north-star pipeline mandate — no reference
  * counterpart): assign documents to fixed-token-budget training
  * sequences, the step that turns a curated corpus into model inputs.
  *
  * This implements CONCAT-AND-SLICE packing — the dominant LLM recipe:
  * the group's documents are concatenated in a deterministic order into
  * one token stream, which is sliced into budget-sized windows;
  * documents may straddle a slice boundary (training handles that with
  * attention masking / document-boundary tokens). Each document is
  * labeled with the pack where it STARTS and its token offset inside
  * that pack, which is exactly what a downstream tokenizer-writer needs
  * to materialize the packs.
  *
  * Relationally the whole operator is ONE window cumsum: `pack_seq =
  * floor(exclusive_running_tokens / budget)`, `pack_offset = running %
  * budget`. No iteration, no driver participation, fully deterministic.
  * (Document-level greedy first-fit — no straddling — is inherently a
  * sequential recurrence per group, NOT expressible as a prefix sum;
  * per-group `mapPartitions` could do it, but concat-and-slice is both
  * the cheaper plan and the more common production semantics.)
  *
  * Scale notes: groups (source / language / length bucket) bound each
  * window partition, so skew is capped by the largest group and packs
  * never cross groups — which is also what mixing wants (a pack of
  * same-domain documents). A single global stream would be one
  * partition — deliberately not offered.
  */
object Packing {

  /** columns of `df` + `pack_seq` (pack index within the group, 0-based)
    * + `pack_offset` (token offset of this document's start inside its
    * pack).
    *
    * @param group   independent packing domain (packs never cross it)
    * @param order   deterministic intra-group order; must be unique per
    *                row (an id column) or pack assignment is ambiguous
    * @param tokens  per-row token count (int/long column)
    * @param budget  tokens per pack slice
    */
  def concatSlicePack(df: DataFrame, group: Column, order: Column,
      tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget=$budget")
    val w = Window.partitionBy(group).orderBy(order)
    val before = coalesce(
      sum(tokens.cast("long")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    // Integer division, NOT floor(double divide): a double quotient is
    // only exact below 2^53, and a 100 TB corpus's per-group running sum
    // can't be trusted to stay there. IntegralDivide is the codegen'd
    // long/long `div` (same operator as SQL `//`).
    val seq = Shims.column(IntegralDivide(
      Shims.expression(before), Shims.expression(lit(budget.toLong))))
    df.withColumn("pack_seq", seq)
      .withColumn("pack_offset", before % lit(budget.toLong))
  }
}
