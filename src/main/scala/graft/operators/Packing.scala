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

  /** Greedy NEXT-FIT document packing — the no-straddling recipe: each
    * document lands whole in the current pack if it fits, else opens the
    * next pack (a document longer than `budget` occupies a pack alone).
    * Output matches [[concatSlicePack]]: `pack_seq`/`pack_offset` per doc.
    *
    * This is a SEQUENTIAL RECURRENCE per group (pack state depends on
    * every earlier placement — a 6+6 over budget 10 is decided by what
    * preceded the first 6), so no window/prefix-sum form exists. The
    * honest Spark shape is the secondary-sort pattern: ONE hash exchange
    * on the group, sort within partitions by (group, order), then a
    * LINEAR per-partition pass carrying (pack, offset) — the rare case
    * where the prompt's "mapPartitions as a last resort" is the right
    * tool, and the only RDD hop in the library. State per task is two
    * longs; skew is bounded by the largest group, same as the window in
    * [[concatSlicePack]].
    *
    * @param order unique per row within a group, or placement is ambiguous
    */
  def greedyPack(df: DataFrame, group: Column, order: Column,
      tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget=$budget")
    val marked = df.withColumn("_gp_g", group)
      .withColumn("_gp_t", tokens.cast("long"))
      .withColumn("_gp_o", order)
    val parts = marked.repartition(col("_gp_g"))
      .sortWithinPartitions(col("_gp_g"), col("_gp_o"))
    val outSchema = org.apache.spark.sql.types.StructType(
      parts.schema.fields :+
        org.apache.spark.sql.types.StructField("pack_seq",
          org.apache.spark.sql.types.LongType, nullable = false) :+
        org.apache.spark.sql.types.StructField("pack_offset",
          org.apache.spark.sql.types.LongType, nullable = false))
    val gi = parts.schema.fieldIndex("_gp_g")
    val ti = parts.schema.fieldIndex("_gp_t")
    val b = budget.toLong
    // Dataset.mapPartitions (not an RDD hop): the exchange + local sort
    // stay visible in ONE query plan (pinned in PlanShapeSpec), and the
    // linear pass composes with AQE like any other operator
    val packed = parts.mapPartitions { it =>
      var curG: Any = null
      var started = false
      var pack = 0L
      var off = 0L // tokens already placed in the current pack
      it.map { r =>
        val g = r.get(gi)
        val t = r.getLong(ti)
        val sameGroup = started &&
          (if (g == null) curG == null else g.equals(curG))
        if (!sameGroup) { curG = g; started = true; pack = 0L; off = 0L }
        if (off + t <= b && (sameGroup && off > 0L)) {
          val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pack :+ off)
          off += t
          out
        } else {
          if (sameGroup && off > 0L) pack += 1
          val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pack :+ 0L)
          off = t
          out
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    packed.drop("_gp_g", "_gp_t", "_gp_o")
  }
}
