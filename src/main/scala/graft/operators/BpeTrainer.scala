package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge TRAINING (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the missing half of
  * the tokenizer seam: [[BpeTokenizer.fromTable]] loads a merges table,
  * this learns one from a corpus.
  *
  * Algorithm (classic BPE, deterministic):
  *   1. corpus → word-frequency table (split on single spaces, empty
  *      tokens dropped), each word as its character symbol sequence;
  *   2. repeat `numMerges` times: count every ADJACENT symbol pair
  *      weighted by word frequency (overlapping occurrences each count —
  *      `[a,a,a]` contributes (a,a) twice, the reference counting), pick
  *      the max-count pair with lexicographic (a, b) tie-break, record it
  *      as the next merge, and apply it to every word LEFT-TO-RIGHT
  *      greedily (the same order `replace` and the published BPE
  *      implementations use — `[a,a,a]` under (a,a) becomes `[aa,a]`).
  *
  * The 100 TB shape: everything iterates over the DISTINCT-WORD table —
  * corpus text is scanned exactly once to build it, and distinct words
  * are typically 4-6 orders of magnitude smaller than corpus bytes. Each
  * merge round costs two passes over that table (pair count + merge
  * application, both codegen higher-order functions — no UDFs) plus a
  * single-row argmax collect; `localCheckpoint` truncates the per-round
  * lineage so round k doesn't replan k rewrites. No driver materialization
  * of the word table at any size.
  */
object BpeTrainer {

  /** left-to-right greedy application of one merge to a symbol array */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** corpus → (syms array, freq) over DISTINCT words */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"), col("freq"))

  /** Learn `numMerges` ranked merges. Returns (rank, a, b) — k driver
    * rows by definition (each round's argmax is one row); stops early if
    * the corpus runs out of adjacent pairs. */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text")
      : Seq[(Int, String, String)] = {
    val spark = docs.sparkSession
    var cur = wordTable(docs, textCol).localCheckpoint()
    val merges = ArrayBuffer.empty[(Int, String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val best = cur
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS a, " +
            "element_at(syms, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r) = (best.head.getString(0), best.head.getString(1))
        merges += ((i, l, r))
        cur = cur.select(applyMerge(col("syms"), l, r).as("syms"),
          col("freq")).localCheckpoint()
        i += 1
      }
    }
    merges.toSeq
  }

  /** [[train]] as a (rank, a, b) DataFrame — the exact shape
    * [[BpeTokenizer.fromTable]] loads. */
  def trainDF(docs: DataFrame, numMerges: Int, textCol: String = "text")
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, numMerges, textCol).toDF("rank", "a", "b")
  }
}
