package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Hand-computed semantics for segment-level dedup and blocked fuzzy
  * match, plus the no-cartesian plan contract for the fuzzy join. */
class SegmentDedupSpec extends AnyFunSuite {
  import TestSparkSession._

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("segmentDedup keeps corpus-first segments and drops empty docs") {
    val d = docs(
      1L -> "a b c d", // segs: [a b][c d] — both first
      2L -> "a b x y", // [a b] dup of doc1, [x y] novel
      3L -> "c d a b") // both segments already seen → doc disappears
    val got = Dedup.segmentDedup(d, segTokens = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 2L, "a b c d"),
      (2L, 1L, "x y")))
  }

  test("segmentDedup removes within-doc repeats too") {
    val d = docs(7L -> "a b a b")
    val got = Dedup.segmentDedup(d, segTokens = 2).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 1L && got(0).getString(2) == "a b")
  }

  test("segmentDedup reassembles out-of-order collect deterministically") {
    // 5 segments, all unique → reassembled text must equal the original
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = Dedup.segmentDedup(docs(1L -> text), segTokens = 2).collect()
    assert(got(0).getString(2) == text)
  }

  test("fuzzyNearest: argmin with (dist, id) tie-break, block isolation") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "abcd", "X"), (2L, "abce", "X"), (3L, "zzzz", "X"),
      (4L, "solo", "Y")) // singleton block → no output row
      .toDF("doc_id", "text", "source")
    val got = Dedup.fuzzyNearest(d, col("source"), prefixChars = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L), (2L, 1L, 1L),
      (3L, 1L, 4L))) // dist ties (4,4) break to the smaller id
  }

  test("fuzzyNearest plans an equi-join on the block key, no cartesian") {
    val plan = Dedup.fuzzyNearest(
        graft.sources.Tables.documents(spark, sf0001), col("source"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
