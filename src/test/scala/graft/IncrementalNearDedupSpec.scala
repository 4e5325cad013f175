package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, IncrementalDedup}
import graft.sources.Tables

/** Incremental near-dup index semantics: history drops resends, phase
  * order equals the one-shot drop-if-any-earlier result, and the
  * sub-shingle escape hatch. */
class IncrementalNearDedupSpec extends AnyFunSuite {
  import TestSparkSession._

  test("re-sending an already-indexed batch drops every shingled doc") {
    val docs = Tables.documents(spark, sf0001)
    val idx = IncrementalDedup.scratchIndexDir(spark, "near-resend")
    val first = IncrementalDedup.nearDedupAppend(spark, idx, docs, 0.5)
    assert(first.count() > 0)
    val again = IncrementalDedup.nearDedupAppend(spark, idx, docs, 0.5)
    // every doc with >=1 shingle is its own J=1.0 neighbor in history;
    // only docs too short to shingle can survive a resend
    val shingled = docs
      .filter(size(Dedup.shingles(col("text"), 3)) > 0)
      .count()
    assert(again.count() == docs.count() - shingled,
      s"resend kept ${again.count()} of ${docs.count()} ($shingled shingled)")
  }

  test("phased appends equal the one-shot drop-if-any-earlier semantics") {
    val docs = Tables.documents(spark, sf0001)
      .withColumn("phase", pmod(col("doc_id"), lit(3)))
    val idx = IncrementalDedup.scratchIndexDir(spark, "near-phases")
    val kept = (0 to 2).map { ph =>
      IncrementalDedup.nearDedupAppend(spark, idx,
        docs.filter(col("phase") === ph), 0.5)
    }.reduce(_.unionByName(_))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // reference: exact pair set; doc dropped iff an earlier (phase, id)
    // neighbor exists — kept or not
    val order = docs.select("doc_id", "phase").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.ngramJaccardPairs(
        Tables.documents(spark, sf0001), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def earlier(a: Long, b: Long) = // (phase, id) lexicographic
      order(a) < order(b) || (order(a) == order(b) && a < b)
    val dropped = pairs.flatMap { case (a, b) =>
      Seq(if (earlier(a, b)) Some(b) else None,
        if (earlier(b, a)) Some(a) else None).flatten
    }.toSet
    val expect = order.keySet -- dropped
    assert(kept == expect,
      s"missing=${expect -- kept} extra=${kept -- expect}")
  }

  test("docs too short to shingle always survive and are never indexed") {
    val s = spark
    import s.implicits._
    val idx = IncrementalDedup.scratchIndexDir(spark, "near-short")
    val b1 = Seq((1L, "only two")).toDF("doc_id", "text")
    val k1 = IncrementalDedup.nearDedupAppend(spark, idx, b1, 0.5)
    assert(k1.count() == 1)
    // the same short text again: still kept (nothing was indexed)
    val b2 = Seq((2L, "only two")).toDF("doc_id", "text")
    val k2 = IncrementalDedup.nearDedupAppend(spark, idx, b2, 0.5)
    assert(k2.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
