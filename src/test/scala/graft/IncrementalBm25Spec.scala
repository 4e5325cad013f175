package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalText, TextAnalysis}
import graft.sources.Tables

/** Differential correctness of the incremental BM25 index: scores from
  * the durable index must equal [[TextAnalysis.bm25]] over the same
  * documents at every point of the append history, and re-sent batches
  * must be no-ops. */
class IncrementalBm25Spec extends AnyFunSuite {
  import TestSparkSession._

  private def docs: DataFrame = Tables.documents(spark, sf0001)
  private val terms = Seq("spark", "hash", "window")

  private def assertSameScores(a: DataFrame, b: DataFrame): Unit = {
    val (ra, rb) = (a.collect().toSeq, b.collect().toSeq)
    assert(ra == rb, s"\nindex: $ra\nbatch: $rb")
  }

  test("index scores equal batch bm25 across appends; dup batch is a no-op") {
    val dir = tmpDir("bm25idx")
    val b1 = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val b2 = docs.filter(pmod(col("doc_id"), lit(3)) === 0)

    val n1 = IncrementalText.bm25Append(spark, dir, b1)
    assert(n1 == b1.count())
    assertSameScores(
      IncrementalText.bm25FromIndex(spark, dir, terms),
      TextAnalysis.bm25(b1, terms))

    // second append: only the new docs tokenize; scores now match the
    // full corpus
    val n2 = IncrementalText.bm25Append(spark, dir, b2)
    assert(n2 == b2.count())
    assertSameScores(
      IncrementalText.bm25FromIndex(spark, dir, terms),
      TextAnalysis.bm25(docs, terms))
    assert(IncrementalText.indexedDocs(spark, dir) == docs.count())

    // re-sending an already-indexed batch (crash replay) is a no-op
    assert(IncrementalText.bm25Append(spark, dir, b1) == 0L)
    assertSameScores(
      IncrementalText.bm25FromIndex(spark, dir, terms),
      TextAnalysis.bm25(docs, terms))

    // compaction rewrites the index token-clustered without changing
    // a single score
    IncrementalText.compactIndex(spark, dir, partitions = 4)
    assertSameScores(
      IncrementalText.bm25FromIndex(spark, dir, terms),
      TextAnalysis.bm25(docs, terms))

    // plan pin: the scoring scan pushes the term filter to parquet —
    // at scale the token-clustered row groups prune to ~the terms' rows
    val scored = IncrementalText.bm25FromIndex(spark, dir, terms)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(token"),
      s"term filter not pushed to the tf scan:\n$plan")

    // one index, many scorers: TF-IDF keyword extraction from the same
    // tokenize-once batches equals the one-shot operator
    assert(
      IncrementalText.tfidfTopTermsFromIndex(spark, dir, topK = 3)
        .collect().toSet ==
      TextAnalysis.tfidfTopTerms(docs, topK = 3).collect().toSet)
  }

  test("empty and token-free documents count toward n_docs like batch bm25") {
    val dir = tmpDir("bm25idx-empty")
    import spark.implicits._
    val withEmpty = docs.limit(50)
      .unionByName(Seq((900001L, "   "), (900002L, ""))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", lit(0L)))
    IncrementalText.bm25Append(spark, dir, withEmpty)
    assert(IncrementalText.indexedDocs(spark, dir) == 52L)
    assertSameScores(
      IncrementalText.bm25FromIndex(spark, dir, terms),
      TextAnalysis.bm25(withEmpty, terms))
  }
}
