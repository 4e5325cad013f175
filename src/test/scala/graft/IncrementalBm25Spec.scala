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

    // BATCHED scorer from the index equals the corpus-derived batched
    // scorer (shared bm25BatchScore core) — per query AND per rank
    locally {
      import spark.implicits._
      val qt = Seq((1L, "spark"), (1L, "hash"), (2L, "window"),
        (2L, "hash"), (3L, "join")).toDF("qid", "token")
      val fromIdx = IncrementalText.bm25BatchFromIndex(spark, dir, qt,
        perLeg = 12).orderBy("qid", "rank").collect().toSeq
      val fromCorpus = graft.operators.Retrieval.bm25Batch(docs, qt,
        perLeg = 12).orderBy("qid", "rank").collect().toSeq
      assert(fromIdx == fromCorpus,
        s"\nindex:  $fromIdx\ncorpus: $fromCorpus")
      assert(fromIdx.nonEmpty)
    }
  }

  test("upsert re-indexes exactly the changed docs; scores equal one-shot " +
      "over the final corpus; replay is a no-op") {
    val dir = tmpDir("bm25idx-upsert")
    // v1: a third of the corpus indexed with STALE text
    val stale = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .withColumn("text", concat(lit("STALE "), substring(col("text"), 1, 20)))
    val nStale = IncrementalText.bm25Append(spark, dir, stale)
    assert(nStale == stale.count())
    // upsert the TRUE full corpus: the stale third re-indexes (content
    // changed), the other two thirds are novel, nothing else tokenizes
    val (novel, changed) = IncrementalText.bm25Upsert(spark, dir, docs)
    assert(novel == docs.count() - stale.count(), s"novel=$novel")
    assert(changed == stale.count(), s"changed=$changed")
    // scores and stats now equal the one-shot operator over the truth —
    // the superseded postings are dead, the additive stats row carried
    // (new_dl − stale_dl)
    assert(IncrementalText.indexedDocs(spark, dir) == docs.count())
    assertSameScores(
      IncrementalText.bm25FromIndex(spark, dir, terms),
      TextAnalysis.bm25(docs, terms))
    // crash replay: nothing's fingerprint changed the second time
    assert(IncrementalText.bm25Upsert(spark, dir, docs) == ((0L, 0L)))
    // the sibling scorer resolves liveness too
    assert(
      IncrementalText.tfidfTopTermsFromIndex(spark, dir, topK = 3)
        .collect().toSet ==
      TextAnalysis.tfidfTopTerms(docs, topK = 3).collect().toSet)
  }

  test("delete tombstones live docs only; a deleted doc can re-append; " +
      "compaction drops the dead rows without changing a score") {
    val dir = tmpDir("bm25idx-del")
    IncrementalText.bm25Append(spark, dir, docs)
    val gone = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val rest = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val nd = IncrementalText.bm25Delete(spark, dir, gone.select("doc_id"))
    assert(nd == gone.count())
    assert(IncrementalText.indexedDocs(spark, dir) == rest.count())
    assertSameScores(
      IncrementalText.bm25FromIndex(spark, dir, terms),
      TextAnalysis.bm25(rest, terms))
    // double delete / replay: no-op
    assert(IncrementalText.bm25Delete(spark, dir, gone.select("doc_id")) == 0L)
    // a deleted doc re-appends as NOVEL and resurrects (its new version
    // outranks the tombstone)
    val back = docs.filter(pmod(col("doc_id"), lit(14)) === 7)
    assert(IncrementalText.bm25Append(spark, dir, back) == back.count())
    val liveCorpus = rest.unionByName(back)
    assertSameScores(
      IncrementalText.bm25FromIndex(spark, dir, terms),
      TextAnalysis.bm25(liveCorpus, terms))
    assert(IncrementalText.indexedDocs(spark, dir) == liveCorpus.count())
    // compaction physically drops tombstones + superseded postings;
    // scores and stats are bit-identical after
    IncrementalText.compactIndex(spark, dir, partitions = 4)
    assertSameScores(
      IncrementalText.bm25FromIndex(spark, dir, terms),
      TextAnalysis.bm25(liveCorpus, terms))
    assert(IncrementalText.indexedDocs(spark, dir) == liveCorpus.count())
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
