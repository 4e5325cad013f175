package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalText, Retrieval}
import graft.sources.Tables

/** Hybrid RRF retrieval: fusion semantics (missing-leg nulls, rank
  * reciprocals, tie-breaks), corpus-vs-index path equality, and the
  * bounded-fusion scale shape. */
class RetrievalSpec extends AnyFunSuite {
  import TestSparkSession._

  private def docs: DataFrame = Tables.documents(spark, sf0001)
  private def emb: DataFrame = Tables.embeddings(spark, sf0001)
  private val terms = Seq("spark", "hash", "window")

  private def queryVec: Seq[Float] =
    emb.filter(col("vec_id") === 0).select("embedding")
      .first().getSeq[Float](0)

  test("rrfFuse: reciprocal arithmetic, missing legs contribute zero") {
    import spark.implicits._
    // doc 1 ranks 1/1, doc 2 only lexical rank 2, doc 3 only semantic rank 2
    val lex = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val sem = Seq((1L, 1), (3L, 2)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, sem), k = 10, c = 60)
      .orderBy(col("doc_id")).collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    assert(byId(1L) == ((Some(1L), Some(1L),
      math.rint(2.0 / 61.0 * 1e6) / 1e6)))
    assert(byId(2L)._1 == Some(2L) && byId(2L)._2 == None)
    assert(byId(2L)._3 == math.rint(1.0 / 62.0 * 1e6) / 1e6)
    assert(byId(3L)._1 == None && byId(3L)._2 == Some(2L))
    // doc 1 (two legs) outranks single-leg docs; k cuts after sort
    val top1 = Retrieval.rrfFuse(Seq(lex, sem), k = 1, c = 60).collect()
    assert(top1.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("hybrid top-k from corpus equals hybrid top-k from durable indexes") {
    val dir = tmpDir("hybrid_bm25")
    // two appends — the index path must reproduce the one-shot corpus leg
    IncrementalText.bm25Append(spark, dir,
      docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    IncrementalText.bm25Append(spark, dir,
      docs.filter(pmod(col("doc_id"), lit(2)) === 0))
    val q = queryVec
    val fromCorpus = Retrieval.hybridTopK(docs, emb, terms, q,
      k = 10, perLeg = 25).collect().toSeq
    val fromIndex = Retrieval.hybridTopKFromIndex(spark, dir, emb, terms, q,
      k = 10, perLeg = 25).collect().toSeq
    assert(fromCorpus == fromIndex,
      s"\ncorpus: $fromCorpus\nindex:  $fromIndex")
    assert(fromCorpus.nonEmpty && fromCorpus.size <= 10)
  }

  test("fusion is bounded by the legs: at most 2*perLeg candidates, ranks <= perLeg") {
    val out = Retrieval.hybridTopK(docs, emb, terms, queryVec,
      k = 1000, perLeg = 7).collect()
    assert(out.length <= 14)
    out.foreach { r =>
      val l = Option(r.get(1)).map(_.asInstanceOf[Long])
      val s = Option(r.get(2)).map(_.asInstanceOf[Long])
      assert(l.isDefined || s.isDefined)
      assert(l.forall(x => x >= 1 && x <= 7) && s.forall(x => x >= 1 && x <= 7))
    }
    // fused ordering is total and deterministic: rrf descending
    val rrfs = Retrieval.hybridTopK(docs, emb, terms, queryVec,
      k = 20, perLeg = 7).collect().map(_.getDouble(3)).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }
}
