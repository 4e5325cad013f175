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

  test("batched hybrid for one query equals the single-query path") {
    import spark.implicits._
    val q = queryVec
    val queries = Seq((0L, terms)).toDF("qid", "terms")
      .join(emb.filter(col("vec_id") === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")), "qid")
    val batch = graft.operators.Retrieval
      .hybridTopKBatch(docs, emb, queries, k = 10, perLeg = 25)
      .select("doc_id", "lex_rank", "sem_rank", "rrf")
      .collect().toSeq
    val single = graft.operators.Retrieval
      .hybridTopK(docs, emb, terms, q, k = 10, perLeg = 25)
      .collect().toSeq
    assert(batch.map(_.toSeq) == single.map(_.toSeq),
      s"\nbatch:  $batch\nsingle: $single")
  }

  test("IVF knnJoin-fed batched fusion equals the brute cosine leg") {
    import spark.implicits._
    import graft.operators.{IVF, Retrieval}
    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Retrieval.cosineLegBatch(emb, queries, perLeg = 10)
      .withColumnRenamed("vec_id", "doc_id")
    val model = IVF.fitCached(emb, k = 8, sampleN = 256, iters = 4)
    // knnJoin is EXACT top-k (cell pruning is lossless), so after
    // re-ranking by the same rounded key the two legs fuse identically
    val knn = IVF.knnJoin(IVF.index(emb, model), model,
        queries.withColumnRenamed("qvec", "q_embedding"), k = 10)
      .select(col("qid"), col("vec_id").as("doc_id"),
        round(col("cosine"), 4).as("cosine"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col("doc_id"))))
    val lex = Seq.empty[(Long, Long, Int)].toDF("qid", "doc_id", "rank")
    def fuse(sem: org.apache.spark.sql.DataFrame) =
      Retrieval.rrfFuseBatch(Seq(lex, sem), k = 5)
        .orderBy("qid", "rank").collect().toSeq.map(_.toSeq)
    assert(fuse(brute) == fuse(knn))
  }

  test("evaluate: perfect ranking, missed-all, and no-labels edge cases") {
    import spark.implicits._
    import graft.operators.Retrieval
    // q1: relevant docs {1,2} ranked 1,2 — perfect. q2: relevant {9}
    // never retrieved — zeros. q3: no labels at all — NULL metrics.
    val rankings = Seq(
      (1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3),
      (2L, 1L, 1), (2L, 2L, 2),
      (3L, 1L, 1)).toDF("qid", "doc_id", "rank")
    val labels = Seq(
      (1L, 1L, 1.0), (1L, 2L, 1.0),
      (2L, 9L, 1.0)).toDF("qid", "doc_id", "grade")
    val out = Retrieval.evaluate(rankings, labels, k = 3)
      .orderBy("qid").collect()
    val q1 = out(0)
    assert(q1.getDouble(1) == 1.0 && q1.getDouble(2) == 1.0 &&
      q1.getDouble(3) == 1.0, q1)
    val q2 = out(1)
    assert(q2.getDouble(1) == 0.0 && q2.getDouble(2) == 0.0 &&
      q2.getDouble(3) == 0.0, q2)
    val q3 = out(2)
    assert(q3.isNullAt(1) && q3.isNullAt(2) && q3.isNullAt(3), q3)
    // partial: relevant {1,5}, retrieved 1 at rank 2 → recall 1/2,
    // mrr 1/2, ndcg = (1/log2(3)) / (1 + 1/log2(3))
    val r2 = Seq((9L, 7L, 1), (9L, 1L, 2), (9L, 8L, 3))
      .toDF("qid", "doc_id", "rank")
    val l2 = Seq((9L, 1L, 1.0), (9L, 5L, 1.0)).toDF("qid", "doc_id", "grade")
    val o2 = Retrieval.evaluate(r2, l2, k = 3).collect()(0)
    assert(o2.getDouble(1) == 0.5 && o2.getDouble(2) == 0.5)
    val t2 = math.rint(1.0 / (math.log(3.0) / math.log(2.0)) * 1e9) / 1e9
    val want = math.rint(t2 / (1.0 + t2) * 1e6) / 1e6
    assert(math.abs(o2.getDouble(3) - want) < 1e-9, s"${o2.getDouble(3)} vs $want")
  }

  test("mmr demotes near-duplicates of already-picked results") {
    import spark.implicits._
    import graft.operators.Retrieval
    // A and B are near-identical vectors with top scores; C is orthogonal
    // with a lower score. Pure relevance order is A,B,C; MMR at λ=0.5
    // must pick A, then C (B's sim-to-A penalty outweighs its score),
    // then B.
    val cands = Seq((1L, 10L, 1.0), (1L, 11L, 0.95), (1L, 12L, 0.5))
      .toDF("qid", "doc_id", "rrf")
    val vecs = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.999f, 0.01f)),
      (12L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val picks = Retrieval.mmr(cands, vecs, k = 3, lambda = 0.5)
      .orderBy("mmr_rank").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(picks.toSeq == Seq((10L, 1), (12L, 2), (11L, 3)), picks.toSeq)
    // λ=1 is pure relevance: original order restored
    val pure = Retrieval.mmr(cands, vecs, k = 3, lambda = 1.0)
      .orderBy("mmr_rank").collect().map(_.getLong(1))
    assert(pure.toSeq == Seq(10L, 11L, 12L), pure.toSeq)
    // k caps the list per query
    assert(Retrieval.mmr(cands, vecs, k = 2, lambda = 0.5).count() == 2)
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
