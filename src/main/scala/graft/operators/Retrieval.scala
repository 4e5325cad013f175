package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.functions.cosine_similarity

/** Hybrid retrieval: fuse a lexical (BM25) leg and a semantic
  * (embedding-cosine) leg with reciprocal-rank fusion (RRF, Cormack &
  * Clarke SIGIR'09 — public method). This is the standard first-stage
  * retriever of an LLM data/RAG pipeline: each leg retrieves its own
  * top-`perLeg` candidates, and a document's fused score is
  * Σ_legs 1/(c + rank_leg), with a leg contributing 0 when the document
  * is outside that leg's candidate list.
  *
  * Scale shape: each leg is an independent top-k — BM25 is map-side
  * partial aggregation + TakeOrderedAndProject (or the durable inverted
  * index via [[IncrementalText.bm25FromIndex]], which shares the scoring
  * core bit-for-bit), the vector leg is one narrow scan with a codegen
  * dot product (or the IVF index probing only qualifying cells). The
  * fusion itself touches ≤ Σ perLeg rows — driver-trivial at ANY corpus
  * size, so the whole operator costs max(leg costs), never a corpus-wide
  * join. Ranks are computed over the ROUNDED leg scores (4 dp, the same
  * rounding the leg oracles use) with an id tie-break, so rank order is
  * reproducible across engines and float accumulation orders.
  */
object Retrieval {

  /** Generic reciprocal-rank fusion. Each leg is a DataFrame holding
    * `idCol` and `rankCol` (1-based, dense or row_number — caller's
    * choice, standard RRF uses row_number). Returns the top `k` ids by
    * fused score with each leg's rank preserved (`rank_0..rank_{n-1}`,
    * NULL where the leg missed the doc).
    *
    * The fused score is a sum of exact IEEE reciprocals (1/(c+rank) with
    * integer c+rank), so the ordering is engine-reproducible — two legs'
    * worth of double addition is commutative and exact-rounded the same
    * everywhere. */
  def rrfFuse(legs: Seq[DataFrame], k: Int = 10, c: Int = 60,
      idCol: String = "doc_id", rankCol: String = "rank"): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    require(c >= 1, s"rrf constant must be >= 1, got $c")
    val renamed = legs.zipWithIndex.map { case (leg, i) =>
      leg.select(col(idCol), col(rankCol).cast("long").as(s"rank_$i"))
    }
    val joined = renamed.reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val contribs = legs.indices.map(i =>
      coalesce(lit(1.0) / (lit(c) + col(s"rank_$i")).cast("double"), lit(0.0)))
    val fused = contribs.reduceLeft(_ + _)
    joined
      .select((col(idCol) +: legs.indices.map(i => col(s"rank_$i"))) :+
        fused.as("_rrf"): _*)
      .orderBy(col("_rrf").desc, col(idCol))
      .limit(k)
      .select((col(idCol) +: legs.indices.map(i => col(s"rank_$i"))) :+
        round(col("_rrf"), 6).as("rrf"): _*)
  }

  /** 1-based rank column over (scoreCol DESC, idCol ASC). The input is a
    * leg's top-`perLeg` candidate list — bounded rows by construction —
    * so the unpartitioned window is a deliberate single-task sort over a
    * handful of rows, not a scale hazard. */
  private def ranked(leg: DataFrame, scoreCol: String, idCol: String): DataFrame =
    leg.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol))))

  /** Semantic candidate leg: exact cosine top-`perLeg` of `queryVec`,
    * scores rounded to 4 dp BEFORE the top-k order (so candidate
    * selection and ranks are stable across float32/float64 accumulation
    * differences between engines). One narrow scan, zero shuffles. */
  def cosineLeg(emb: DataFrame, queryVec: Seq[Float], perLeg: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    emb.select(col(idCol),
        round(cosine_similarity(col(embCol), q), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(perLeg)
  }

  /** Hybrid BM25 + embedding-cosine retrieval with RRF fusion.
    *
    * `docs` supplies the lexical leg over `textCol` (scored by
    * [[TextAnalysis.bm25]] — or pass `lexLeg` from a durable index);
    * `emb` supplies the semantic leg over `embCol` with ids in
    * `embIdCol` joined to the documents' `idCol`. Output:
    * (idCol, lex_rank, sem_rank, rrf) — top `k` by fused score,
    * leg ranks NULL where that leg missed the document. */
  def hybridTopK(docs: DataFrame, emb: DataFrame, queryTerms: Seq[String],
      queryVec: Seq[Float], k: Int = 10, perLeg: Int = 50, c: Int = 60,
      idCol: String = "doc_id", textCol: String = "text",
      embIdCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val lex = ranked(
      TextAnalysis.bm25(docs, queryTerms, topK = perLeg,
        textCol = textCol, idCol = idCol),
      "bm25", idCol)
    val sem = ranked(
      cosineLeg(emb, queryVec, perLeg, embIdCol, embCol)
        .withColumnRenamed(embIdCol, idCol),
      "cosine", idCol)
    rrfFuse(Seq(lex, sem), k, c, idCol)
      .withColumnRenamed("rank_0", "lex_rank")
      .withColumnRenamed("rank_1", "sem_rank")
  }

  /** Index-backed hybrid retrieval: identical fusion semantics to
    * [[hybridTopK]] but each leg reads a durable index instead of the
    * corpus — BM25 from the incremental inverted index (bit-identical
    * scoring core) and cosine from pre-stored vectors. This is the
    * 100 TB path: neither leg re-tokenizes or re-scans raw text. */
  def hybridTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      bm25IndexDir: String, emb: DataFrame, queryTerms: Seq[String],
      queryVec: Seq[Float], k: Int = 10, perLeg: Int = 50, c: Int = 60,
      idCol: String = "doc_id",
      embIdCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val lex = ranked(
      IncrementalText.bm25FromIndex(spark, bm25IndexDir, queryTerms,
        topK = perLeg, idCol = idCol),
      "bm25", idCol)
    val sem = ranked(
      cosineLeg(emb, queryVec, perLeg, embIdCol, embCol)
        .withColumnRenamed(embIdCol, idCol),
      "cosine", idCol)
    rrfFuse(Seq(lex, sem), k, c, idCol)
      .withColumnRenamed("rank_0", "lex_rank")
      .withColumnRenamed("rank_1", "sem_rank")
  }
}
