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
      idCol: String = "doc_id", rankCol: String = "rank"): DataFrame =
    // the single-query form IS the batch form under one constant query
    // id — one fusion implementation, no drift
    rrfFuseBatch(
      legs.map(_.select(lit(0L).as("_q"), col(idCol),
        col(rankCol).as("rank"))),
      k, c, qidCol = "_q", idCol = idCol)
      .drop("_q", "rank")

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

  // ------------------------------------------------------------------
  // batched retrieval: one query TABLE, per-query top-k — the scale face
  // (a single query is a driver-side toy; real retrieval workloads score
  // thousands of queries per pass)
  // ------------------------------------------------------------------

  /** Batched BM25: score every (query, doc) pair sharing a term, one
    * row of output per query × candidate, ranked per query.
    *
    * `queryTerms`: (qidCol, "token") — one row per query term (distinct
    * per query). The per-(doc, token) contribution is query-independent,
    * so it is computed ONCE over the union of all queries' terms (the
    * token stream prunes with one semi-join before the shuffle) and then
    * joined to the query table — the corpus is tokenized once no matter
    * how many queries score. Per-query totals sum the 6-dp-rounded
    * contributions in DECIMAL (exact, order-independent — a double sum's
    * value would depend on aggregation order), then round to 4 dp like
    * the single-query path; ranks order by (rounded score, doc id).
    *
    * Scale shape: tokenize+tf is the single-query plan unchanged; the
    * query join adds one broadcast (queries × terms is tiny) and the
    * per-query rank windows shuffle candidate rows keyed by query id —
    * candidates, never the corpus. */
  def bm25Batch(docs: DataFrame, queryTerms: DataFrame, perLeg: Int = 50,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id", qidCol: String = "qid"): DataFrame = {
    // corpus derivation and the contribution formula are the SHARED
    // definitions (TextAnalysis.bm25Corpus / bm25ContribExpr) — the
    // batched scorer can never drift from the single-query one
    val (toks, dl, stats) = TextAnalysis.bm25Corpus(docs, textCol, idCol)
    val terms = queryTerms.select(col("token")).distinct()
    val tf = toks.join(broadcast(terms), Seq("token"), "left_semi")
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    bm25BatchScore(tf, dl, stats, queryTerms, perLeg, k1, b, idCol, qidCol)
  }

  /** The batched scoring core over pre-aggregated inputs — shared
    * verbatim by [[bm25Batch]] (corpus-derived) and
    * [[IncrementalText.bm25BatchFromIndex]] (durable-index-served), so
    * the two paths are bit-identical by construction. `tf`: one row per
    * (idCol, token ∈ some query's terms) for LIVE docs; `dl`: doc
    * lengths; `stats`: one row (n_docs, avgdl). */
  private[graft] def bm25BatchScore(tf: DataFrame, dl: DataFrame,
      stats: DataFrame, queryTerms: DataFrame, perLeg: Int,
      k1: Double, b: Double, idCol: String, qidCol: String): DataFrame = {
    val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("df_docs"))
    val perDocToken = tf.join(broadcast(dfT), Seq("token"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col("token"), col(idCol),
        TextAnalysis.bm25ContribExpr(k1, b).as("_c"))
    val scored = queryTerms.join(perDocToken, Seq("token"))
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(col("_c").cast("decimal(18,6)")).cast("double"), 4)
        .as("bm25"))
    scored.withColumn("rank", row_number().over(Window
        .partitionBy(col(qidCol)).orderBy(col("bm25").desc, col(idCol))))
      .filter(col("rank") <= perLeg)
  }

  /** Batched semantic leg: per-query exact cosine top-`perLeg` with a
    * broadcast of the query table against one corpus scan — the default
    * for query batches that broadcast. For corpus-scale query sets, feed
    * [[rrfFuseBatch]] from [[IVF.knnJoin]] instead (cell-pruned, no
    * cartesian); re-rank its output by the same rounded key first. */
  def cosineLegBatch(emb: DataFrame, queries: DataFrame, perLeg: Int = 50,
      idCol: String = "vec_id", embCol: String = "embedding",
      qidCol: String = "qid", qEmbCol: String = "qvec"): DataFrame =
    emb.crossJoin(broadcast(queries.select(col(qidCol), col(qEmbCol))))
      .select(col(qidCol), col(idCol),
        round(cosine_similarity(col(embCol), col(qEmbCol)), 4).as("cosine"))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))))
      .filter(col("rank") <= perLeg)

  /** Per-query RRF fusion of batched legs: each leg holds
    * (qidCol, idCol, "rank"). Output: top `k` per query by fused score
    * with per-leg ranks preserved (`rank_0..`, NULL where missed). */
  def rrfFuseBatch(legs: Seq[DataFrame], k: Int = 10, c: Int = 60,
      qidCol: String = "qid", idCol: String = "doc_id"): DataFrame = {
    require(legs.nonEmpty, "rrfFuseBatch needs at least one leg")
    require(c >= 1, s"rrf constant must be >= 1, got $c")
    val renamed = legs.zipWithIndex.map { case (leg, i) =>
      leg.select(col(qidCol), col(idCol),
        col("rank").cast("long").as(s"rank_$i"))
    }
    val joined = renamed.reduceLeft(
      (a, b) => a.join(b, Seq(qidCol, idCol), "full_outer"))
    val contribs = legs.indices.map(i =>
      coalesce(lit(1.0) / (lit(c) + col(s"rank_$i")).cast("double"), lit(0.0)))
    val fused = contribs.reduceLeft(_ + _)
    joined.withColumn("_rrf", fused)
      .withColumn("rank", row_number().over(Window
        .partitionBy(col(qidCol)).orderBy(col("_rrf").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select((col(qidCol) +: col(idCol) +:
        legs.indices.map(i => col(s"rank_$i"))) ++
        Seq(round(col("_rrf"), 6).as("rrf"), col("rank")): _*)
  }

  /** Batched hybrid retrieval: per-query BM25 + cosine legs fused by
    * RRF. `queries`: one row per query — (qidCol, termsCol array of
    * distinct terms, qEmbCol embedding). Output: top `k` docs per query,
    * (qid, doc_id, lex_rank, sem_rank, rrf, rank). */
  def hybridTopKBatch(docs: DataFrame, emb: DataFrame, queries: DataFrame,
      k: Int = 10, perLeg: Int = 50, c: Int = 60,
      idCol: String = "doc_id", textCol: String = "text",
      embIdCol: String = "vec_id", embCol: String = "embedding",
      qidCol: String = "qid", termsCol: String = "terms",
      qEmbCol: String = "qvec"): DataFrame = {
    val queryTerms = queries.select(col(qidCol),
      explode(array_distinct(col(termsCol))).as("token"))
    val lex = bm25Batch(docs, queryTerms, perLeg,
      textCol = textCol, idCol = idCol, qidCol = qidCol)
    val sem = cosineLegBatch(emb, queries, perLeg,
        idCol = embIdCol, embCol = embCol, qidCol = qidCol,
        qEmbCol = qEmbCol)
      .withColumnRenamed(embIdCol, idCol)
    rrfFuseBatch(Seq(lex, sem), k, c, qidCol, idCol)
      .withColumnRenamed("rank_0", "lex_rank")
      .withColumnRenamed("rank_1", "sem_rank")
  }

  /** one (query, candidate) row inside [[mmr]]'s per-query group */
  private[graft] final case class MmrCand(qid: Long, doc_id: Long,
    score: Double, emb: Array[Float])
  private[graft] final case class MmrPick(qid: Long, doc_id: Long,
    mmr_rank: Int)

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98 — public method): greedily pick `k` of each query's
    * candidates maximizing λ·relevance − (1−λ)·max-cosine-to-already-
    * picked, so near-duplicate results don't crowd the final list — the
    * standard diversification pass between retrieval and a RAG context
    * window.
    *
    * `candidates`: (qidCol, idCol, scoreCol) — a TOP-K-SIZED list per
    * query (e.g. [[hybridTopKBatch]] output); `emb` supplies candidate
    * embeddings by id. Scores are min-max normalized to [0,1] per query
    * by default so λ weighs comparable scales (RRF scores live near
    * 1/c, cosines near 1). Greedy selection is inherently sequential
    * PER QUERY but embarrassingly parallel ACROSS queries: one
    * flatMapGroups task per query over its bounded candidate list —
    * never a driver loop, never corpus-sized state. Ties break by
    * (score, id) at every step, so output is deterministic. */
  def mmr(candidates: DataFrame, emb: DataFrame, k: Int = 10,
      lambda: Double = 0.7, normalizeScores: Boolean = true,
      qidCol: String = "qid", idCol: String = "doc_id",
      scoreCol: String = "rrf",
      embIdCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k=$k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda=$lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    // LEFT join: a candidate without an embedding row (partially-embedded
    // corpus, lexical-only hit) must not vanish from the output — it
    // keeps its relevance and carries zero redundancy penalty (cos with
    // the empty vector is 0)
    val joined = candidates
      .join(emb.select(col(embIdCol).as(idCol), col(embCol).as("_e")),
        Seq(idCol), "left_outer")
      .select(col(qidCol).cast("long").as("qid"),
        col(idCol).cast("long").as("doc_id"),
        col(scoreCol).cast("double").as("score"), col("_e").as("emb"))
      .as[MmrCand]
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    joined.groupByKey(_.qid).flatMapGroups { (qid, it) =>
      // greedy with a RUNNING max-similarity per candidate: each pick
      // updates every remaining candidate against the one new selection,
      // so the whole loop costs O(k·n) cosine evaluations (identical
      // output to the re-scan-all-selected form, which is O(k²·n))
      val cands = it.toArray.sortBy(c => (-c.score, c.doc_id))
      def embOf(c: MmrCand): Array[Float] =
        if (c.emb == null) Array.empty[Float] else c.emb
      val lo = if (cands.isEmpty) 0.0 else cands.map(_.score).min
      val hi = if (cands.isEmpty) 0.0 else cands.map(_.score).max
      def rel(c: MmrCand): Double =
        if (!normalizeScores) c.score
        else if (hi == lo) 1.0
        else (c.score - lo) / (hi - lo)
      val maxSim = Array.fill(cands.length)(0.0)
      val picked = Array.fill(cands.length)(false)
      val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
      var nLeft = cands.length
      while (out.size < k && nLeft > 0) {
        // argmax of the MMR objective; cands are pre-sorted by
        // (score desc, id asc), so a strict > keeps exactly the
        // (objective, score, id) tie-break order
        var bi = -1
        var bestObj = Double.NegativeInfinity
        var i = 0
        while (i < cands.length) {
          if (!picked(i)) {
            val obj = lambda * rel(cands(i)) - (1.0 - lambda) * maxSim(i)
            if (obj > bestObj) { bestObj = obj; bi = i }
          }
          i += 1
        }
        picked(bi) = true
        nLeft -= 1
        out += MmrPick(qid, cands(bi).doc_id, out.size + 1)
        val be = embOf(cands(bi))
        var j = 0
        while (j < cands.length) {
          if (!picked(j)) {
            val s = cos(embOf(cands(j)), be)
            if (s > maxSim(j)) maxSim(j) = s
          }
          j += 1
        }
      }
      out
    }.toDF("qid", "doc_id", "mmr_rank")
      .withColumnRenamed("qid", qidCol)
      .withColumnRenamed("doc_id", idCol)
  }

  /** Retrieval-quality evaluation: recall@k, MRR@k, and nDCG@k per
    * query, from a rankings table (qidCol, idCol, "rank" 1-based) and a
    * labels table (qidCol, idCol, "grade" — relevant iff grade > 0).
    *
    * Engine-reproducible arithmetic: each DCG term is rounded to 9 dp
    * and summed in DECIMAL (a double sum would depend on aggregation
    * order), log2 is spelled ln(x)/ln(2) so any IEEE engine computes the
    * identical value, and every output rounds to 6 dp. A query with no
    * relevant labels gets NULL for all three (0/0 — undefined, not
    * zero); a query whose top-k missed every relevant doc gets recall
    * and MRR 0 and nDCG 0.
    *
    * Scale shape: two equi-joins on (query, doc) plus per-query
    * aggregations — rankings are top-k-sized per query, labels are the
    * qrels; nothing touches the corpus. */
  def evaluate(rankings: DataFrame, labels: DataFrame, k: Int = 10,
      qidCol: String = "qid", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k=$k")
    val ln2 = log(lit(2.0))
    def dcgTerm(rankC: Column): Column = round(
      (pow(lit(2.0), col("grade").cast("double")) - lit(1.0)) /
        (log(rankC.cast("double") + lit(1.0)) / ln2), 9)
    val rel = labels.filter(col("grade") > 0)
      .select(col(qidCol), col(idCol), col("grade"))
    val nRel = rel.groupBy(col(qidCol)).agg(count(lit(1)).as("_nrel"))
    val topk = rankings.filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("rank"))
    val hits = topk.join(rel, Seq(qidCol, idCol))
    val perQ = hits.groupBy(col(qidCol)).agg(
      count(lit(1)).as("_nhit"),
      min(col("rank")).as("_first"),
      sum(dcgTerm(col("rank")).cast("decimal(28,9)")).as("_dcg"))
    val ideal = rel.withColumn("_irank", row_number().over(Window
        .partitionBy(col(qidCol))
        .orderBy(col("grade").desc, col(idCol))))
      .filter(col("_irank") <= k)
      .groupBy(col(qidCol))
      .agg(sum(dcgTerm(col("_irank")).cast("decimal(28,9)")).as("_idcg"))
    rankings.select(col(qidCol)).distinct()
      .join(nRel, Seq(qidCol), "left_outer")
      .join(perQ, Seq(qidCol), "left_outer")
      .join(ideal, Seq(qidCol), "left_outer")
      .select(col(qidCol),
        round(coalesce(col("_nhit"), lit(0L)).cast("double") /
          col("_nrel").cast("double"), 6).as("recall_at_k"),
        round(when(col("_first").isNotNull,
          lit(1.0) / col("_first").cast("double")).otherwise(
            when(col("_nrel").isNotNull, lit(0.0))), 6).as("mrr_at_k"),
        round(coalesce(col("_dcg"), lit(0).cast("decimal(28,9)"))
          .cast("double") / col("_idcg").cast("double"), 6).as("ndcg_at_k"))
  }

  /** Fully index-served BATCHED hybrid retrieval — the 100 TB serving
    * path: the lexical leg reads the durable inverted index (tokenize-
    * once, term filter pushed to token-sorted parquet; bit-identical to
    * [[bm25Batch]] via the shared scoring core) and the semantic leg
    * scores stored vectors; no query touches raw document text. Same
    * output contract as [[hybridTopKBatch]]. */
  def hybridTopKBatchFromIndex(spark: org.apache.spark.sql.SparkSession,
      bm25IndexDir: String, emb: DataFrame, queries: DataFrame,
      k: Int = 10, perLeg: Int = 50, c: Int = 60,
      idCol: String = "doc_id",
      embIdCol: String = "vec_id", embCol: String = "embedding",
      qidCol: String = "qid", termsCol: String = "terms",
      qEmbCol: String = "qvec"): DataFrame = {
    val queryTerms = queries.select(col(qidCol),
      explode(array_distinct(col(termsCol))).as("token"))
    val lex = IncrementalText.bm25BatchFromIndex(spark, bm25IndexDir,
      queryTerms, perLeg, idCol = idCol, qidCol = qidCol)
    val sem = cosineLegBatch(emb, queries, perLeg,
        idCol = embIdCol, embCol = embCol, qidCol = qidCol,
        qEmbCol = qEmbCol)
      .withColumnRenamed(embIdCol, idCol)
    rrfFuseBatch(Seq(lex, sem), k, c, qidCol, idCol)
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
