package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.functions.{cosine_similarity, nearest_codeword}

/** Product quantization: memory-bounded ANN state.
  *
  * A 64-dim float32 embedding is 256 bytes; its PQ code is `m` small
  * integers (m=8 ⇒ 8 codes, 32× smaller), so billions of vectors fit
  * where raw embeddings cannot — the asymmetric-distance (ADC) scan then
  * reads ONLY the code column. The classic recipe:
  *
  *  - [[fit]]: split each (L2-normalized) vector into `m` subvectors and
  *    run k-means per subspace on a bounded driver-side sample — the
  *    codebooks are m×k×(dim/m) doubles, independent of corpus size;
  *  - [[encode]]: per subspace, assign the nearest codeword — composed
  *    entirely from existing codegen pieces (`slice` +
  *    [[graft.functions.NearestCentroid]]), a narrow map stage;
  *  - [[searchADC]]: the query precomputes an m×k table of subspace dot
  *    products; each row's approximate cosine is m LITERAL-array lookups
  *    summed — no embedding column touched. Optionally rerank the ADC
  *    shortlist with exact cosines (the production pattern: approximate
  *    scan over compact codes, exact rerank over `rerank` candidates).
  *
  * Cosine footing: vectors are normalized before quantization, so the
  * reconstructed dot product approximates the cosine directly and no
  * per-vector norm needs storing.
  */
object PQ {

  /** codebooks(sub)(code) = centroid of subspace `sub`, length dim/m */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def dsub: Int = codebooks.head.head.length
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Per-subspace L2 k-means (Lloyd) on a deterministic driver-side
    * sample — sampleN × dim doubles regardless of corpus size. */
  def fit(emb: DataFrame, m: Int = 8, k: Int = 256, sampleN: Int = 2048,
      iters: Int = 8, seed: Long = 42L, idCol: String = "vec_id",
      embCol: String = "embedding"): Model = {
    val sample = emb.orderBy(col(idCol)).limit(sampleN)
      .select(embCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val pts = sample.map(normalize)
    val rnd = new java.util.Random(seed)
    val codebooks = Array.tabulate(m) { sub =>
      val subPts = pts.map(_.slice(sub * dsub, (sub + 1) * dsub))
      var cents = Array.fill(math.min(k, subPts.length))(
        subPts(rnd.nextInt(subPts.length)).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Int](cents.length)
        subPts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var j = 0
            while (j < dsub) {
              val t = p(j) - cents(c)(j); d += t * t; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var j = 0
          while (j < dsub) { sums(best)(j) += p(j); j += 1 }
          counts(best) += 1
        }
        cents = sums.zip(counts).map { case (s, n) =>
          if (n == 0) subPts(rnd.nextInt(subPts.length)).clone()
          else s.map(_ / n)
        }
      }
      cents
    }
    Model(codebooks)
  }

  /** the L2-normalized embedding as a column (norm computed once as its
    * own column upstream would also work; inside one projection the
    * aggregate runs once per row). A zero vector stays zero — dividing
    * by its 0 norm would produce NaNs, NearestCodeword would see
    * all-NaN distances and emit -1, and the ADC lookup would crash on
    * index 0; zeros instead assign to the codeword nearest the origin. */
  private def normalized(e: Column): Column = {
    val n = sqrt(aggregate(e, lit(0.0d), (acc, x) => acc + x * x))
    val safeN = when(n === 0.0d, lit(1.0d)).otherwise(n)
    transform(e, x => x / safeN)
  }

  /** Adds `pq_code: array<int>` (m codes): per subspace, the argmin-L2
    * codeword of the normalized vector's slice — `slice` +
    * [[graft.functions.NearestCodeword]], one narrow projection. */
  def encode(emb: DataFrame, model: Model, embCol: String = "embedding")
      : DataFrame = {
    val dsub = model.dsub
    val withNorm = emb.withColumn("_e_n", normalized(col(embCol)))
    val codes = (0 until model.m).map { sub =>
      nearest_codeword( // slice is 1-indexed
        slice(col("_e_n"), sub * dsub + 1, dsub), model.codebooks(sub))
    }
    withNorm.withColumn("pq_code", array(codes: _*)).drop("_e_n")
  }

  /** m×k table of query-subvector · codeword dot products */
  def adcTables(model: Model, query: Seq[Float]): Array[Array[Double]] = {
    val q = normalize(query.map(_.toDouble).toArray)
    Array.tabulate(model.m) { sub =>
      val qs = q.slice(sub * model.dsub, (sub + 1) * model.dsub)
      model.codebooks(sub).map(c =>
        c.zip(qs).map { case (a, b) => a * b }.sum)
    }
  }

  /** Approximate top-k by ADC over the code column only; with
    * `rerank > k`, the top-`rerank` ADC shortlist is re-scored with
    * exact cosines against `original` (joined by `idCol`) and the exact
    * top-k of the shortlist returned. */
  def searchADC(encoded: DataFrame, model: Model, query: Seq[Float],
      k: Int = 10, rerank: Int = 0, original: DataFrame = null,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val tables = adcTables(model, query)
    // m literal-array lookups, unrolled: stays inside whole-stage codegen
    val approx = (0 until model.m).map { sub =>
      element_at(array(tables(sub).map(lit): _*),
        element_at(col("pq_code"), sub + 1) + 1)
    }.reduce(_ + _)
    val scored = encoded.select(col(idCol), approx.as("adc_cosine"))
    if (rerank <= 0) scored.orderBy(col("adc_cosine").desc, col(idCol).asc).limit(k)
    else {
      require(original != null, "rerank needs the original embeddings")
      val q = array(query.map(lit): _*)
      scored.orderBy(col("adc_cosine").desc, col(idCol).asc).limit(math.max(k, rerank))
        .join(original.select(col(idCol), col(embCol)), idCol)
        .select(col(idCol), cosine_similarity(col(embCol), q).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol).asc)
        .limit(k)
    }
  }
}
