package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.functions.cosine_similarity

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - `bruteForceTopK`: exact cosine top-k — one narrow scan computing a
  *    codegen'd dot-product per row, then TakeOrderedAndProject (per-
  *    partition top-k, merge on driver). The exactness baseline; at 100 TB
  *    it's one full scan, embarrassingly parallel, zero shuffle.
  *  - hyperplane LSH bucketing (`withBucket`): sign-bit sketch over
  *    deterministic pseudo-random hyperplanes. Near vectors collide with
  *    high probability, so:
  *      - `lshTopK` probes only buckets within Hamming ≤ r of the query's
  *        bucket — the scan prunes to a fraction of the data (with a
  *        bucket-bloom/partition layout at scale, entire files prune);
  *      - `nearDuplicatePairs` equi-joins on the bucket id and verifies
  *        with exact cosine, avoiding the all-pairs product.
  */
object Similarity {

  /** deterministic hyperplanes: `planes` rows of `dim` gaussians, seeded */
  private[operators] def hyperplanes(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** sign-bit bucket id of an embedding under `planes` hyperplanes
    * (single native expression — see graft.functions.HyperplaneBucket) */
  def bucketExpr(emb: Column, dim: Int, planes: Int = 12, seed: Long = 42L): Column =
    graft.functions.functions.hyperplane_bucket(emb, hyperplanes(dim, planes, seed))

  def withBucket(emb: DataFrame, embCol: String = "embedding", dim: Int = 64,
      planes: Int = 12, seed: Long = 42L): DataFrame =
    emb.withColumn("bucket", bucketExpr(col(embCol), dim, planes, seed))

  /** exact cosine top-k neighbors of `query` */
  def bruteForceTopK(emb: DataFrame, query: Seq[Float], k: Int = 10,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = array(query.map(lit): _*)
    emb.select(col(idCol),
        cosine_similarity(col(embCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** top-k probing only LSH buckets within Hamming `probeRadius` of the
    * query bucket; recall < 1, cost ≈ (buckets probed / 2^planes) */
  def lshTopK(emb: DataFrame, query: Seq[Float], k: Int = 10,
      probeRadius: Int = 2, planes: Int = 12, seed: Long = 42L,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val dim = query.length
    val hp = hyperplanes(dim, planes, seed)
    val qBucket = hp.zipWithIndex.map { case (plane, p) =>
      val dot = plane.zip(query).map { case (a, b) => a * b.toDouble }.sum
      if (dot >= 0) 1L << p else 0L
    }.sum
    val q = array(query.map(lit): _*)
    withBucket(emb, embCol, dim, planes, seed)
      .filter(bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeRadius)
      .select(col(idCol), cosine_similarity(col(embCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Embedding near-duplicate pairs: OR-amplified hyperplane LSH.
    * `bands` independent sketches of `planesPerBand` bits each; a pair is
    * a candidate if it collides in ANY band (recall ≈
    * 1-(1-p^planesPerBand)^bands with p = 1 - θ/π), then verified with
    * exact cosine. Tune the banding to the threshold: high thresholds
    * (0.95) afford many planes per band (small buckets, cheap); low
    * thresholds (0.4 ⇒ p ≈ 0.63) need few planes and many bands for
    * recall — 3×64 gives ≈1-1e-8 at 0.4 at the cost of coarser buckets.
    * Never materializes the all-pairs product.
    *
    * Shuffle discipline: the band self-join carries (id, band) ONLY —
    * embedding vectors are re-joined just for the surviving candidate
    * pairs, so the wide payload never rides the bands× exchange. */
  def nearDuplicatePairs(emb: DataFrame, threshold: Double = 0.95,
      bands: Int = 16, planesPerBand: Int = 12, dim: Int = 64, seed: Long = 42L,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val vecs = emb.select(col(idCol).as("id"), col(embCol).as("e"))
    val banded = vecs.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        bucketExpr(col("e"), dim, planesPerBand, seed + b * 7919L)): _*))
        .as(Seq("band_idx", "band_val")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(vecs.select(col("id").as("id_a"), col("e").as("e_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("e").as("e_b")), "id_b")
      .withColumn("cosine", cosine_similarity(col("e_a"), col("e_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
