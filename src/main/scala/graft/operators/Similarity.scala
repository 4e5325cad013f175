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

  /** Deterministic Rademacher (±1) hyperplanes: entry (p, i) is the sign
    * bit of the library content hash of `"hp:p:i"` under `seed`. Sign-bit
    * LSH needs only a symmetric spherically-balanced direction family;
    * dense ±1 rows give the same collision behavior as gaussians for
    * sign sketches (the simhash construction, Charikar 2002) while being
    * reproducible in ANY engine — an external oracle regenerates the
    * identical literals, where seeded JVM gaussians cannot be replayed.
    * (Same idiom as [[projectSigns]].) */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, i) =>
      val h = graft.functions.Hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"hp:$p:$i"), seed)
      if (h < 0L) -1.0 else 1.0
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

  /** Deterministic ±1 sign matrix for random projection: entry (j, i) is
    * the sign bit of the graft content hash of `"rp:j:i"` under `seed` —
    * reproducible on any cluster AND in an external engine (the oracle
    * regenerates the identical literals), unlike JVM-`Random` gaussians.
    * A dense Rademacher matrix satisfies the JL lemma with the same
    * distortion bound as gaussians (Achlioptas 2001, public result). */
  def projectSigns(dim: Int, k: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(k, dim) { (j, i) =>
      val h = graft.functions.Hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"rp:$j:$i"), seed)
      if (h < 0L) -1.0 else 1.0
    }

  /** Johnson-Lindenstrauss random projection of the embedding column to
    * `k` dimensions: output columns `proj_0..proj_{k-1}` are signed sums
    * of the input coordinates under [[projectSigns]]. Cosine/distance
    * structure is approximately preserved (scale-invariant uses need no
    * 1/√k factor, so none is applied — the outputs stay exact signed
    * sums, reproducible bit-for-bit by a sequential fold).
    *
    * Scale shape: a single native codegen node per row computes the
    * whole k×d product (graft.functions.MatrixProject) — a narrow map
    * stage, zero shuffles at any corpus size; downstream ANN over the
    * projected vectors pays k/d of the brute-force flops and bytes. */
  def randomProject(emb: DataFrame, k: Int, dim: Int = 64, seed: Long = 42L,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && dim >= 1, s"k=$k dim=$dim")
    val proj = graft.functions.functions.matrix_project(
      col(embCol), projectSigns(dim, k, seed))
    // element_at fan-out of ONE array expression: whole-stage codegen
    // subexpression elimination evaluates the product once per row
    emb.select(col(idCol) +: (0 until k).map(j =>
      element_at(proj, j + 1).as(s"proj_$j")): _*)
  }

  /** Embedding near-duplicate pairs: OR-amplified hyperplane LSH.
    * `bands` independent sketches of `planesPerBand` bits each; a pair is
    * a candidate if it collides in ANY band (recall ≈
    * 1-(1-p^planesPerBand)^bands with p = 1 - θ/π), then verified with
    * exact cosine.
    *
    * ONLY for genuinely high thresholds (≥ ~0.85), where a collision
    * probability p close to 1 lets many planes per band keep buckets
    * small AND recall high. At low thresholds (p ≈ 0.63 at 0.4) no
    * banding is simultaneously cheap and complete — few planes per band
    * means each band's buckets self-join ~(N/2^planes)² pairs, i.e. the
    * candidate set EXCEEDS the all-pairs product. For a low-threshold
    * sweep, or whenever the corpus has no similarity gap above the
    * threshold, use [[exactPairs]] instead.
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

  /** EXACT cosine-threshold pairs via IVF-cell blocking with a
    * centroid-angle pruning bound. Complete at ANY threshold — unlike
    * LSH banding, which needs a similarity gap for recall 1.
    *
    * Each vector is assigned to its nearest of `cells` spherical-k-means
    * centroids (graft.operators.IVF). For cells c1, c2 with angular radii
    * r1, r2 (max member-to-centroid angle), the triangle inequality on
    * the sphere gives: any pair (a ∈ c1, b ∈ c2) with angle(a,b) ≤
    * acos(threshold) must satisfy angle(cen1,cen2) ≤ acos(threshold) +
    * r1 + r2 — so cell pairs violating that bound are pruned with zero
    * recall loss. Surviving cell pairs are paired exactly (equi-join on
    * the cell key, cosine verify in the same codegen stage; the N²-ish
    * join OUTPUT is filtered where it is produced and never shuffled).
    *
    * Scale: with a selective threshold (or clustered data) the bound
    * prunes most of the `cells²` block matrix, so cost ≈ matching blocks
    * only; in the worst case (low threshold over isotropic data, where
    * the OUTPUT itself is Ω(N²/const)) it degrades to a well-partitioned
    * exact all-pairs — never worse, unlike banding which multiplies the
    * all-pairs cost by a constant (r2 verdict: 64×3 banding = ~4N²). */
  def exactPairs(emb: DataFrame, threshold: Double, cells: Int = 32,
      seed: Long = 42L,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    // model + per-cell radii are memoized per corpus (IVF.StatsMemo):
    // a repeated sweep over an unchanged corpus launches neither the
    // sample-collect nor the radii aggregation job
    val model = IVF.fitCached(emb, k = cells, seed = seed, idCol = idCol, embCol = embCol)
    val assigned = IVF.index(emb, model, embCol)
      .select(col(idCol).as("id"), col(embCol).as("e"), col("ivf_cell").as("cell"))
    def clamp(x: Double): Double = math.max(-1.0, math.min(1.0, x))
    val radii = IVF.cellRadii(assigned, model, "cell", "e")
    val tAngle = math.acos(clamp(threshold))
    def centAngle(i: Int, j: Int): Double = {
      val (a, b) = (model.centroids(i), model.centroids(j))
      var dot = 0.0; var na = 0.0; var nb = 0.0; var d = 0
      while (d < a.length) { dot += a(d) * b(d); na += a(d) * a(d); nb += b(d) * b(d); d += 1 }
      if (na == 0 || nb == 0) 0.0 else math.acos(clamp(dot / math.sqrt(na * nb)))
    }
    // ordered cell pairs (both directions; the id_a < id_b join residual
    // then yields each unordered vector pair exactly once — no distinct)
    val keep = for {
      i <- 0 until model.k; j <- 0 until model.k
      ri <- radii.get(i); rj <- radii.get(j) // cells with no members pair with nothing
      if i == j || centAngle(i, j) <= tAngle + ri + rj
    } yield (i, j)
    val spark = emb.sparkSession
    import spark.implicits._
    val cellPairs = keep.toDF("ca", "cb")
    val x = assigned.select(col("id").as("id_a"), col("e").as("e_a"), col("cell").as("ca"))
    val y = assigned.select(col("id").as("id_b"), col("e").as("e_b"), col("cell").as("cb"))
    val xp = x.join(broadcast(cellPairs), Seq("ca"))
    xp.join(y, xp("cb") === y("cb") && col("id_a") < col("id_b"))
      .withColumn("cosine", cosine_similarity(col("e_a"), col("e_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
