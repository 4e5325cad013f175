package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.functions.{cosine_similarity, nearest_centroid}

/** IVF (inverted-file) approximate nearest neighbor index: vectors are
  * assigned to their nearest of `k` centroids; a query probes only the
  * `nProbe` cells nearest to it.
  *
  * Scale design: `fit` trains on a bounded driver-side sample (spherical
  * k-means, a few Lloyd iterations — the classic IVF recipe); assignment
  * is one native expression per row in a narrow map stage; the indexed
  * table is written `partitionBy("ivf_cell")` so a probe reads only
  * nProbe/k of the files via partition pruning — at 100 TB the query cost
  * is proportional to cells probed, not corpus size. Recall/cost tune via
  * (k, nProbe).
  */
object IVF {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** spherical k-means on a deterministic sample (collected to driver —
    * sampleN × dim doubles, bounded regardless of corpus size) */
  def fit(emb: DataFrame, k: Int = 32, sampleN: Int = 2048, iters: Int = 8,
      seed: Long = 42L, idCol: String = "vec_id", embCol: String = "embedding")
      : Model = {
    val sample = emb.orderBy(col(idCol)).limit(sampleN)
      .select(embCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val pts = sample.map(normalize)
    val rnd = new java.util.Random(seed)
    var centroids = Array.fill(k)(pts(rnd.nextInt(pts.length)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      pts.foreach { p =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var dot = 0.0; var j = 0
          while (j < dim) { dot += p(j) * centroids(c)(j); j += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        counts(best) += 1
      }
      centroids = sums.zip(counts).zipWithIndex.map { case ((s, n), i) =>
        if (n == 0) pts(rnd.nextInt(pts.length)).clone() // re-seed empty cell
        else normalize(s)
      }
    }
    Model(centroids)
  }

  /** add the cell assignment column (write with partitionBy("ivf_cell")
    * to get partition pruning on probes) */
  def index(emb: DataFrame, model: Model, embCol: String = "embedding")
      : DataFrame =
    emb.withColumn("ivf_cell", nearest_centroid(col(embCol), model.centroids))

  /** nProbe cells nearest to a query vector (driver-side, k dot products) */
  def probeCells(model: Model, query: Seq[Float], nProbe: Int): Seq[Int] = {
    val q = query.map(_.toDouble).toArray
    model.centroids.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(q).map { case (a, b) => a * b }.sum
      (i, dot)
    }.sortBy(-_._2).take(nProbe).map(_._1).toSeq
  }

  /** top-k cosine search probing only the nearest cells */
  def search(indexed: DataFrame, model: Model, query: Seq[Float], k: Int = 10,
      nProbe: Int = 8, idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame = {
    val cells = probeCells(model, query, nProbe)
    val q = array(query.map(lit): _*)
    indexed
      .filter(col("ivf_cell").isin(cells: _*))
      .select(col(idCol), cosine_similarity(col(embCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
