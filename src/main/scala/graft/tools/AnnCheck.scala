package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: does LSH/IVF top-10 equal brute force on the test corpora? */
object AnnCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = graft.sources.Tables.embeddings(spark, d)
      val q = emb.filter(col("vec_id") === 0).select("embedding").first().getSeq[Float](0)
      val bf = graft.operators.Similarity.bruteForceTopK(emb, q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val lsh = graft.operators.Similarity.lshTopK(emb, q, 10, probeRadius = 3, planes = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val model = graft.operators.IVF.fit(emb, k = 32, sampleN = 1024, iters = 6)
      val ivf = graft.operators.IVF.search(graft.operators.IVF.index(emb, model), model, q, 10, nProbe = 8)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      println(s"[annc] $sf lsh==bf: ${lsh == bf}  ivf==bf: ${ivf == bf}  bf=$bf lsh=$lsh ivf=$ivf")
    }
    spark.stop()
  }
}
