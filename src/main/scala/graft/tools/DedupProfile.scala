package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only stage attribution for q_dedup_survivors (VERDICT r6 #5):
  * times candidate-pair generation, edge materialization, the union-find
  * collect, and the final anti-join separately at the given SF. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime
      val r = f
      println(f"[profile] $tag%-28s ${(System.nanoTime - t0) / 1e9}%8.3f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val docs = Tables.documents(spark, sfDir)
      val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      time("candidate pairs (count)") { pairs.count() }
      val labels = time("clusters (full)") {
        val l = Dedup.clusters(pairs); l.count(); l
      }
      time("survivors end-to-end") {
        Dedup.dropNearDuplicates(docs,
          Dedup.ngramJaccardPairs(docs, threshold = 0.5))
          .select("doc_id", "n_chars").count()
      }
    }
    spark.stop()
  }
}
