package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a large BPE merge-training run (the scale shape the
  * oracle's 8-merge check cannot show). Usage:
  *   runMain graft.tools.BpeTrainBench <sfDir> [numMerges] [batch]
  * Prints one line: merges learned, passes taken, wall seconds, and the
  * storage bound (two word-table generations) so regressions in the
  * batching/unpersist discipline are visible as pass-count or RSS blowups.
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(1000)
    val batch = args.lift(2).map(_.toInt).getOrElse(graft.operators.BpeTrainer.DefaultBatch)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val merges = graft.operators.BpeTrainer.train(docs, n, batch = batch)
    val secs = (System.nanoTime() - t0) / 1e9
    val cached = spark.sparkContext.getPersistentRDDs.size
    println(f"[bpe-train] merges=${merges.size} requested=$n " +
      f"batch=$batch secs=$secs%.1f persistedRdds=$cached " +
      s"last=${merges.lastOption.getOrElse(("", "", ""))}")
    spark.stop()
  }
}
