package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IVF
import graft.sources.Tables

/** Repeated-call ANN economics: the per-corpus stats memo must make the
  * SECOND fit/radii call over an unchanged corpus launch no Spark job
  * (VERDICT r4 "What's missing" #5 — ANN as a service, many queries per
  * indexed corpus). */
class IVFMemoSpec extends AnyFunSuite {
  import TestSparkSession._

  /** count job starts during f (listener bus is async: poll to quiesce) */
  private def countJobs(f: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      var prev = -1; var cur = n.get(); var i = 0
      while (cur != prev && i < 30) { Thread.sleep(100); prev = cur; cur = n.get(); i += 1 }
      cur
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("fitCached: second fit over an unchanged corpus launches no job") {
    val emb = Tables.embeddings(spark, sf0001)
    IVF.fitCached(emb, k = 8, sampleN = 128, iters = 3, seed = 7L)
    val jobs = countJobs {
      IVF.fitCached(emb, k = 8, sampleN = 128, iters = 3, seed = 7L)
    }
    assert(jobs == 0, s"memoized fit launched $jobs jobs")
  }

  test("cellRadii: second call over an unchanged indexed corpus is job-free") {
    val emb = Tables.embeddings(spark, sf0001)
    val model = IVF.fitCached(emb, k = 8, sampleN = 128, iters = 3, seed = 7L)
    val indexed = IVF.index(emb, model)
    IVF.cellRadii(indexed, model, "ivf_cell", "embedding")
    val jobs = countJobs {
      IVF.cellRadii(indexed, model, "ivf_cell", "embedding")
    }
    assert(jobs == 0, s"memoized radii launched $jobs jobs")
  }

  test("searchExact reuses the radii memo (fewer jobs on repeat call)") {
    val emb = Tables.embeddings(spark, sf0001)
    // fresh hyper-parameters → fresh memo keys for this test
    val model = IVF.fitCached(emb, k = 6, sampleN = 128, iters = 3, seed = 11L)
    val indexed = IVF.index(emb, model)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").first().getSeq[Float](0)
    val first = countJobs(IVF.searchExact(indexed, model, q, k = 5).collect())
    val second = countJobs(IVF.searchExact(indexed, model, q, k = 5).collect())
    assert(second < first,
      s"repeat searchExact launched $second jobs (first: $first)")
  }

  test("memo key tracks the data: a different corpus recomputes") {
    val a = Tables.embeddings(spark, sf0001)
    val b = Tables.embeddings(spark, sf001)
    IVF.fitCached(a, k = 5, sampleN = 64, iters = 2, seed = 13L)
    val jobs = countJobs {
      IVF.fitCached(b, k = 5, sampleN = 64, iters = 2, seed = 13L)
    }
    assert(jobs > 0, "distinct corpus must not hit the memo")
  }

  test("durable stats survive a simulated restart: reload is job-free and identical") {
    val dir = tmpDir("ivfdurable")
    IVF.enableDurableStats(dir)
    try {
      val emb = Tables.embeddings(spark, sf0001)
      val m1 = IVF.fitCached(emb, k = 6, sampleN = 96, iters = 3, seed = 23L)
      val indexed = IVF.index(emb, m1)
      val r1 = IVF.cellRadii(indexed, m1, "ivf_cell", "embedding")
      IVF.clearStatsForTest() // "restart": in-process memo gone, files remain
      var m2: IVF.Model = null
      var r2: Map[Int, Double] = null
      val j1 = countJobs {
        m2 = IVF.fitCached(emb, k = 6, sampleN = 96, iters = 3, seed = 23L)
      }
      val j2 = countJobs {
        r2 = IVF.cellRadii(IVF.index(emb, m2), m2, "ivf_cell", "embedding")
      }
      info(s"reload jobs: fit=$j1 radii=$j2")
      assert(j1 + j2 == 0, s"durable reload launched ${j1 + j2} jobs")
      assert(m2.centroids.map(_.toSeq).toSeq == m1.centroids.map(_.toSeq).toSeq)
      assert(r2 == r1)
    } finally IVF.disableDurableStats()
  }

  test("memo key distinguishes RDD-backed corpora with identical schemas") {
    // localCheckpoint leaves have no file paths and canonicalize
    // identically for same-schema inputs — the RDD id must disambiguate
    // or the second corpus would silently reuse the first one's model
    val a = Tables.embeddings(spark, sf0001).limit(96).localCheckpoint()
    val b = Tables.embeddings(spark, sf0001).limit(64).localCheckpoint()
    val ma = IVF.fitCached(a, k = 4, sampleN = 48, iters = 2, seed = 17L)
    val jobs = countJobs {
      val mb = IVF.fitCached(b, k = 4, sampleN = 48, iters = 2, seed = 17L)
      assert(!(ma eq mb), "distinct checkpointed corpora shared a memo entry")
    }
    assert(jobs > 0, "distinct RDD-backed corpus must not hit the memo")
  }

  test("RDD-backed corpora never touch the durable layer (id collision guard)") {
    // RDD ids reset per process; a durable entry keyed by one could be
    // reloaded for a DIFFERENT corpus after a restart. The guard: keys
    // containing rdds= skip the durable read AND write entirely.
    val dir = tmpDir("ivfdurable-rdd")
    IVF.enableDurableStats(dir)
    try {
      val emb = Tables.embeddings(spark, sf0001).limit(80).localCheckpoint()
      IVF.fitCached(emb, k = 4, sampleN = 48, iters = 2, seed = 29L)
      val files = new java.io.File(dir).listFiles()
      assert(files == null || files.isEmpty,
        s"RDD-backed fit wrote durable files: ${files.map(_.getName).mkString(",")}")
      // and a simulated restart recomputes (no durable reload possible)
      IVF.clearStatsForTest()
      val jobs = countJobs {
        IVF.fitCached(emb, k = 4, sampleN = 48, iters = 2, seed = 29L)
      }
      assert(jobs > 0, "RDD-backed corpus must recompute after restart")
    } finally IVF.disableDurableStats()
  }
}
