package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IVF
import graft.sources.{Layouts, Tables}

/** Physical pruning proof: the layouts must make Spark READ less, not
  * just filter earlier — asserted on task input metrics and plan
  * PartitionFilters, the properties that hold at any scale. */
class LayoutSpec extends AnyFunSuite {
  import TestSparkSession._

  private val recordsRead = new LongAdder
  private lazy val listenerInstalled = {
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recordsRead.add(t.taskMetrics.inputMetrics.recordsRead)
    })
    true
  }

  private def measure[A](f: => A): Long = {
    assert(listenerInstalled)
    recordsRead.reset()
    f
    // listener events are async; give the bus a moment to drain
    Thread.sleep(300)
    recordsRead.sum()
  }

  test("time-series layout: watermark filter skips history row groups") {
    val work = tmpDir("layout-ts")
    val ev = Tables.events(spark, sf001) // 10k rows
    Layouts.writeTimeSeries(ev, work, "ts", buckets = 8)
    val total = ev.count()
    val wm = ev.selectExpr("CAST(percentile_approx(unix_micros(ts), 0.95) AS LONG)")
      .first().getLong(0)
    val read = measure {
      spark.read.parquet(work)
        .filter(col("ts") >= timestamp_micros(lit(wm)))
        .agg(count(lit(1))).collect()
    }
    // 5% tail query must not read anywhere near the full table
    assert(read < total / 2, s"read $read of $total rows — no pruning")
  }

  test("ivf layout: probing cells prunes partitions physically") {
    val work = tmpDir("layout-ivf")
    val emb = Tables.embeddings(spark, sf001) // 5k vectors
    val model = IVF.fit(emb, k = 16, sampleN = 1024, iters = 5)
    Layouts.writeIvfIndexed(emb, model, work)
    val q = emb.filter(col("vec_id") === 3).select("embedding")
      .first().getSeq[Float](0)
    val cells = IVF.probeCells(model, q, nProbe = 2)
    val indexed = Layouts.readIvfIndexed(spark, work)
    // plan must prune on the partition column
    val plan = indexed.filter(col("ivf_cell").isin(cells: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_cell"), plan)
    val total = emb.count()
    val read = measure {
      indexed.filter(col("ivf_cell").isin(cells: _*)).count()
    }
    assert(read < total, s"read $read of $total — no partition pruning")
    // and the search still finds the query vector itself
    val got = graft.operators.Similarity.bruteForceTopK(
      indexed.filter(col("ivf_cell").isin(IVF.probeCells(model, q, 4): _*)),
      q, k = 5).collect().map(_.getLong(0))
    assert(got.head == 3L)
  }
}
