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

  test("partitioned time-series layout: warm run prunes history DIRECTORIES at planning") {
    val work = tmpDir("layout-tsp")
    val ev = Tables.events(spark, sf001) // 10k rows over ~30 days
    val splitUs = ev.selectExpr(
      "CAST(percentile_approx(unix_micros(ts), 0.9) AS LONG)").first().getLong(0)
    val splitTs = timestamp_micros(lit(splitUs))
    Layouts.writeTimeSeriesPartitioned(ev.filter(col("ts") < splitTs), work)
    val cache = new graft.cache.MemoryQueryCache()
    def q() = spark.read.parquet(work).filter(col("value") > 1)
      .agg(round(avg("value"), 2).as("avg_value"), count(lit(1)).as("cnt"))
    QueryCacheSession(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs)))
      .run(q()).collect()
    Layouts.writeTimeSeriesPartitioned(
      ev.filter(col("ts") >= splitTs), work, mode = "append")

    // capture every physical plan the warm run executes; the state-update
    // scan must carry the DERIVED ts_day partition filter
    val plans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val (warmRows, read) = try {
      var rows: Array[org.apache.spark.sql.Row] = null
      val r = measure {
        rows = QueryCacheSession(spark, QueryCacheConfig(cache,
          defaultTemporalColumn = "ts").withTemporalPartitioning("ts_day"))
          .run(q()).collect()
      }
      Thread.sleep(500) // QueryExecutionListener events are async
      (rows, r)
    } finally spark.listenerManager.unregister(listener)

    // correctness: warm == vanilla over the full table
    assert(warmRows.toSeq == q().collect().toSeq)
    // planning-level proof: some executed scan pruned on the ts_day
    // partition column (not just row-group stats inside tasks)
    import scala.jdk.CollectionConverters._
    assert(plans.asScala.exists(p =>
      p.contains("PartitionFilters") && p.contains("ts_day")),
      plans.asScala.mkString("\n---\n").take(4000))
    // physical-read proof: the warm cycle reads ~the appended tail
    val total = ev.count()
    assert(read < total / 2, s"warm read $read of $total rows")
  }

  test("shuffled-epoch layout: shard dirs, file order == shuffle order") {
    import graft.operators.Sampling
    val work = tmpDir("layout-epoch")
    val docs = Tables.documents(spark, sf0001)
    Layouts.writeShuffledEpoch(docs, work, "doc_id", shards = 4)
    // shard directories exist
    val dirs = new java.io.File(work).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.sameElements((0 until 4).map(s => s"shard=$s")), dirs.toSeq)
    // a sequential read of one shard streams rows in epoch order: the
    // parquet row order inside the shard's files equals shard_pos order
    val one = spark.read.parquet(s"$work/shard=0")
      .select("doc_id", "shard_pos").collect()
    assert(one.map(_.getLong(1)).toSeq == one.map(_.getLong(1)).sorted.toSeq,
      "shard file order != shuffle order")
    // read-back reproduces the in-memory shuffle mapping exactly
    val back = spark.read.parquet(work)
      .select(col("doc_id"), col("shard").cast("long"), col("shard_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val mem = Sampling.epochShuffle(docs, col("doc_id"), 4)
      .select("doc_id", "shard", "shard_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(back == mem)
    // one exchange total: the write plan reuses the window's partition
    val plan = Sampling.epochShuffle(docs, col("doc_id"), 4)
      .sortWithinPartitions("shard", "shard_pos")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
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

  test("z-ordered layout: selective scans prune on BOTH clustered columns") {
    val work = tmpDir("layout-zorder")
    val base = tmpDir("layout-zbase")
    val od = Tables.orders(spark, sf001)
    val total = od.count()
    Layouts.writeZOrdered(od, work, "o_custkey", "o_totalprice", files = 64)
    // contrast layout: lexicographic sort serves only its leading key
    od.repartitionByRange(64, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(base)
    // ~5%-selective slices on each dimension, bounds from the data
    val Array(kLo, kHi) =
      od.stat.approxQuantile("o_custkey", Array(0.45, 0.50), 0.0)
    val Array(pLo, pHi) =
      od.stat.approxQuantile("o_totalprice", Array(0.45, 0.50), 0.0)
    def keySlice(dir: String) = measure {
      spark.read.parquet(dir)
        .filter(col("o_custkey").between(kLo.toLong, kHi.toLong))
        .agg(count(lit(1))).collect()
    }
    def priceSlice(dir: String) = measure {
      spark.read.parquet(dir)
        .filter(col("o_totalprice").between(pLo, pHi))
        .agg(count(lit(1))).collect()
    }
    val zKey = keySlice(work)
    val zPrice = priceSlice(work)
    val lexPrice = priceSlice(base)
    // the z-layout prunes on BOTH dims (each file covers a small
    // rectangle of the (custkey, price) plane, so row-group stats skip
    // most files for either slice)…
    assert(zKey < total / 2, s"custkey slice read $zKey of $total")
    assert(zPrice < total / 2, s"price slice read $zPrice of $total")
    // …while the single-key layout cannot prune its NON-leading dim:
    // every file spans the full price range
    assert(zPrice * 2 < lexPrice,
      s"z-ordered price slice read $zPrice vs lexicographic $lexPrice — " +
        "no multi-dim advantage")
  }

  test("compact: small files merge shuffle-free to the byte target") {
    val src = tmpDir("layout-frag")
    val dest = tmpDir("layout-compact")
    val ev = Tables.events(spark, sf001)
    // an append-heavy sink's pathology: 64 tiny files
    ev.repartition(64).write.mode("overwrite").parquet(src)
    def files(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val fragBytes = files(src).map(_.length).sum
    val n = Layouts.compact(spark, src, dest, targetBytes = fragBytes / 4 + 1)
    assert(n <= 4, s"expected <= 4 target files, planned $n")
    assert(files(dest).length == n,
      s"${files(dest).length} files written, planned $n")
    // pure rewrite: same rows, and NO shuffle in the plan
    assert(spark.read.parquet(dest).count() == ev.count())
    val plan = spark.read.parquet(src).coalesce(n)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // clusterBy variant restores range clustering (one column, sorted)
    val dest2 = tmpDir("layout-compact2")
    Layouts.compact(spark, src, dest2, targetBytes = fragBytes / 4 + 1,
      clusterBy = Some("user_id"))
    val mins = files(dest2).sorted.map { f =>
      val s = spark.read.parquet(f.toString)
        .agg(min("user_id"), max("user_id")).first()
      (s.getLong(0), s.getLong(1))
    }
    // per-file user_id ranges must be (near-)disjoint after clustering
    val sortedByMin = mins.sortBy(_._1)
    sortedByMin.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(lo2 >= hi1, s"overlapping ranges after clusterBy: $sortedByMin")
      case _ =>
    }
  }

  test("bucketed index layout: the index side joins exchange-free") {
    val work = tmpDir("layout-bucketed")
    val s = spark
    import s.implicits._
    val table = "graft_test_bucketed_idx"
    s.sql(s"DROP TABLE IF EXISTS $table")
    val idx = (0L until 10000L).map(i => (i * 37L, i * 91L, i))
      .toDF("_h1", "_h2", "doc_id")
    Layouts.writeBucketed(idx, table, work, Seq("_h1", "_h2"), buckets = 8)
    // forbid broadcast so the join must satisfy a clustered distribution;
    // the bucketed side's HashPartitioning(_h1, _h2) IS the join key set
    // — only the probe side may exchange
    org.apache.spark.sql.graftshim.Shims.withIsolatedConf(s,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") { iso =>
      val isoSc = iso
      import isoSc.implicits._
      val probe = (0L until 500L).map(i => (i * 37L, i * 91L))
        .toDF("_h1", "_h2")
      val joined = iso.table(table)
        .join(probe, Seq("_h1", "_h2"), "left_semi")
      val plan = joined.queryExecution.executedPlan.toString
      val planOneLine = plan.replaceAll("\n", " ")
      // exactly ONE shuffle exchange in the whole plan (the probe side)
      val nExchanges = "(?<!Broadcast)Exchange hashpartitioning".r
        .findAllIn(planOneLine).length
      assert(nExchanges == 1, plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == 500)
    }
    s.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("date-partitioned fact x filtered dim: dynamic partition pruning") {
    val fact = tmpDir("layout-dppfact")
    val dimP = tmpDir("layout-dppdim")
    val ev = Tables.events(spark, sf001)
    Layouts.writeTimeSeriesPartitioned(ev, fact)
    val factDf = spark.read.parquet(fact)
    val total = factDf.count()
    // a dim table keyed by the PARTITION column, with a selective flag
    factDf.select(col("ts_day")).distinct()
      .withColumn("keep",
        (dayofmonth(col("ts_day")) <= 3).cast("int"))
      .write.mode("overwrite").parquet(dimP)
    val dim = spark.read.parquet(dimP)
    val joined = factDf.join(dim.filter(col("keep") === 1), "ts_day")
      .agg(count(lit(1)).as("n"))
    // planning-level proof: the fact scan's partition filter is DYNAMIC
    // (fed from the dim's broadcast at runtime) — the mechanism that
    // keeps a 100 TB fact scan proportional to the dim's selectivity
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(4000))
    // physical proof: the join reads ~the selected days only
    val read = measure(joined.collect())
    assert(read < total / 2, s"read $read of $total fact rows — DPP inert")
  }
}
