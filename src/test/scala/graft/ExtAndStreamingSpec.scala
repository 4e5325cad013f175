package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cache.MemoryQueryCache
import graft.ext.QueryCacheTransparent
import graft.log.RecordingLog
import graft.sources.Tables
import graft.streaming.StreamingAgg

/** Transparent optimizer-rule mode + Structured Streaming analog. */
class ExtAndStreamingSpec extends AnyFunSuite {
  import TestSparkSession._

  test("transparent mode: plain DataFrame actions hit the cache") {
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheTransparent.enable(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", log = log))
    try {
      // plain micros-timestamp source (the transparent path widens pruned
      // projections; the nanos->micros conversion alias of the raw events
      // table can't be reconstructed post-pruning, so materialize first)
      val work = tmpDir("transparent")
      Tables.events(spark, sf0001).write.mode("overwrite").parquet(work)
      val ev = spark.read.parquet(work)
      def q() = ev.filter(col("value") > 3)
        .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
      val r1 = q().collect()
      val r2 = q().collect()
      assert(r1.toSeq == r2.toSeq)
      assert(log.messages.exists(_.startsWith("cache miss")), log.messages)
      assert(log.messages.exists(_.startsWith("cache hit")), log.messages)
      // vanilla comparison with the rule disabled
      QueryCacheTransparent.disable(spark)
      assert(q().collect().toSeq == r1.toSeq)
    } finally QueryCacheTransparent.disable(spark)
  }

  test("transparent mode: filter queries materialize rows through the rule") {
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheTransparent.enable(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", log = log))
    try {
      val work = tmpDir("transparent-rows")
      Tables.events(spark, sf0001).write.mode("overwrite").parquet(work)
      val ev = spark.read.parquet(work)
      // NO aggregate anywhere — the agg-free routing path
      def q() = ev.filter(col("value") > 50).select(col("event_id"),
        col("value"))
      val r1 = q().collect()
      val r2 = q().collect()
      assert(r1.sortBy(_.toString).toSeq == r2.sortBy(_.toString).toSeq)
      assert(log.messages.exists(_.startsWith("cache miss (rows)")),
        log.messages)
      assert(log.messages.exists(_.startsWith("cache hit (rows)")),
        log.messages)
      QueryCacheTransparent.disable(spark)
      assert(q().collect().sortBy(_.toString).toSeq ==
        r1.sortBy(_.toString).toSeq)
    } finally QueryCacheTransparent.disable(spark)
  }

  test("transparent mode: session windows cache through the rule") {
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheTransparent.enable(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", log = log))
    try {
      val work = tmpDir("transparent-session")
      Tables.events(spark, sf0001).write.mode("overwrite").parquet(work)
      val ev = spark.read.parquet(work)
      // the optimizer-stage plan keeps the session_window attribute (it is
      // already an attribute, so PullOutGroupingExpressions leaves it) —
      // the sessionWindow metadata must survive into the cached state and
      // the warm MergingSessions merge exactly like the facade path
      def q() = ev.filter(col("value") > 1)
        .groupBy(session_window(col("ts"), "45 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
        .select(col("session_window.start").as("ss"), col("event_type"),
          col("cnt"), col("sv"))
      val r1 = q().collect()
      val r2 = q().collect()
      assert(r1.sortBy(_.toString).toSeq == r2.sortBy(_.toString).toSeq)
      assert(log.messages.exists(_.startsWith("cache miss")), log.messages)
      assert(log.messages.exists(_.startsWith("cache hit")), log.messages)
      QueryCacheTransparent.disable(spark)
      assert(q().collect().sortBy(_.toString).toSeq ==
        r1.sortBy(_.toString).toSeq)
    } finally QueryCacheTransparent.disable(spark)
  }

  test("transparent mode: two-fact join aggregates factorize through the rule") {
    // the optimizer-stage plan interposes a pulled-out _groupingexpression
    // Project between the Aggregate and the Join — the factorized peel
    // inlines alias-bearing Projects, so the rule path factorizes the
    // same queries the facade does
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheTransparent.enable(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", log = log))
    try {
      val workA = tmpDir("transparent_fj_a")
      val workB = tmpDir("transparent_fj_b")
      val ev = Tables.events(spark, sf0001)
      ev.filter(col("event_type") === "click")
        .select("ts", "user_id", "value").write.mode("overwrite").parquet(workA)
      ev.filter(col("event_type") === "purchase")
        .select("ts", "user_id", "value").write.mode("overwrite").parquet(workB)
      def q() = {
        val a = spark.read.parquet(workA)
        val b = spark.read.parquet(workB)
        a.join(b, a("user_id") === b("user_id"), "inner")
          .groupBy(date_trunc("hour", a("ts")).as("hour"))
          .agg(count(lit(1)).as("cnt"), sum(a("value")).as("sv"))
      }
      def render() = q().collect().map(_.toSeq.map {
        case d: Double => f"$d%.6e"
        case x => String.valueOf(x)
      }.mkString("|")).sorted.toSeq
      val r1 = render()
      val r2 = render()
      assert(r1 == r2)
      assert(log.messages.exists(_.startsWith("factorized join: answered")),
        log.messages)
      assert(log.messages.count(_.startsWith("cache hit")) >= 2, log.messages)
      // vanilla comparison with the rule disabled
      QueryCacheTransparent.disable(spark)
      assert(render() == r1)
    } finally QueryCacheTransparent.disable(spark)
  }

  test("transparent mode: median/percentile lowering caches through the rule") {
    // the optimizer-rule path sees median AFTER ReplaceExpressions (the
    // Percentile replacement), the facade sees the source form — both
    // normalizations must cache; equality vs the disabled-rule vanilla
    val cache = new MemoryQueryCache()
    val log = new RecordingLog
    QueryCacheTransparent.enable(spark, QueryCacheConfig(cache,
      defaultTemporalColumn = "ts", log = log))
    try {
      val work = tmpDir("transparent_pct")
      Tables.events(spark, sf0001).write.mode("overwrite").parquet(work)
      val ev = spark.read.parquet(work)
      def q() = ev.filter(col("value") > 3)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(expr("median(value)").as("med"),
          expr("percentile(value, 0.9)").as("p90"))
      val r1 = q().collect()
      val r2 = q().collect()
      assert(r1.toSeq == r2.toSeq)
      assert(log.messages.exists(_.startsWith("cache miss")), log.messages)
      assert(log.messages.exists(_.startsWith("cache hit")), log.messages)
      QueryCacheTransparent.disable(spark)
      assert(q().collect().toSeq == r1.toSeq)
    } finally QueryCacheTransparent.disable(spark)
  }

  test("extensions session: now()-relative transparent bound hits on second run") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force base session/context creation first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.ext.QueryCacheExtensions)
      .getOrCreate()
    try {
      assert(ext ne base)
      val cache = new MemoryQueryCache()
      val log = new RecordingLog
      QueryCacheTransparent.configure(QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", log = log).withDynamicBounds)

      // hour-align the base so the -10h and -10h+5min rows land in the
      // SAME hour bucket regardless of wall-clock minute (at :56, un-
      // aligned -10h and -10h+5min straddle an hour boundary → 3 groups)
      val nowMs0 = System.currentTimeMillis()
      val nowMs = nowMs0 - (nowMs0 % (3600L * 1000))
      import ext.implicits._
      val rows = Seq(
        (new java.sql.Timestamp(nowMs - 1L * 3600 * 1000), 5.0),
        (new java.sql.Timestamp(nowMs - 10L * 3600 * 1000), 7.0),
        (new java.sql.Timestamp(nowMs - 10L * 3600 * 1000 + 300000), 9.0),
        (new java.sql.Timestamp(nowMs - 100L * 3600 * 1000), 11.0))
      val work = tmpDir("extnow")
      rows.toDF("ts", "v").write.mode("overwrite").parquet(work)
      ext.read.parquet(work).createOrReplaceTempView("evx")

      def run() = ext.sql(
        """SELECT date_trunc('HOUR', ts) AS h, sum(v) AS sv FROM evx
           WHERE ts >= now() - INTERVAL 48 HOURS
           GROUP BY date_trunc('HOUR', ts)""").collect()
          .map(r => (r.getTimestamp(0), r.getDouble(1))).sortBy(_._1.getTime)

      val r1 = run()
      val r2 = run() // same shape -> same fingerprint -> warm hit
      assert(r1.toSeq == r2.toSeq)
      assert(r1.map(_._2).toSeq == Seq(16.0, 5.0), r1.toSeq) // 100h-old row excluded
      val misses = log.history.filter(_.msg.startsWith("cache miss"))
      val hits = log.history.filter(_.msg.startsWith("cache hit"))
      assert(misses.nonEmpty && hits.nonEmpty,
        s"expected miss then hit, got: ${log.messages}")
      assert(hits.head.fingerprint == misses.head.fingerprint,
        "now()-relative runs produced different fingerprints")

      // non-bucketed aggregate with a now() bound: decide() bails, the
      // restore path must freeze the wrapper back to vanilla semantics
      val n = ext.sql(
        """SELECT count(*) AS c FROM evx
           WHERE ts >= now() - INTERVAL 48 HOURS""").collect()(0).getLong(0)
      assert(n == 3L)
      // a now() bound under OR is NOT a strippable conjunct: the wrap rule
      // must leave it for ComputeCurrentTime and the result stays vanilla
      val m = ext.sql(
        """SELECT count(*) AS c FROM evx
           WHERE ts >= now() - INTERVAL 48 HOURS OR v > 10.0""")
        .collect()(0).getLong(0)
      assert(m == 4L) // 3 recent rows + the 100h-old v=11.0 row

      // a DIFFERENT offset is a different bound expression — it must NOT
      // share state with the 48h query (FrozenNowBound prints its payload
      // into the fingerprint)
      log.clear()
      val r24 = ext.sql(
        """SELECT date_trunc('HOUR', ts) AS h, sum(v) AS sv FROM evx
           WHERE ts >= now() - INTERVAL 24 HOURS
           GROUP BY date_trunc('HOUR', ts)""").collect()
      assert(r24.map(_.getDouble(1)).sorted.toSeq == Seq(5.0, 16.0), r24.toSeq)
      val miss24 = log.history.filter(_.msg.startsWith("cache miss"))
      assert(miss24.nonEmpty, s"24h variant should cold-miss: ${log.messages}")
      assert(miss24.head.fingerprint != misses.head.fingerprint,
        "different now() offsets must not share a fingerprint")
    } finally {
      QueryCacheTransparent.disable(ext)
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("transparent mode: non-cacheable query runs vanilla untouched") {
    val log = new RecordingLog
    QueryCacheTransparent.enable(spark, QueryCacheConfig(new MemoryQueryCache(),
      defaultTemporalColumn = "ts", log = log))
    try {
      val li = Tables.lineitem(spark, sf0001)
      val n = li.groupBy("l_returnflag")
        .agg(countDistinct("l_orderkey").as("d")).count()
      assert(n == 3)
      // the optimizer has already expanded count(distinct) into nested
      // aggregates by the time the rule runs — either bail message is fine
      assert(log.messages.exists(_.startsWith("not caching")), log.messages)
    } finally QueryCacheTransparent.disable(spark)
  }

  test("transparent rule: non-cacheable plans pay sub-millisecond analysis overhead") {
    // the injected rule runs on EVERY optimization of every plan in the
    // session — its bail path must be noise, not a planning-time tax.
    // Timed directly against rule.apply (pure plan work, no jobs):
    //  - a non-aggregate plan exits on the structural pre-check;
    //  - an aggregate-over-join plan pays decide()'s fingerprint + bail.
    import org.apache.spark.sql.graftshim.Shims
    QueryCacheTransparent.configure(QueryCacheConfig(new MemoryQueryCache(),
      defaultTemporalColumn = "ts"))
    try {
      val rule = new graft.ext.QueryCacheRule(spark)
      val li = Tables.lineitem(spark, sf0001)
      val noAgg = Shims.queryExecution(
        li.filter(col("l_quantity") > 10).select("l_orderkey")).analyzed
      val aggBail = Shims.queryExecution(
        li.as("a").join(li.as("b"), "l_orderkey")
          .agg(count(lit(1)).as("c"))).analyzed
      def medianMicros(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Double = {
        (1 to 50).foreach(_ => rule.apply(plan)) // JIT warmup
        val times = (1 to 200).map { _ =>
          val t0 = System.nanoTime()
          rule.apply(plan)
          (System.nanoTime() - t0) / 1e3
        }
        times.sorted.apply(times.size / 2)
      }
      val us1 = medianMicros(noAgg)
      val us2 = medianMicros(aggBail)
      info(f"non-aggregate bail: $us1%.1f us; aggregate-over-join bail: $us2%.1f us")
      // measured ~11us / ~370us on an idle machine. Absolute wall-clock
      // bounds flake on heavily loaded or virtualized hosts (ADVICE r5
      // #4), so the hard assertions are opt-in (SPARK_GRAFT_PERF_ASSERT);
      // the default run still exercises the path and reports the medians.
      if (sys.env.contains("SPARK_GRAFT_PERF_ASSERT")) {
        assert(us1 < 1000.0, s"non-aggregate pre-check took $us1 us (>= 1ms)")
        assert(us2 < 5000.0, s"aggregate bail took $us2 us (>= 5ms)")
      } else {
        // unconditional sanity: the pre-check must stay far cheaper than
        // a full decide() — a RELATIVE bound immune to machine load
        assert(us1 < us2 * 10 + 1000.0,
          s"non-aggregate pre-check ($us1 us) is not cheap vs bail ($us2 us)")
      }
    } finally QueryCacheTransparent.disable(spark)
  }

  test("ivf search: deterministic, subset of corpus, finds the query vector") {
    import graft.operators.{IVF, Similarity}
    val emb = Tables.embeddings(spark, sf0001)
    val model = IVF.fit(emb, k = 16, sampleN = 500, iters = 5)
    assert(model.k == 16)
    val indexed = IVF.index(emb, model)
    // every vector lands in exactly one cell, cells cover the corpus
    assert(indexed.where(col("ivf_cell").isNull).count() == 0)
    assert(indexed.select("ivf_cell").distinct().count() <= 16)
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .first().getSeq[Float](0)
    val got = IVF.search(indexed, model, q, k = 10, nProbe = 4)
      .collect().map(_.getLong(0))
    // the query's own vector is its nearest neighbor and its cell is
    // always probed first
    assert(got.head == 7L)
    // deterministic across runs
    val again = IVF.search(IVF.index(emb, IVF.fit(emb, 16, 500, 5)), model, q,
      k = 10, nProbe = 4).collect().map(_.getLong(0))
    assert(got.toSeq == again.toSeq)
    // recall against brute force (random corpus: partial recall expected,
    // probing 4/16 cells)
    val brute = Similarity.bruteForceTopK(emb, q, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got.count(brute.contains) >= 3, s"recall too low: $got vs $brute")
  }

  test("streaming stateful dedup keeps exactly the first doc per content") {
    import graft.streaming.StreamingDedup
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    // plant exact duplicates with higher ids
    val dups = docs.limit(40).withColumn("doc_id", col("doc_id") + 10000)
    val work = tmpDir("sdedup")
    docs.unionByName(dups).write.mode("overwrite").parquet(work)
    val schema = spark.read.parquet(work).schema
    val stream = spark.readStream.schema(schema).parquet(work)
    val out = StreamingDedup.firstSeen(stream)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.sql("SELECT doc_id FROM dedup_out")
      .collect().map(_.getLong(0))
    assert(kept.length == docs.count()) // one per distinct text
    assert(kept.forall(_ < 10000)) // always the FIRST (lowest) id
  }

  test("watermark-bounded streaming dedup evicts expired fingerprints") {
    import graft.streaming.StreamingDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = mem.toDF().toDF("doc_id", "text", "ts")
    val out = StreamingDedup.byFingerprintWithinWatermark(df, "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("wmdedup").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    try {
      mem.addData((1L, "alpha", t(0)), (2L, "alpha", t(1)), (3L, "beta", t(0)))
      q.processAllAvailable()
      mem.addData((4L, "alpha", t(5))) // duplicate within the horizon
      q.processAllAvailable()
      mem.addData((5L, "gamma", t(60))) // advances watermark past alpha+10m
      q.processAllAvailable()
      mem.addData((6L, "alpha", t(61))) // same content, state expired
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.sql("SELECT doc_id FROM wmdedup")
      .collect().map(_.getLong(0)).toSet
    assert(Set(1L, 3L, 5L).subsetOf(ids), s"firsts missing: $ids")
    assert(!ids.contains(2L) && !ids.contains(4L),
      s"within-horizon duplicate emitted: $ids")
    assert(ids.contains(6L),
      s"fingerprint state not evicted after the watermark passed: $ids")
  }

  test("streaming session windows equal batch session windows") {
    val work = tmpDir("session")
    val ev = Tables.events(spark, sf0001)
    ev.write.mode("overwrite").parquet(work)
    val schema = spark.read.parquet(work).schema
    val stream = spark.readStream.schema(schema).parquet(work)
    val agg = StreamingAgg.sessionAgg(stream, "ts", "10 minutes", "1 minute",
      keyCols = Seq(col("user_id")),
      aggCols = Seq(count(lit(1)).as("cnt")))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("session_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql(
      "SELECT session_window.start AS s, user_id, cnt FROM session_out")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val want = ev
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start"), col("user_id"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming windowed agg equals batch windowed agg (no late data)") {
    val work = tmpDir("stream")
    val ev = Tables.events(spark, sf0001)
    ev.write.mode("overwrite").parquet(work)
    val schema = spark.read.parquet(work).schema

    val stream = spark.readStream.schema(schema).parquet(work)
    val agg = StreamingAgg.windowedAgg(stream, "ts", "1 hour", "10 minutes",
      groupCols = Seq(col("event_type")),
      aggCols = Seq(count(lit(1)).as("cnt"), sum("value").as("sv")))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.sql(
      "SELECT window.start AS ws, event_type, cnt, sv FROM stream_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6)))
      .toSet
    val want = ev
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
      .select(col("window.start"), col("event_type"), col("cnt"), col("sv"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6)))
      .toSet
    assert(got == want)
  }
}
