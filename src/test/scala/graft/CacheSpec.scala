package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cache.{CacheCapacityExceeded, MemoryQueryCache, ParquetQueryCache}
import graft.sources.Tables

/** Cache SPI contract (reference src/cache.rs): vacant miss, occupied
  * hit, overwrite-on-put, replay fidelity, invalidate — for both the
  * in-memory and the durable parquet store. */
class CacheSpec extends AnyFunSuite {
  import TestSparkSession._

  private def stateDF = Tables.events(spark, sf0001)
    .groupBy(col("event_type").as("_g0"))
    .agg(count(lit(1)).as("_s0_cnt"), sum("value").as("_s1_sum"))

  private def roundTrip(cache: graft.cache.QueryCache): Unit = {
    assert(cache.get("fp1").isEmpty) // vacant
    val df = stateDF
    val expect = df.collect().map(_.toString).sorted.toSeq
    val stored = cache.put("fp1", 1000L, df)
    assert(stored.collect().map(_.toString).sorted.toSeq == expect)
    val hit = cache.get("fp1").get
    assert(hit.timestampMicros == 1000L)
    assert(hit.read(spark).collect().map(_.toString).sorted.toSeq == expect)
    assert(hit.schema.fieldNames.toSeq == Seq("_g0", "_s0_cnt", "_s1_sum"))
    // overwrite (reference src/cache.rs:109-114)
    cache.put("fp1", 2000L, df.limit(1))
    val hit2 = cache.get("fp1").get
    assert(hit2.timestampMicros == 2000L)
    assert(hit2.read(spark).count() == 1)
    cache.invalidate("fp1")
    assert(cache.get("fp1").isEmpty)
  }

  test("MemoryQueryCache contract")(roundTrip(new MemoryQueryCache()))

  test("ParquetQueryCache contract")(
    roundTrip(new ParquetQueryCache(tmpDir("pqcache"))))

  test("ParquetQueryCache putAppend chains delta segments, compacts at the cap") {
    import spark.implicits._
    val dir = tmpDir("pq-append")
    val c = new ParquetQueryCache(dir, appendChainMax = 3, graceMs = 0L)
    def rows(r: Range) = r.map(i => (i.toLong, s"v$i")).toDF("id", "s")
    def segs(): Int = {
      val root = new java.io.File(dir)
      val entry = root.listFiles().filter(_.isDirectory).head
      val metas = entry.listFiles().map(_.getName)
        .filter(n => n.startsWith("meta-") && n.endsWith(".json"))
      val head = metas.maxBy(_.stripPrefix("meta-").stripSuffix(".json").toLong)
      val json = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(entry, head).toPath))
      // head dataDir + newline-separated extraDataDirs
      1 + json.split("\"extraDataDirs\":\"").last.takeWhile(_ != '"')
        .split("\\\\n").count(_.nonEmpty)
    }
    // memory caches don't support appends — the default declines
    assert(new MemoryQueryCache().putAppend("x", 1L, rows(0 until 1)).isEmpty)
    // vacant entry: putAppend declines (nothing to chain onto)
    assert(c.putAppend("fp", 1L, rows(0 until 3)).isEmpty)
    c.put("fp", 1L, rows(0 until 3))
    assert(segs() == 1)
    val r2 = c.putAppend("fp", 2L, rows(3 until 5))
    assert(r2.isDefined && r2.get.count() == 5)
    assert(segs() == 2)
    val r3 = c.putAppend("fp", 3L, rows(5 until 6))
    assert(r3.isDefined && r3.get.count() == 6)
    assert(segs() == 3)
    // chain at the cap: decline; the caller full-puts (compaction)
    assert(c.putAppend("fp", 4L, rows(6 until 7)).isEmpty)
    c.put("fp", 4L, rows(0 until 7))
    assert(segs() == 1)
    // replay through get() unions the whole chain at every step
    val got = c.get("fp").get
    assert(got.timestampMicros == 4L)
    assert(got.read(spark).as[(Long, String)].collect().sorted.toSeq ==
      (0 until 7).map(i => (i.toLong, s"v$i")))
    // an EMPTY delta neither commits a meta nor grows the chain — the
    // returned replay is the unchanged old chain (no-op refresh contract)
    val segsBefore = segs()
    val rEmpty = c.putAppend("fp", 5L, rows(0 until 0))
    assert(rEmpty.isDefined && rEmpty.get.count() == 7)
    assert(segs() == segsBefore)
    assert(c.get("fp").get.timestampMicros == 4L,
      "an empty append advanced the watermark")
    // schema drift declines (caller's full put re-materializes)
    assert(c.putAppend("fp", 5L,
      Seq((1, 2)).toDF("a", "b")).isEmpty)
    // a fresh reader (new cache handle) sees the chained entry intact
    val c2 = new ParquetQueryCache(dir)
    val again = c2.get("fp").get
    assert(again.read(spark).count() == 7)
  }

  test("MemoryQueryCache capacity guard") {
    val cache = new MemoryQueryCache(maxStateRows = 2)
    intercept[CacheCapacityExceeded](cache.put("fp", 1L, stateDF))
    assert(cache.get("fp").isEmpty)
  }

  test("MemoryQueryCache bounds entry count via LRU eviction") {
    val cache = new MemoryQueryCache(maxEntries = 3)
    val one = stateDF.limit(1)
    (1 to 5).foreach { i =>
      cache.put(s"fp$i", i.toLong, one)
      cache.recordSourcePaths(s"fp$i", Seq(s"/data/t$i"))
    }
    // the source-path index must follow evicted entries out — otherwise
    // a long session's index grows with every fingerprint ever cached
    assert(cache.recordedSourcePaths("fp1").isEmpty &&
      cache.recordedSourcePaths("fp2").isEmpty,
      "source index retained evicted entries")
    assert(cache.recordedSourcePaths("fp5").nonEmpty)
    cache.invalidate("fp5")
    assert(cache.recordedSourcePaths("fp5").isEmpty,
      "source index retained invalidated entry")
    cache.put("fp5", 5L, one)
    assert(cache.size == 3, s"session grew past maxEntries: ${cache.size}")
    // oldest evicted, newest retained
    assert(cache.get("fp1").isEmpty && cache.get("fp2").isEmpty)
    assert(cache.get("fp5").nonEmpty)
    // recently-USED survives the next eviction (access order, not insert)
    assert(cache.get("fp3").nonEmpty)
    cache.put("fp6", 6L, one) // evicts fp4 (LRU), not the just-read fp3
    assert(cache.get("fp3").nonEmpty && cache.get("fp4").isEmpty)
  }

  test("MemoryQueryCache expires entries past the TTL") {
    val cache = new MemoryQueryCache(ttlMs = 1L)
    cache.put("fp", 1L, stateDF.limit(1))
    Thread.sleep(10)
    assert(cache.get("fp").isEmpty, "TTL-expired entry still served")
    assert(cache.size <= 1)
    val forever = new MemoryQueryCache() // ttl disabled by default
    forever.put("fp", 1L, stateDF.limit(1))
    Thread.sleep(10)
    assert(forever.get("fp").nonEmpty)
  }

  test("ParquetQueryCache defers deletion of superseded versions") {
    val dir = tmpDir("pqdefer")
    val fsPath = new org.apache.hadoop.fs.Path(dir)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs() = fs.listStatus(
      new org.apache.hadoop.fs.Path(dir, graft.cache.QueryCache.keyHash("fp")))
      .map(_.getPath.getName).filter(_.startsWith("data-")).toSet

    // within the retention window (default grace), an in-flight reader of
    // the superseded version must still find its files (ADVICE r2)
    val c = new ParquetQueryCache(dir)
    c.put("fp", 1L, stateDF)
    val v1 = c.get("fp").get
    c.put("fp", 2L, stateDF.limit(2))
    assert(dataDirs().size == 2, s"superseded version deleted eagerly: ${dataDirs()}")
    assert(v1.read(spark).count() == stateDF.count()) // old handle still readable
    assert(c.get("fp").get.timestampMicros == 2L)

    // past the window (grace 0, keep 1) old versions are collected
    val tight = new ParquetQueryCache(dir, keepVersions = 1, graceMs = 0L)
    tight.put("fp", 3L, stateDF.limit(1))
    tight.put("fp", 4L, stateDF.limit(1))
    assert(dataDirs().size <= 2, s"cleanup never ran: ${dataDirs()}")
    assert(tight.get("fp").get.timestampMicros == 4L)
  }

  test("ParquetQueryCache evicts least-recently-written entries past maxEntries") {
    val dir = tmpDir("pq-evict")
    val c = new ParquetQueryCache(dir, maxEntries = 2, sweepIntervalMs = 0L)
    val one = stateDF.limit(1)
    c.put("fpA", 1L, one); Thread.sleep(20)
    c.put("fpB", 2L, one); Thread.sleep(20)
    c.put("fpC", 3L, one) // the sweep on this put evicts fpA
    assert(c.get("fpA").isEmpty, "oldest entry not evicted")
    assert(c.get("fpB").nonEmpty && c.get("fpC").nonEmpty)
    assert(c.stats.evictions >= 1)
    // evictions are durable tombstones: a fresh reader agrees
    val c2 = new ParquetQueryCache(dir)
    assert(c2.get("fpA").isEmpty && c2.get("fpB").nonEmpty)
  }

  test("ParquetQueryCache maxBytes keeps the newest entry, evicts the rest") {
    val dir = tmpDir("pq-bytes")
    val c = new ParquetQueryCache(dir, maxBytes = 1L, sweepIntervalMs = 0L)
    val one = stateDF.limit(1)
    c.put("fpA", 1L, one); Thread.sleep(20)
    c.put("fpB", 2L, one)
    // a lone over-budget entry must not flap: the newest always survives
    assert(c.get("fpB").nonEmpty, "newest entry evicted under maxBytes")
    assert(c.get("fpA").isEmpty)
  }

  test("ParquetQueryCache expires entries past the TTL sweep") {
    val dir = tmpDir("pq-ttl")
    val c = new ParquetQueryCache(dir, ttlMs = 50L, sweepIntervalMs = 0L)
    val one = stateDF.limit(1)
    c.put("old", 1L, one)
    Thread.sleep(150)
    c.put("new", 2L, one) // this put's sweep expires "old"
    assert(c.get("old").isEmpty, "TTL-expired entry still resolvable")
    assert(c.get("new").nonEmpty)
    assert(c.stats.evictions >= 1)
  }

  test("ParquetQueryCache: a reader resolved before eviction still completes") {
    val dir = tmpDir("pq-evict-race")
    // default graceMs (10 min): evicted files stay for in-flight readers
    val c = new ParquetQueryCache(dir, maxEntries = 1, sweepIntervalMs = 0L)
    c.put("fpOld", 1L, stateDF)
    val resolved = c.get("fpOld").get // reader resolves the meta NOW
    Thread.sleep(20)
    c.put("fpNew", 2L, stateDF.limit(1)) // sweep tombstones fpOld
    assert(c.get("fpOld").isEmpty, "tombstoned entry still resolvable")
    // the in-flight reader's scan still succeeds — files aged, not yanked
    assert(resolved.read(spark).count() == stateDF.count())
    assert(c.stats.evictions >= 1)
  }

  test("ParquetQueryCache survives a new reader (durable)") {
    val dir = tmpDir("pqdur")
    val c1 = new ParquetQueryCache(dir)
    c1.put("fpX", 42L, stateDF)
    val c2 = new ParquetQueryCache(dir) // fresh instance, same directory
    val hit = c2.get("fpX").get
    assert(hit.timestampMicros == 42L)
    assert(hit.read(spark).count() == stateDF.count())
  }

  test("ParquetQueryCache: concurrent same-fp writers with a live reader") {
    // the versioned-meta + per-writer-data-dir + deferred-deletion design
    // claims: two sessions putting the SAME fingerprint while a third
    // reads can never hand the reader a torn or missing version. Writers
    // alternate states of 1 vs 4 rows — any read observing a complete
    // version counts exactly 1 or 4; anything else (0, FileNotFound,
    // parse error) is a race defect.
    val dir = tmpDir("pqrace")
    val oneRow = stateDF.limit(1)
    val fourRows = stateDF.limit(4)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    def submit(f: => Unit) = pool.submit(new Runnable {
      def run(): Unit =
        try f catch { case t: Throwable => errors.add(t.toString); () }
    })
    val iters = 6
    val w1 = submit {
      val c = new ParquetQueryCache(dir)
      (0 until iters).foreach(i => c.put("fpR", 10L + i, oneRow))
    }
    val w2 = submit {
      val c = new ParquetQueryCache(dir)
      (0 until iters).foreach(i => c.put("fpR", 20L + i, fourRows))
    }
    val r = submit {
      val c = new ParquetQueryCache(dir)
      while (!(w1.isDone && w2.isDone)) {
        c.get("fpR").foreach { hit =>
          val n = hit.read(spark).count()
          if (n != 1 && n != 4) errors.add(s"torn read: $n rows")
          reads.incrementAndGet()
        }
      }
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
    assert(errors.isEmpty, s"race defects: ${errors.toArray.mkString("; ")}")
    assert(reads.get() > 0, "reader never observed an entry")
    // the surviving head is one of the writers' final versions
    val n = new ParquetQueryCache(dir).get("fpR").get.read(spark).count()
    assert(n == 1 || n == 4, s"final state has $n rows")
  }

  test("invalidateForTable drops only entries that read the table") {
    val cache = new MemoryQueryCache()
    val one = stateDF.limit(1)
    cache.put("fpA", 1L, one)
    cache.recordSourcePaths("fpA", Seq("file:/data/dims/customer.parquet"))
    cache.put("fpB", 1L, one)
    cache.recordSourcePaths("fpB", Seq("file:/data/facts/events"))
    // matches by basename / extension-less basename, case-insensitively —
    // the same rules staticDimensionTables declarations use
    assert(cache.invalidateForTable("CUSTOMER") == 1)
    assert(cache.get("fpA").isEmpty, "entry reading the table survived")
    assert(cache.get("fpB").nonEmpty, "unrelated entry was dropped")
    assert(cache.invalidateForTable("customer") == 0) // idempotent
    assert(cache.invalidateForTable("/data/facts/events") == 1) // full path
    assert(cache.get("fpB").nonEmpty == false)
    // authority-bearing URIs match by plain path: the documented
    // full-path disambiguation remedy must work without the user
    // spelling scheme+authority
    cache.put("fpC", 1L, one)
    cache.recordSourcePaths("fpC", Seq("hdfs://nn:8020/warehouse/customer"))
    assert(cache.invalidateForTable("/warehouse/customer") == 1)
    assert(cache.get("fpC").isEmpty)
  }

  test("static-dim declarations match scan paths scheme-blind") {
    val cfg = QueryCacheConfig(new MemoryQueryCache,
      defaultTemporalColumn = "ts").withStaticDimensions("/data/dims/customer")
    // scans report file:/hdfs: schemes where users declare bare paths
    assert(cfg.isDeclaredStatic(Seq("file:/data/dims/customer")))
    assert(cfg.isDeclaredStatic(Seq("hdfs://nn:8020/data/dims/customer")))
    assert(!cfg.isDeclaredStatic(Seq("file:/data/dims/orders")))
    // and basename declarations still work on scheme-bearing paths
    val byName = QueryCacheConfig(new MemoryQueryCache,
      defaultTemporalColumn = "ts").withStaticDimensions("customer")
    assert(byName.isDeclaredStatic(Seq("file:/x/y/customer.parquet")))
  }

  test("shared ParquetQueryCache: query sessions racing an invalidator stay correct") {
    // two independent cache handles over ONE directory run the same
    // cached aggregate in a loop (each iteration is a fresh get->merge->
    // put cycle) while a third handle invalidates the table's entries
    // under them. The deferred-deletion design claims any interleaving is
    // safe; the invariant checked is the strongest one available: EVERY
    // query result equals the vanilla answer over the (static) table —
    // an invalidate landing between a get and its put can at worst cost
    // a re-miss, never a wrong or torn answer.
    val dir = tmpDir("pqstress")
    val work = tmpDir("pqstress-tbl")
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(work)
    def q() = spark.read.parquet(work).filter(col("value") > 1)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    val expect = q().collect().map(_.toString).sorted.toSeq
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val invalidations = new java.util.concurrent.atomic.AtomicInteger(0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    def submit(f: => Unit) = pool.submit(new Runnable {
      def run(): Unit =
        try f catch { case t: Throwable => errors.add(t.toString); () }
    })
    def runner(iters: Int) = submit {
      val cache = new ParquetQueryCache(dir)
      (0 until iters).foreach { _ =>
        val sess = QueryCacheSession(spark,
          QueryCacheConfig(cache, defaultTemporalColumn = "ts"))
        val got = sess.run(q()).collect().map(_.toString).sorted.toSeq
        if (got != expect)
          errors.add(s"wrong answer under race: ${got.size} vs ${expect.size} rows")
        hits.addAndGet(cache.stats.hits.toInt)
      }
    }
    val r1 = runner(8)
    val r2 = runner(8)
    // invalidation rounds until ONE live entry is caught, then stop so
    // late iterations warm-hit. (A fixed 4×300ms window failed
    // spuriously on a loaded machine where no put committed inside it.)
    val inv = submit {
      val admin = new ParquetQueryCache(dir)
      var rounds = 0
      while (invalidations.get() == 0 && rounds < 400 &&
          !(r1.isDone && r2.isDone)) {
        Thread.sleep(300)
        invalidations.addAndGet(admin.invalidateForTable(work))
        rounds += 1
      }
      // runners already done with nothing caught mid-run: their last put
      // is a live committed entry — a final sweep catches it, keeping the
      // "caught a live entry" precondition meaningful on any schedule
      if (invalidations.get() == 0)
        invalidations.addAndGet(admin.invalidateForTable(work))
    }
    pool.shutdown()
    assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    assert(errors.isEmpty, s"race defects: ${errors.toArray.mkString("; ")}")
    assert(invalidations.get() > 0, "invalidator never caught a live entry")
    assert(hits.get() > 0, "no run ever warm-hit — race test degenerated")
  }

  test("chained durable aggregates survive concurrent runners + invalidator") {
    // the static-table stress above never appends, so warm commits are
    // no-ops and the CHAIN path never engages. This variant grows the
    // table in phases with a barrier between phases (within a phase the
    // data is static, so the invariant stays exact): two runners race
    // their putAppend chain commits against each other — one meta rename
    // wins, the loser's segment orphans, and either complete chain holds
    // the full content (both deltas cover [wm, now)) — while an
    // invalidator tombstones the entry mid-run in one phase. Every
    // answer must equal the phase's vanilla.
    val dir = tmpDir("pqchainstress")
    val work = tmpDir("pqchainstress-tbl")
    val ev = Tables.events(spark, sf0001)
    def pct(p: Double) = ev.selectExpr(
      s"CAST(percentile_approx(unix_micros(ts), $p) AS LONG)").first().getLong(0)
    val cutsUs = Seq(pct(0.5), pct(0.62), pct(0.74), pct(0.86))
    val maxUs = ev.selectExpr("max(unix_micros(ts))").first().getLong(0)
    val bounds = (Seq(Long.MinValue) ++ cutsUs ++ Seq(Long.MaxValue))
      .sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
    def q() = spark.read.parquet(work).filter(col("value") > 1)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        // DECIMAL sum: chained merges reorder additions, and a double
        // sum's last-ulp wobble would fail the exact string compare
        sum(col("value").cast("decimal(18,4)")).as("sv"),
        max(col("value")).as("mx"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    var invalidations = 0
    bounds.zipWithIndex.foreach { case ((lo, hi), phase) =>
      ev.filter(col("ts") >= timestamp_micros(lit(lo)) &&
          col("ts") < timestamp_micros(lit(hi)))
        .write.mode(if (phase == 0) "overwrite" else "append").parquet(work)
      val expect = q().collect().map(_.toString).sorted.toSeq
      val nowUs = if (hi == Long.MaxValue) maxUs + 1000000L else hi
      def runner() = pool.submit(new Runnable {
        def run(): Unit = try {
          val cache = new ParquetQueryCache(dir)
          (0 until 3).foreach { _ =>
            val got = QueryCacheSession(spark, QueryCacheConfig(cache,
              defaultTemporalColumn = "ts",
              overrideNowMicros = Some(nowUs)))
              .run(q()).collect().map(_.toString).sorted.toSeq
            if (got != expect)
              errors.add(s"phase $phase wrong answer: ${got.size} vs " +
                s"${expect.size} rows")
          }
        } catch { case t: Throwable => errors.add(t.toString); () }
      })
      val fs = Seq(runner(), runner()) ++
        (if (phase == 2) Seq(pool.submit(new Runnable {
          def run(): Unit = try {
            Thread.sleep(200)
            invalidations += new ParquetQueryCache(dir)
              .invalidateForTable(work)
          } catch { case t: Throwable => errors.add(t.toString); () }
        })) else Nil)
      fs.foreach(_.get(240, java.util.concurrent.TimeUnit.SECONDS))
    }
    pool.shutdown()
    assert(errors.isEmpty, s"race defects: ${errors.toArray.mkString("; ")}")
    assert(invalidations > 0, "invalidator never caught a live entry")
    // the final (post-invalidation) phases rebuilt the entry and the
    // last small appends CHAINED: the head meta carries a segment tail
    val entryDir = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .maxBy(d => d.listFiles().map(_.lastModified).max)
    val head = entryDir.listFiles().map(_.getName)
      .filter(n => n.startsWith("meta-") && n.endsWith(".json"))
      .maxBy(_.stripPrefix("meta-").stripSuffix(".json").toLong)
    val json = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(entryDir, head).toPath))
    assert(json.split("\"extraDataDirs\":\"").last.takeWhile(_ != '"').nonEmpty,
      s"no warm commit ever chained under the race: $json")
  }

  test("describe: one operational row per live entry, both caches, " +
      "cross-process for the durable one") {
    // memory: a real cached query so source paths + repairs are indexed
    val work = tmpDir("descmem")
    Tables.events(spark, sf0001).limit(500)
      .write.mode("overwrite").parquet(work)
    val mem = new MemoryQueryCache()
    def q(df: org.apache.spark.sql.DataFrame) = df.filter(col("value") > 1)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    QueryCacheSession(spark, QueryCacheConfig(mem,
      defaultTemporalColumn = "ts", overrideNowMicros = Some(7777000000L)))
      .run(q(spark.read.parquet(work))).collect()
    val md = mem.describe(spark).collect()
    assert(md.length == 1, md.toSeq)
    val mr = md.head
    assert(mr.getAs[String]("fingerprint").nonEmpty)
    assert(mr.getAs[Long]("watermark_micros") == 7777000000L)
    assert(mr.getAs[Long]("state_rows") > 0)
    assert(mr.getAs[Seq[String]]("source_paths").exists(_.contains("descmem")))
    assert(mr.getAs[Int]("pending_repairs") == 0)
    assert(mem.repairRange(work, 0L, 1000L) == 1)
    assert(mem.describe(spark).collect()
      .head.getAs[Int]("pending_repairs") == 1)
    // durable: described from persisted metas by a FRESH handle
    val dir = tmpDir("descdur")
    val writer = new ParquetQueryCache(dir)
    writer.put("fpDesc", 4242L, stateDF)
    val other = new ParquetQueryCache(dir)
    val dd = other.describe(spark).collect()
    assert(dd.length == 1, dd.toSeq)
    val dr = dd.head
    assert(dr.getAs[String]("fingerprint") == "fpDesc")
    assert(dr.getAs[Long]("watermark_micros") == 4242L)
    assert(dr.getAs[Long]("state_bytes") > 0)
    assert(dr.getAs[Int]("segments") >= 1)
    assert(dr.getAs[Long]("version") > 0)
    assert(dr.getAs[Long]("state_rows") == -1L)
    // a tombstoned entry disappears from the listing
    other.invalidate("fpDesc")
    assert(other.describe(spark).collect().isEmpty)
  }

  test("ParquetQueryCache invalidateForTable works cross-process via meta") {
    val dir = tmpDir("pqinv")
    val writer = new ParquetQueryCache(dir)
    writer.put("fpSrc", 1L, stateDF) // state plan reads sf0.001 events
    // a FRESH instance has no in-process source index — the remedy must
    // resolve the table from the source paths persisted in meta.json
    val other = new ParquetQueryCache(dir)
    assert(other.get("fpSrc").nonEmpty)
    assert(other.invalidateForTable("events") == 1)
    assert(other.get("fpSrc").isEmpty)
    assert(writer.get("fpSrc").isEmpty, "writer still sees the dropped entry")
    assert(other.invalidateForTable("events") == 0)
  }
}
