package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cache.MemoryQueryCache
import graft.log.RecordingLog
import graft.streaming.CacheWarmer

/** The stream-warmed cache's race and ordering contracts. The end-to-end
  * stream scenario is q_stream_cache_warm (oracled); these tests drive
  * `tick` directly to pin the cases a well-behaved stream never shows:
  * a tick whose directory already holds MORE data than its batch, and a
  * tick that arrives out of order.
  */
class CacheWarmerSpec extends AnyFunSuite {
  import TestSparkSession._
  import spark.implicits._

  private def eventsDf(idFrom: Int, idUntil: Int) =
    (idFrom until idUntil)
      .map(i => (i.toLong, s"t${i % 3}", i * 1.5,
        new java.sql.Timestamp(1700000000000L + i * 60000L)))
      .toDF("event_id", "event_type", "value", "ts")

  private def agg(work: String)(): DataFrame =
    spark.read.parquet(work)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("sum_id"))

  test("strict band: rows beyond the tick's batch are not double counted") {
    val work = Files.createTempDirectory("graft_warmer_").toString
    val log = new RecordingLog
    val cfg = QueryCacheConfig(new MemoryQueryCache,
      defaultTemporalColumn = "ts", log = log)
    val warmer = new CacheWarmer(spark, cfg, Seq(agg(work) _))

    // the directory ALREADY holds rows [0, 300) when tick 1's batch only
    // covers [0, 100): the strict ts < hwm+1 band must keep the capture
    // to the batch's horizon even though the scan sees all files
    eventsDf(0, 300).write.mode("overwrite").parquet(work)
    warmer.tick(eventsDf(0, 100).select("ts"))
    assert(log.messages.exists(_.contains("cache miss")))

    // tick 2 covers the rest; merge band is [hwm1+1, hwm2+1)
    warmer.tick(eventsDf(100, 300).select("ts"))
    assert(log.messages.exists(_.contains("cache hit")))

    val got = warmer.interactive(agg(work)())
      .orderBy("event_type").collect()
    val want = agg(work)().orderBy("event_type").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("warmer keeps percentile + top-k state warm across appends") {
    // the heavy-state aggregates through the streaming bridge: histogram
    // and heap states must merge correctly under the warmer's strict
    // bands, and interactive answers must equal batch after every cycle
    val work = Files.createTempDirectory("graft_warmer_").toString
    val log = new RecordingLog
    val cfg = QueryCacheConfig(new MemoryQueryCache,
      defaultTemporalColumn = "ts", log = log)
    def q(): DataFrame = spark.read.parquet(work)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        graft.functions.functions.top_k(
          struct(col("value").as("v"), col("event_id").as("id")), 3).as("top"))
    val warmer = new CacheWarmer(spark, cfg, Seq(q _))
    val splits = Seq(0, 150, 300, 450)
    splits.sliding(2).foreach { case Seq(a, b) =>
      eventsDf(a, b).write.mode("append").parquet(work)
      warmer.tick(eventsDf(a, b).select("ts"))
      val got = warmer.interactive(q()).orderBy("event_type").collect()
      val want = q().orderBy("event_type").collect()
      assert(got.toSeq == want.toSeq, s"after append [$a,$b)")
    }
    assert(log.messages.count(_.contains("cache miss")) == 1, log.messages)
    assert(log.messages.count(_.contains("cache hit")) >= 2, log.messages)
  }

  test("warmer keeps a static-dim JOIN aggregate warm across 3 appends") {
    val work = Files.createTempDirectory("graft_warmer_").toString
    val dimDir = Files.createTempDirectory("graft_warmdim_").toString
    // a small dimension keyed by event_type
    Seq(("t0", "alpha"), ("t1", "beta"), ("t2", "gamma"))
      .toDF("event_type", "label")
      .write.mode("overwrite").parquet(dimDir)
    val log = new RecordingLog
    val cfg = QueryCacheConfig(new MemoryQueryCache,
      defaultTemporalColumn = "ts", log = log)
      // declared by ABSOLUTE PATH: the scan reports file:-scheme paths,
      // and the candidate rule must match them scheme-blind
      .withStaticDimensions(dimDir)
    def q(): DataFrame = {
      val dim = spark.read.parquet(dimDir)
      spark.read.parquet(work).join(dim, "event_type")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("sum_id"))
    }
    val warmer = new CacheWarmer(spark, cfg, Seq(q _))
    // batches arrive in 4 chunks; tick after each, check after each
    val splits = Seq(0, 120, 240, 360, 480)
    splits.sliding(2).foreach { case Seq(from, until) =>
      eventsDf(from, until).write.mode("append").parquet(work)
      warmer.tick(eventsDf(from, until).select("ts"))
      val got = warmer.interactive(q()).orderBy("label").collect()
      val want = q().orderBy("label").collect()
      assert(got.toSeq == want.toSeq, s"divergence after append [$from,$until)")
    }
    // 1 cold miss, then every later tick and interactive run hits
    assert(log.messages.count(_.startsWith("cache miss")) == 1, log.messages)
    assert(log.messages.count(_.startsWith("cache hit")) >= splits.size - 2 + splits.size - 1,
      log.messages)
  }

  test("out-of-order tick is a no-op (monotone high-water mark)") {
    val work = Files.createTempDirectory("graft_warmer_").toString
    val cfg = QueryCacheConfig(new MemoryQueryCache,
      defaultTemporalColumn = "ts", log = new RecordingLog)
    val warmer = new CacheWarmer(spark, cfg, Seq(agg(work) _))

    eventsDf(0, 200).write.mode("overwrite").parquet(work)
    warmer.tick(eventsDf(0, 200).select("ts"))
    val hwm = warmer.lastHighWaterMicros.get

    // a straggler tick whose hwm is BELOW the cached watermark: now must
    // not regress, and the merged answer must not double-count [0, 50)
    warmer.tick(eventsDf(0, 50).select("ts"))
    assert(warmer.lastHighWaterMicros.get == hwm, "high-water mark regressed")

    val got = warmer.interactive(agg(work)())
      .orderBy("event_type").collect()
    val want = agg(work)().orderBy("event_type").collect()
    assert(got.toSeq == want.toSeq)
  }
}
