package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.cache.MemoryQueryCache
import graft.log.RecordingLog

/** Property: for ANY monotone-timestamp event table and ANY split point,
  * cold-on-prefix → append-suffix → warm equals a full recompute
  * (SURVEY §5.4; generator mirrors the reference's 1-row-per-second
  * synthetic stream, examples/demo.rs:86-121). */
class IncrementalPropertySpec extends AnyFunSuite {
  import TestSparkSession._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("service", StringType),
    StructField("value", DoubleType)))

  private val services = Seq("foo", "bar", "baz", "qux", "quux")

  private case class Case(rows: Seq[(Long, String, Double)], splitIdx: Int, q: Int)

  private val genCase: Gen[Case] = for {
    n <- Gen.choose(40, 200)
    // second-aligned: java.sql.Timestamp carries millis, so sub-milli
    // timestamps would silently truncate BELOW the watermark and turn the
    // boundary row into "late data" (the S1 contract drops it — by design)
    baseUs <- Gen.choose(1600000000L, 1700000000L).map(_ * 1000000L)
    steps <- Gen.listOfN(n, Gen.choose(1L, 3000L)) // seconds between rows
    vals <- Gen.listOfN(n, Gen.choose(-1000.0, 1000.0))
    svc <- Gen.listOfN(n, Gen.choose(0, services.size - 1))
    splitIdx <- Gen.choose(1, n - 1)
    q <- Gen.choose(0, 2)
  } yield {
    val ts = steps.scanLeft(baseUs)((acc, s) => acc + s * 1000000L).tail
    Case(ts.lazyZip(svc).lazyZip(vals).map((t, s, v) => (t, services(s), v)),
      splitIdx, q)
  }

  private def toDF(rows: Seq[(Long, String, Double)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (t, s, v) =>
        Row(new java.sql.Timestamp(t / 1000), s, v)
      }.asJava, schema)
  }

  private def query(i: Int)(df: DataFrame): DataFrame = i match {
    case 0 => df.agg(count(lit(1)).as("cnt"), sum("value").as("sv"),
      min("value").as("mn"), max("value").as("mx"))
    case 1 => df.filter(col("value") > 0)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"), avg("value").as("av"))
    case _ => df.groupBy(col("service"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
  }

  test("incremental == full recompute for random tables, splits, queries") {
    // deterministic sampling (scalatestplus bridge unavailable offline)
    val params = Gen.Parameters.default
    (1 to 8).foreach { caseNo =>
      val c = genCase.pureApply(params, Seed(42L + caseNo))
      val work = tmpDir(s"prop$caseNo")
      // ordered rows; split simulates time passing
      val sorted = c.rows.sortBy(_._1)
      val (early, late) = sorted.splitAt(c.splitIdx)
      val splitUs = late.head._1
      toDF(early).write.mode("overwrite").parquet(work)
      val cache = new MemoryQueryCache()
      val log = new RecordingLog
      val cold = QueryCacheSession(spark, QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", overrideNowMicros = Some(splitUs),
        log = log))
      cold.run(query(c.q)(spark.read.parquet(work))).collect()
      toDF(late).write.mode("append").parquet(work)
      val warm = QueryCacheSession(spark, QueryCacheConfig(cache,
        defaultTemporalColumn = "ts", log = log))
      val got = warm.run(query(c.q)(spark.read.parquet(work)))
        .collect().map(_.toSeq.map {
          case d: Double => f"$d%.6f"
          case x => String.valueOf(x)
        }).map(_.mkString("|")).sorted.toSeq
      val want = query(c.q)(toDF(sorted))
        .collect().map(_.toSeq.map {
          case d: Double => f"$d%.6f"
          case x => String.valueOf(x)
        }).map(_.mkString("|")).sorted.toSeq
      assert(got == want, s"query ${c.q} split ${c.splitIdx}: $got vs $want; " +
        s"log=${log.messages}")
      assert(log.messages.exists(_.startsWith("cache hit")), log.messages)
    }
  }
}
