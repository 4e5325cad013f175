package graft.cache

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Cache SPI (reference: src/cache.rs:10-56).
  *
  * A cache entry stores the **merged partial-aggregate state** for one
  * plan fingerprint, stamped with the query start time that produced it
  * (the next run's watermark). The reference's Occupied/Vacant ADT
  * (src/cache.rs:15-50) collapses to Option[CachedState] here; `put`
  * overwrites unconditionally (src/cache.rs:109-114) so the entry always
  * converges to a single state covering all data seen so far.
  *
  * Scale note: state is exchanged as a DataFrame, not rows, so a durable
  * implementation can read/write it fully distributed — the driver never
  * has to hold the state (one row per group) in memory unless the
  * in-memory impl is chosen.
  */
final case class CachedState(
    timestampMicros: Long,
    schema: StructType,
    read: SparkSession => DataFrame)

/** Thrown by bounded caches when the state is too large to store; the
  * executor treats it as "don't cache" and falls back to vanilla. */
final class CacheCapacityExceeded(msg: String) extends RuntimeException(msg)

trait QueryCache {
  /** reference: src/cache.rs:11-13 (entry lookup by fingerprint) */
  def get(fingerprint: String): Option[CachedState]

  /** Store state, stamped with `timestampMicros`; returns a re-readable
    * DataFrame of exactly what was stored (the replay the reference's
    * CachedAggregateExec does at src/aggregate.rs:680-688). */
  def put(fingerprint: String, timestampMicros: Long, state: DataFrame): DataFrame

  def invalidate(fingerprint: String): Unit
}

object QueryCache {
  /** Stable directory/file key for a fingerprint. */
  def keyHash(fingerprint: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(fingerprint.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(32)
}

/** In-memory cache (reference MemoryQueryCache, src/cache.rs:52-136).
  *
  * Collects the state to the driver — appropriate for interactive use
  * where state is a handful of rows per group (date_trunc buckets).
  * `maxStateRows` guards against high-cardinality group keys: beyond it
  * the put throws [[CacheCapacityExceeded]] and the query simply runs
  * uncached. Durable/distributed state belongs in [[ParquetQueryCache]].
  */
final class MemoryQueryCache(maxStateRows: Long = 4000000L) extends QueryCache {
  private val entries = TrieMap.empty[String, (Long, StructType, Array[Row])]

  override def get(fingerprint: String): Option[CachedState] =
    entries.get(fingerprint).map { case (ts, schema, rows) =>
      CachedState(ts, schema,
        spark => spark.createDataFrame(rows.toSeq.asJava, schema))
    }

  override def put(fingerprint: String, timestampMicros: Long,
      state: DataFrame): DataFrame = {
    // set-valued state (collect_set / exact count-distinct) packs the
    // whole value set into ONE row per group, so a row-count probe alone
    // would materialize arbitrarily large arrays on the driver — bound
    // total elements with a cheap aggregation first
    import org.apache.spark.sql.functions.{coalesce, lit, size => asize, sum => asum}
    val arrayCols = state.schema.fields
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    if (arrayCols.nonEmpty) {
      val sums = arrayCols.map(f =>
        coalesce(asum(asize(org.apache.spark.sql.functions.col(f.name))), lit(0L)))
      val total = state.select(sums.reduce(_ + _).as("n"))
        .collect().head.getLong(0)
      if (total > maxStateRows)
        throw new CacheCapacityExceeded(
          s"set-state holds $total elements > maxStateRows=$maxStateRows")
    }
    // limit-probe BEFORE materializing on the driver: an over-limit state
    // must throw CacheCapacityExceeded, not OOM the driver first
    val probeLimit = math.min(maxStateRows + 1, Int.MaxValue.toLong).toInt
    val rows = state.limit(probeLimit).collect()
    if (rows.length > maxStateRows)
      throw new CacheCapacityExceeded(
        s"state exceeds maxStateRows=$maxStateRows")
    entries.put(fingerprint, (timestampMicros, state.schema, rows))
    state.sparkSession.createDataFrame(rows.toSeq.asJava, state.schema)
  }

  override def invalidate(fingerprint: String): Unit =
    entries.remove(fingerprint)

  def size: Int = entries.size
}

/** Durable cache over a (local/HDFS/object-store) directory — the
  * reference's "TODO disk cache" (src/cache.rs:176) / ObjectStoreQueryCache
  * (README.md:25), done Spark-style:
  *
  *   <root>/<fp-hash>/data-<ts>/   parquet state, written DISTRIBUTED
  *   <root>/<fp-hash>/meta.json    {timestampMicros, dataDir, schema}
  *
  * The meta file is committed via write-temp + atomic rename, so readers
  * either see the previous complete version or the new one. State never
  * passes through the driver: at 100 TB / millions of groups the put is a
  * parallel parquet write and the warm read is a parallel parquet scan
  * that unions straight into the partial-merge aggregation.
  */
final class ParquetQueryCache(rootDir: String) extends QueryCache {
  import ParquetQueryCache._

  /** Latest committed meta version in `dir`. Meta files are immutable and
    * versioned (`meta-<v>.json`, appearing atomically via temp+rename), so
    * a reader always sees SOME complete version — there is no
    * delete-then-replace window. */
  private def latestMeta(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Option[Meta] = {
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("meta-") && n.endsWith(".json"))
      .flatMap(n => n.stripPrefix("meta-").stripSuffix(".json").toLongOption)
    if (versions.isEmpty) None
    else Some(readMeta(fs, new Path(dir, s"meta-${versions.max}.json")))
  }

  override def get(fingerprint: String): Option[CachedState] = {
    val spark = SparkSession.active
    val dir = new Path(rootDir, QueryCache.keyHash(fingerprint))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    latestMeta(fs, dir).map { meta =>
      val dataPath = new Path(dir, meta.dataDir).toString
      CachedState(meta.timestampMicros, meta.schema,
        s => s.read.schema(meta.schema).parquet(dataPath))
    }
  }

  override def put(fingerprint: String, timestampMicros: Long,
      state: DataFrame): DataFrame = {
    val spark = state.sparkSession
    val dir = new Path(rootDir, QueryCache.keyHash(fingerprint))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = latestMeta(fs, dir)
    val version = math.max(timestampMicros, old.map(_.version + 1).getOrElse(0L))
    val dataDir = s"data-$version"
    val dataPath = new Path(dir, dataDir)
    state.write.mode("overwrite").parquet(dataPath.toString)
    writeMetaAtomic(fs, dir, Meta(timestampMicros, dataDir, state.schema), version)
    // best-effort cleanup of superseded versions (new readers already
    // resolve to the latest meta)
    old.filter(_.dataDir != dataDir).foreach { m =>
      try {
        fs.delete(new Path(dir, m.dataDir), true)
        fs.delete(new Path(dir, s"meta-${m.version}.json"), false)
      } catch { case _: Exception => () }
    }
    spark.read.schema(state.schema).parquet(dataPath.toString)
  }

  override def invalidate(fingerprint: String): Unit = {
    val spark = SparkSession.active
    val dir = new Path(rootDir, QueryCache.keyHash(fingerprint))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
  }
}

object ParquetQueryCache {
  final case class Meta(timestampMicros: Long, dataDir: String,
      schema: StructType) {
    /** version = numeric suffix of the data dir */
    def version: Long = dataDir.stripPrefix("data-").toLong
  }

  private def readMeta(fs: org.apache.hadoop.fs.FileSystem, p: Path): Meta = {
    val in = fs.open(p)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
    val s = new String(bytes, StandardCharsets.UTF_8)
    // minimal parser for our own 3-field json
    def field(name: String): String = {
      val i = s.indexOf("\"" + name + "\":")
      require(i >= 0, s"missing $name in meta.json")
      val rest = s.substring(i + name.length + 3).trim
      if (rest.startsWith("\"")) {
        // string value: schema json is itself escaped
        val sb = new StringBuilder
        var j = 1
        var done = false
        while (!done) {
          rest.charAt(j) match {
            case '\\' => sb.append(rest.charAt(j + 1)); j += 2
            case '"' => done = true
            case c => sb.append(c); j += 1
          }
        }
        sb.toString
      } else rest.takeWhile(c => c.isDigit || c == '-')
    }
    Meta(field("timestampMicros").toLong, field("dataDir"),
      DataType.fromJson(field("schema")).asInstanceOf[StructType])
  }

  private def writeMetaAtomic(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      meta: Meta, version: Long): Unit = {
    def esc(x: String): String =
      x.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c => c.toString
      }
    val json =
      s"""{"timestampMicros":${meta.timestampMicros},"dataDir":"${esc(meta.dataDir)}","schema":"${esc(meta.schema.json)}"}"""
    val tmp = new Path(dir, s".meta-$version.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val target = new Path(dir, s"meta-$version.json")
    if (fs.exists(target)) fs.delete(target, false) // same-version rewrite
    require(fs.rename(tmp, target), s"atomic meta commit failed for $dir")
  }
}
