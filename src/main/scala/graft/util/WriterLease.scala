package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Exclusive writer lease for durable index directories.
  *
  * Every durable index in this library (dedup key/band/vector indexes,
  * cluster labels, the BM25 inverted index) documents a SINGLE-WRITER
  * contract: mutations are append-only plus occasional swap-compactions,
  * and two concurrent writers could interleave appends with a compaction
  * and corrupt the only durable copy. This lease makes the contract
  * ENFORCED instead of documented: the second writer fails fast with
  * [[ConcurrentWriterException]] rather than corrupting state.
  *
  * Mechanics: `<dir>.writer.lease` — a SIBLING of the index dir, never
  * inside it: layout promotion and compaction rename-swap the dir
  * wholesale, which would silently drop an in-dir lease mid-hold — is
  * created with `FileSystem.create(p, overwrite = false)`, an atomic
  * create-if-absent on HDFS-compatible
  * filesystems (local, HDFS; object stores without atomic create fall
  * back to best-effort, the same caveat every Hadoop lock file carries).
  * The lease holds a holder tag + wall-clock stamp. A lease older than
  * `staleMs` is presumed abandoned by a crashed writer and is broken:
  * the breaker deletes it and retries the atomic create once (losing the
  * race to another breaker is then a clean fail-fast, not corruption).
  * Readers never take the lease — index reads are snapshot-consistent
  * against append-only dirs and rename-swapped compactions.
  */
object WriterLease {

  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  /** default staleness horizon: long enough for any real batch append,
    * short enough that a crashed writer doesn't wedge the pipeline */
  val DefaultStaleMs: Long = 30L * 60L * 1000L

  private def leasePath(dir: String) =
    new Path(dir.stripSuffix("/") + ".writer.lease")

  private def tryCreate(fs: FileSystem, p: Path, tag: String): Boolean =
    try {
      val out = fs.create(p, false)
      try out.write(s"$tag@${System.currentTimeMillis()}\n".getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  /** Run `f` holding the exclusive writer lease on `dir`; release on every
    * exit path. Throws [[ConcurrentWriterException]] when another live
    * writer holds it. */
  def withLease[A](spark: SparkSession, dir: String, tag: String,
      staleMs: Long = DefaultStaleMs)(f: => A): A = {
    val p = leasePath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = p.getParent
    if (parent != null) fs.mkdirs(parent) // first append: parent may not exist
    var acquired = tryCreate(fs, p, tag)
    if (!acquired) {
      val age = try System.currentTimeMillis() -
        fs.getFileStatus(p).getModificationTime
      catch { case _: java.io.FileNotFoundException => Long.MaxValue }
      if (age > staleMs) {
        // presumed crashed holder: break and retry the atomic create ONCE
        // — losing that race to a concurrent breaker fails fast below
        try fs.delete(p, false) catch { case _: java.io.IOException => () }
        acquired = tryCreate(fs, p, tag)
      }
    }
    if (!acquired) {
      val holder = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(p)),
        "UTF-8").trim
      catch { case _: java.io.IOException => "<unreadable>" }
      throw new ConcurrentWriterException(
        s"index $dir already has a live writer ($holder); these indexes " +
          "are single-writer — serialize appends, or delete the lease " +
          "file if the holder is known dead")
    }
    try f finally { try fs.delete(p, false) catch { case _: Throwable => () } }
  }
}
