package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) as opaque
  * `binary` content + typed metadata struct, with decode / feature
  * extraction / frame sampling as per-partition batch operators.
  *
  * The Spark-side plumbing is real: schema, partition-parallel batched
  * execution via typed `mapPartitions` (the Scala analog of
  * `mapInPandas`), bounded batch memory, and deterministic outputs. The
  * actual codec call is STUBBED — this container has no image/audio
  * libraries — behind [[StubDecoder]], which derives deterministic fake
  * features from the bytes. Swapping in a real codec changes only that
  * object.
  *
  * Scale notes: content stays a binary column (parquet keeps it columnar
  * + compressed); decode runs one task per partition with a reusable
  * decoder instance (amortized model/codec init — the reason for
  * mapPartitions over map); nothing touches the driver.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, content: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Int,
      checksum: Long,
      width: Int,     // fake "decoded" dimensions
      height: Int,
      embedding: Array[Float]) // fake feature vector

  /** STUB decoder — deterministic fake standing in for a real codec
    * (??? markers are where libjpeg/ffmpeg/etc. would be driven). */
  object StubDecoder {
    def checksum(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }
    /** real impl: decode header → (width, height); here: derived fake */
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val h = checksum(bytes)
      (64 + (h & 0x3f).toInt, 64 + ((h >>> 6) & 0x3f).toInt)
    }
    /** real impl: model forward pass per batch; here: 8-dim byte histogram */
    def features(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](8)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1f; i += 1 }
      val n = math.max(1, bytes.length).toFloat
      hist.map(_ / n)
    }
  }

  /** attach binary content + metadata to the documents table (test corpus
    * has no real media; text bytes stand in) */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("content"))

  /** batched partition-parallel decode + featurize */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init happens HERE (once per task, not per row)
      rows.map { r =>
        val (w, h) = StubDecoder.decodeDims(r.content)
        MediaFeatures(r.doc_id, r.mime, r.content.length,
          StubDecoder.checksum(r.content), w, h,
          StubDecoder.features(r.content))
      }
    }
  }

  /** frame sampling for (fake) video: split content into fixed-size
    * "frames", keep every `stride`-th — pure Catalyst expressions, so the
    * sampling itself never leaves codegen. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col("content")).cast("double") / frameBytes).cast("int")
    media.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
        i => substring(col("content"), (i * lit(frameBytes) + lit(1)).cast("int"), lit(frameBytes).cast("int"))))
        .as(Seq("frame_idx", "frame")))
      .withColumn("frame_bytes", length(col("frame")))
  }
}
