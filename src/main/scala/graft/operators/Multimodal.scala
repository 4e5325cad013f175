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

  /** Decoder: header-real where a pure-JVM parse suffices (PNG/BMP/GIF
    * dimensions), deterministic fake elsewhere (??? markers are where
    * libjpeg/ffmpeg/etc. would be driven for pixel data). */
  object StubDecoder {
    def checksum(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }
    /** Decoded (width, height): REAL for PNG / BMP / GIF — their
      * dimensions live in a fixed-offset pure-bytes header, no codec lib
      * needed — and the deterministic fake for every other payload (the
      * pixel-data formats a real deployment wires a codec in for). */
    def decodeDims(bytes: Array[Byte]): (Int, Int) =
      parseHeaderDims(bytes).getOrElse {
        val h = checksum(bytes)
        (64 + (h & 0x3f).toInt, 64 + ((h >>> 6) & 0x3f).toInt)
      }

    /** Header-only dimension parse. Signatures are deliberately STRICT
      * (full multi-byte magic, zeroed reserved fields, known DIB header
      * sizes) so that text-bytes corpora cannot false-positive into the
      * real-parse path and perturb deterministic fake features. */
    def parseHeaderDims(b: Array[Byte]): Option[(Int, Int)] = {
      def u8(i: Int) = b(i) & 0xff
      def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      // PNG: 8-byte signature, then IHDR with width/height BE at 16/20
      if (b.length >= 24 && b(0) == 0x89.toByte && b(1) == 'P' &&
          b(2) == 'N' && b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a &&
          b(6) == 0x1a && b(7) == 0x0a)
        Some((be32(16), be32(20)))
      // GIF87a / GIF89a: logical screen LE uint16 at 6/8. The magic is
      // 6 PRINTABLE chars, so unlike PNG (0x89 lead byte) and BMP (NUL
      // reserved dword) plain text can start with it ("GIF89a is …");
      // require a structural descriptor byte text can't produce: global-
      // color-table flag set (bit 7, non-ASCII) or a zero aspect-ratio
      // byte (NUL, absent from text). A real GCT-less GIF with a
      // nonzero aspect byte falls back to the fake dims — conservative.
      else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a' &&
          ((u8(10) & 0x80) != 0 || u8(12) == 0))
        Some((le16(6), le16(8)))
      // BMP: "BM" + zeroed reserved dword + a known DIB header size
      else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M' && le32(6) == 0 &&
          Set(12, 40, 52, 56, 64, 108, 124).contains(le32(14))) {
        if (le32(14) == 12) Some((le16(18), le16(20))) // BITMAPCOREHEADER
        else Some((le32(18), math.abs(le32(22)))) // height<0 = top-down rows
      }
      // JPEG: SOI (FF D8, non-ASCII — text can't false-positive), then
      // walk marker segments to the first SOFn frame header (dimensions
      // are not at a fixed offset; APPn/COM/DQT segments precede them)
      else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8)
        jpegDims(b)
      else None
    }

    /** JPEG frame dimensions from the first SOFn segment: payload is
      * [len16, precision8, height16, width16, …]. SOF markers are C0-CF
      * minus C4 (DHT), C8 (JPG ext), CC (DAC). Any structural violation
      * (lost sync, truncation, EOI/SOS before a SOF) falls back to the
      * deterministic fake — never a garbage parse. */
    private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      def u8(i: Int) = b(i) & 0xff
      def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
      var i = 2
      while (i + 1 < b.length) {
        if (u8(i) != 0xFF) return None // lost marker sync
        var m = i + 1
        while (m < b.length && u8(m) == 0xFF) m += 1 // fill bytes
        if (m >= b.length) return None
        val marker = u8(m)
        if (marker == 0xD9 || marker == 0xDA) return None // EOI / SOS
        else if (marker >= 0xD0 && marker <= 0xD7) i = m + 1 // RSTn: bare
        else {
          if (m + 2 >= b.length) return None
          val len = be16(m + 1)
          if (len < 2) return None
          if (marker >= 0xC0 && marker <= 0xCF &&
              marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
            if (m + 7 >= b.length || len < 7) return None
            return Some((be16(m + 6), be16(m + 4))) // (width, height)
          }
          i = m + 1 + len
        }
      }
      None
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

  final case class MediaResized(
      doc_id: Long,
      src_w: Int,
      src_h: Int,
      out_w: Int,
      out_h: Int,
      resized_checksum: Long)

  /** Nearest-neighbor RESIZE to `outW`×`outH` — the remaining step of
    * the decode / featurize / resize / frame-sample quartet. The
    * resampling arithmetic is the real thing (target pixel (tx,ty) reads
    * source pixel (⌊tx·w/W⌋, ⌊ty·h/H⌋)); the "pixels" are the stub
    * decoder's row-major byte grid (content bytes modulo length), since
    * no codec exists in this container — a real decoder changes only the
    * pixel fetch, not the plumbing. Same per-partition batched execution
    * as [[decodeFeatures]]; output carries the resized buffer's checksum
    * (the buffer itself is transient, as a real thumbnail-writer's
    * would be before its sink). */
  def resize(media: DataFrame, outW: Int = 16, outH: Int = 16)
      : Dataset[MediaResized] = {
    require(outW > 0 && outH > 0, s"outW=$outW outH=$outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = StubDecoder.decodeDims(r.content)
        val len = r.content.length
        val out =
          if (len == 0) Array.emptyByteArray
          else {
            val buf = new Array[Byte](outW * outH)
            var p = 0
            while (p < buf.length) {
              val sx = (p % outW) * w / outW
              val sy = (p / outW) * h / outH
              buf(p) = r.content((sy * w + sx) % len)
              p += 1
            }
            buf
          }
        MediaResized(r.doc_id, w, h, outW, outH, StubDecoder.checksum(out))
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
