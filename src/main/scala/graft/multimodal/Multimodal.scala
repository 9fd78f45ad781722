package graft.multimodal

import graft.expr.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side machinery (schema, batch iteration,
  * partition-preserving transforms, frame explosion) is real and tested;
  * the codec step is a clearly-marked deterministic STUB — this container
  * has no image/audio libraries, so `decodeStub` parses a fake fixed
  * header instead of invoking a real decoder. Swapping in a real codec
  * changes only the function body, not the plumbing.
  *
  * At scale this is the `mapInPandas`-shaped path: per-partition batch
  * processing over binary payloads, no driver collection, no shuffle for
  * per-row transforms.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, durationMs: Long)
  final case class MediaRow(id: Long, mediaType: String, payload: Array[Byte])
  final case class DecodedRow(id: Long, mediaType: String, width: Int, height: Int,
                              durationMs: Long, nBytes: Int)
  final case class FrameRow(id: Long, frameIdx: Int, frameBytes: Array[Byte])

  /** Fake media payload: 16-byte header (width, height, durationMs) +
    * deterministic body. Generator side of the stub codec. */
  def encodeStub(id: Long, width: Int, height: Int, durationMs: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 64)
    bb.putInt(width).putInt(height).putLong(durationMs)
    var h = Hashing.mix64(id)
    (0 until 8).foreach { _ => h = Hashing.mix64(h); bb.putLong(h) }
    bb.array()
  }

  /** STUB DECODER — deterministic fake. A real build links an image/audio
    * codec here; everything downstream is production plumbing. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val bb = java.nio.ByteBuffer.wrap(payload)
    MediaMeta(bb.getInt(), bb.getInt(), bb.getLong())
  }

  private val PngSignature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(p: Array[Byte]): Boolean =
    p.length >= 24 && p.take(8).sameElements(PngSignature)

  def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8

  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) | ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)

  /** REAL PNG header parse (pure JVM, PNG spec §11.2.2): the 8-byte
    * signature is followed by the IHDR chunk, whose width/height are
    * big-endian 32-bit at byte offsets 16 and 20. durationMs = 0 (still). */
  def parsePng(p: Array[Byte]): MediaMeta = {
    require(isPng(p), "not a PNG payload")
    require(p.length >= 24 && p.slice(12, 16).sameElements("IHDR".getBytes),
      "PNG signature without IHDR chunk")
    MediaMeta(be32(p, 16), be32(p, 20), 0L)
  }

  /** REAL JPEG header parse (pure JVM, JPEG/JFIF marker scan): walk the
    * FF-prefixed segments from SOI to the first start-of-frame marker
    * (FFC0–FFCF except the non-frame C4/C8/CC), whose payload carries
    * height then width as big-endian 16-bit after the precision byte. */
  def parseJpeg(p: Array[Byte]): MediaMeta = {
    require(isJpeg(p), "not a JPEG payload")
    var i = 2
    while (i + 1 < p.length) {
      require((p(i) & 0xff) == 0xff, f"bad JPEG marker alignment at $i")
      // spec B.1.1.2: any number of 0xFF fill bytes may precede a marker
      var m = i + 1
      while (m < p.length && (p(m) & 0xff) == 0xff) m += 1
      if (m >= p.length) throw new IllegalArgumentException("no SOF marker found in JPEG payload")
      val marker = p(m) & 0xff
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        // segment: [m]=marker, [m+1..m+2]=length, [m+3]=precision,
        // [m+4..m+5]=height, [m+6..m+7]=width
        require(m + 7 < p.length, "truncated SOF segment")
        return MediaMeta(width = be16(p, m + 6), height = be16(p, m + 4), durationMs = 0L)
      } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        i = m + 1 // standalone marker, no length field
      } else {
        require(m + 2 < p.length, "truncated JPEG segment header")
        i = m + 1 + be16(p, m + 1) // segment length includes its own 2 bytes
      }
    }
    throw new IllegalArgumentException("no SOF marker found in JPEG payload")
  }

  /** Dispatching decode: REAL header parsers for PNG/JPEG payloads (no
    * codec library needed for dimensions), deterministic stub for
    * everything else (video/audio — the container has no codec libs; a
    * real build links ffmpeg-style decoders here). */
  def decodeMeta(payload: Array[Byte]): MediaMeta =
    if (isPng(payload)) parsePng(payload)
    else if (isJpeg(payload)) parseJpeg(payload)
    else decodeStub(payload)

  /** Sentinel emitted by [[decode]] for a payload the parsers reject:
    * at web scale corrupt/truncated images are routine, and a single bad
    * row must mark itself undecodable — never fail the whole job. */
  val Undecodable: MediaMeta = MediaMeta(-1, -1, -1L)

  /** Batch decode: one pass per partition, no shuffle (mapInPandas shape).
    * Per-row recovery: a payload the header parsers reject (corrupt,
    * truncated, or misdeclared) yields the [[Undecodable]] sentinel row
    * instead of a task failure — downstream filters on `width >= 0`. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val m =
          try decodeMeta(r.payload)
          catch { case scala.util.control.NonFatal(_) => Undecodable }
        DecodedRow(r.id, r.mediaType, m.width, m.height, m.durationMs, r.payload.length)
      }
    }
  }

  /** Feature extraction stub: binary → fixed-dim float embedding
    * (deterministic hash projection — the real model call slots in here). */
  def featureExtract(media: Dataset[MediaRow], dim: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        var h = Hashing.mix64(r.id ^ r.payload.length.toLong)
        val v = Array.fill(dim) {
          h = Hashing.mix64(h)
          ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
        }
        (r.id, v)
      }
    }.toDF("id", "embedding")
  }

  /** Frame sampling: explode a video payload into every-nth-frame rows.
    * Frames are byte slices here (stub); the explode/repartition shape is
    * the real one — output is wider than input, so downstream stages should
    * repartition by id if they aggregate per-frame results. */
  def frameSample(media: Dataset[MediaRow], everyNth: Int, frameBytes: Int = 8): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val body = r.payload.drop(16)
      val nFrames = body.length / frameBytes
      (0 until nFrames by everyNth).map { i =>
        FrameRow(r.id, i, body.slice(i * frameBytes, (i + 1) * frameBytes))
      }
    }
  }

  /** Resize = metadata transform on the decoded table (pure column ops). */
  def resize(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }
}
