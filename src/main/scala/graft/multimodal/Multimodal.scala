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

  /** Batch decode: one pass per partition, no shuffle (mapInPandas shape). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = decodeStub(r.payload)
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
