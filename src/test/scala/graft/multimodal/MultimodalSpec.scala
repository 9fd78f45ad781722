package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private lazy val media = (1L to 50L)
    .map(i => MediaRow(i, if (i % 2 == 0) "image" else "video",
      encodeStub(i, 640 + i.toInt, 480, 1000 * i)))
    .toDS()

  test("decode: batch per partition, metadata recovered, no shuffle") {
    val d = decode(media)
    val r = d.filter(_.id == 10L).head()
    assert(r.width == 650 && r.height == 480 && r.durationMs == 10000L)
    assert(!d.queryExecution.executedPlan.toString.contains("Exchange"),
      "decode must be a narrow transform")
  }

  test("featureExtract: fixed dim, deterministic") {
    val e1 = featureExtract(media).orderBy("id").as[(Long, Array[Float])].collect()
    val e2 = featureExtract(media).orderBy("id").as[(Long, Array[Float])].collect()
    assert(e1.length == 50)
    assert(e1.forall(_._2.length == 16))
    assert(e1.zip(e2).forall { case ((_, a), (_, b)) => a.sameElements(b) })
  }

  test("frameSample: every-nth explosion with correct slicing") {
    val frames = frameSample(media, everyNth = 2).collect()
    // body = 64 bytes, frame = 8 bytes → 8 frames → every 2nd → 4 per row
    assert(frames.count(_.id == 1L) == 4)
    assert(frames.forall(_.frameBytes.length == 8))
    assert(frames.filter(_.id == 1L).map(_.frameIdx).sorted.sameElements(Array(0, 2, 4, 6)))
  }

  /** A real (minimal, spec-valid) PNG: signature + IHDR chunk declaring
    * 2×3, 8-bit RGB. Header-complete — exactly what parsePng reads. */
  private def tinyPng(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 13)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes)
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.array()
  }

  /** A real JPEG header: SOI, JFIF APP0, a DQT segment the scanner must
    * skip, then SOF0 carrying height/width. */
  private def tinyJpeg(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 20 + 9 + 13)
    bb.put(0xff.toByte).put(0xd8.toByte) // SOI
    bb.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
    bb.put("JFIF".getBytes).put(0.toByte)
    bb.put(1.toByte).put(1.toByte).put(0.toByte)
    bb.putShort(72).putShort(72).put(0.toByte).put(0.toByte)
    bb.put(0xff.toByte).put(0xdb.toByte).putShort(7) // DQT, len 7 (stub body)
    bb.put(Array[Byte](0, 1, 2, 3, 4))
    bb.put(0xff.toByte).put(0xc0.toByte).putShort(11) // SOF0, len 11
    bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    bb.put(1.toByte).put(0x11.toByte).put(0.toByte).put(0.toByte)
    bb.array()
  }

  test("real PNG/JPEG header parse: dimensions recovered, stub kept for video") {
    assert(parsePng(tinyPng(2, 3)) == MediaMeta(2, 3, 0L))
    assert(parsePng(tinyPng(1920, 1080)) == MediaMeta(1920, 1080, 0L))
    assert(parseJpeg(tinyJpeg(7, 5)) == MediaMeta(7, 5, 0L))
    assert(parseJpeg(tinyJpeg(4032, 3024)) == MediaMeta(4032, 3024, 0L))
    // dispatch: image payloads hit the real parsers, others the stub
    assert(decodeMeta(tinyPng(10, 20)) == MediaMeta(10, 20, 0L))
    assert(decodeMeta(tinyJpeg(30, 40)) == MediaMeta(30, 40, 0L))
    assert(decodeMeta(encodeStub(9L, 640, 480, 1234L)) == MediaMeta(640, 480, 1234L))
    // corrupt payloads fail loudly, not with garbage dimensions
    intercept[IllegalArgumentException](parsePng(Array.fill[Byte](30)(0x89.toByte)))
    intercept[IllegalArgumentException](parseJpeg(tinyJpeg(7, 5).take(20)))
  }

  test("JPEG fill bytes (spec B.1.1.2) parse; corrupt rows decode to the sentinel") {
    // 0xFF fill byte between SOI and the SOF0 marker is spec-legal
    val bb = java.nio.ByteBuffer.allocate(2 + 2 + 13)
    bb.put(0xff.toByte).put(0xd8.toByte)              // SOI
    bb.put(0xff.toByte).put(0xff.toByte)              // fill byte + marker prefix
    bb.put(0xc0.toByte).putShort(11)                  // SOF0
    bb.put(8.toByte).putShort(5).putShort(7)          // precision, h=5, w=7
    bb.put(1.toByte).put(0x11.toByte).put(0.toByte)
    assert(parseJpeg(bb.array()) == MediaMeta(7, 5, 0L))
    // a truncated image payload must yield the Undecodable sentinel row,
    // not a task failure that kills the whole decode job
    val rows = Seq(
      MediaRow(1L, "image", tinyJpeg(9, 4)),
      MediaRow(2L, "image", tinyJpeg(9, 4).take(20))).toDS()
    val out = decode(rows).collect().map(r => r.id -> ((r.width, r.height))).toMap
    assert(out(1L) == ((9, 4)))
    assert(out(2L) == ((Undecodable.width, Undecodable.height)))
  }

  test("decode end-to-end over mixed real-image + stub-video payloads") {
    val mixed = Seq(
      MediaRow(1L, "image", tinyPng(64, 32)),
      MediaRow(2L, "image", tinyJpeg(100, 50)),
      MediaRow(3L, "video", encodeStub(3L, 1280, 720, 60000L))).toDS()
    val out = decode(mixed).collect().map(r => r.id -> ((r.width, r.height, r.durationMs))).toMap
    assert(out(1L) == ((64, 32, 0L)))
    assert(out(2L) == ((100, 50, 0L)))
    assert(out(3L) == ((1280, 720, 60000L)))
  }

  test("resize: aspect-preserving metadata transform") {
    val r = resize(decode(media).toDF(), maxDim = 320)
      .filter(col("id") === 10L)
      .select("out_width", "out_height").as[(Int, Int)].head()
    assert(r._1 == 320 && r._2 == (480.0 * 320 / 650).toInt)
  }
}
