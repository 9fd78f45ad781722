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

  test("resize: aspect-preserving metadata transform") {
    val r = resize(decode(media).toDF(), maxDim = 320)
      .filter(col("id") === 10L)
      .select("out_width", "out_height").as[(Int, Int)].head()
    assert(r._1 == 320 && r._2 == (480.0 * 320 / 650).toInt)
  }
}
