package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)

  test("streaming exact dedup keeps first row per content within watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("url", "warc_ts", "text")
    val q = StreamingDedup.dedupStream(df, "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      ("u1", ts(0), "same text"),
      ("u2", ts(1), "same text"),   // dup → suppressed
      ("u3", ts(2), "other text"))
    q.processAllAvailable()
    input.addData(("u4", ts(3), "same text")) // still within state → suppressed
    q.processAllAvailable()
    val urls = spark.table("dedup_out").select("url").as[String].collect().sorted
    q.stop()
    assert(urls.sameElements(Array("u1", "u3")))
  }

  test("windowed stats aggregate per tumbling window and lang") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, String, String)]
    val df = input.toDF().toDF("url", "warc_ts", "text", "lang")
    val q = StreamingDedup.windowedStats(df, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Update()).start()
    input.addData(
      ("a", ts(1), "t1", "en"), ("b", ts(2), "t2", "en"),
      ("c", ts(11), "t3", "en"), ("d", ts(3), "t4", "de"))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .select(col("lang"), col("docs")).as[(String, Long)].collect().toSet
    q.stop()
    assert(rows.contains(("en", 2L))) // window [0,10) en
    assert(rows.contains(("en", 1L))) // window [10,20) en
    assert(rows.contains(("de", 1L)))
  }

  test("mapGroupsWithState recrawl counter accumulates across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val df = input.toDF().toDF("url", "warc_ts")
    val q = StreamingDedup.recrawlCounter(df)
      .writeStream.format("memory").queryName("recrawl_out")
      .outputMode(OutputMode.Update()).start()
    input.addData(("u1", ts(0)), ("u1", ts(5)), ("u2", ts(1)))
    q.processAllAvailable()
    input.addData(("u1", ts(9)))
    q.processAllAvailable()
    val counts = spark.table("recrawl_out")
      .groupBy("url").agg(max("count").as("c"))
      .as[(String, Long)].collect().toMap
    q.stop()
    assert(counts("u1") == 3L && counts("u2") == 1L)
  }
}
