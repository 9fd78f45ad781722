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

  private val textA = "the quick brown fox jumps over the lazy dog again and again " * 3
  private val textB = "completely unrelated content about distributed hash joins " * 3
  private val textC = "a third body of text regarding winnowing fingerprints at scale " * 3

  test("streaming near-dup candidates: LSH-bucketed hits with bounded state") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("id", "warc_ts", "text")
    val q = StreamingDedup.nearDupCandidates(df, watermark = "10 minutes", bucketCap = 2)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    // four copies of the same text in event-time order, cap 2: member list
    // per bucket holds the 2 most recent, so (1,4) must NOT be emitted
    input.addData((1L, ts(0), textA), (2L, ts(1), textA),
      (3L, ts(2), textA), (4L, ts(3), textA), (9L, ts(2), textB))
    q.processAllAvailable()
    val pairs = spark.table("neardup_out")
      .select("id_l", "id_r").distinct().as[(Long, Long)].collect().toSet
    q.stop()
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)),
      s"got $pairs")
  }

  test("streaming near-dup state evicts one horizon after last bucket arrival") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("id", "warc_ts", "text")
    val q = StreamingDedup.nearDupCandidates(df, watermark = "10 minutes")
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode(OutputMode.Append()).start()
    input.addData((1L, ts(0), textA))
    q.processAllAvailable() // watermark still behind
    input.addData((20L, ts(40), textB))
    q.processAllAvailable() // advances watermark past ts(0) + horizon
    input.addData((21L, ts(41), textC))
    q.processAllAvailable() // timeout fires for doc 1's (dataless) buckets
    input.addData((5L, ts(42), textA))
    q.processAllAvailable() // doc 1 evicted → no hit
    val pairs = spark.table("neardup_evict")
      .select("id_l", "id_r").distinct().as[(Long, Long)].collect().toSet
    q.stop()
    assert(!pairs.contains((1L, 5L)), s"doc 1 must be evicted before doc 5 arrives ($pairs)")
    assert(pairs.isEmpty, s"no other hits expected ($pairs)")
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

  test("recrawl TTL anchors to newest crawl ever seen, not a late batch's max") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val df = input.toDF().toDF("url", "warc_ts")
    val q = StreamingDedup.recrawlCounter(df) // ttl 1h, watermark 10m
      .writeStream.format("memory").queryName("recrawl_ttl")
      .outputMode(OutputMode.Update()).start()
    input.addData(("u1", ts(0)), ("u1", ts(9))) // newest crawl t=9 → timeout 69
    q.processAllAvailable()
    // late but above-watermark recrawl: must NOT pull the timeout back to 62
    input.addData(("u1", ts(2)))
    q.processAllAvailable()
    input.addData(("u3", ts(75))) // watermark → 65 after this batch
    q.processAllAvailable()
    input.addData(("u3", ts(76))) // timeouts evaluated at wm 65: 69 survives
    q.processAllAvailable()
    input.addData(("u1", ts(70))) // state intact → count continues, not re-seeded
    q.processAllAvailable()
    val c = spark.table("recrawl_ttl").where(col("url") === "u1")
      .agg(max("count")).as[Long].head()
    q.stop()
    assert(c == 4L, s"u1 state was evicted early (max count $c, expected 4)")
  }
}
