package graft.tools

import graft.Pipeline
import graft.fixtures.Corpus
import org.apache.spark.sql.SparkSession

/** Dev-only: phase timing of the EXACT runLite path the benches measure —
  * build (PairGen bounded collects run here), then the single count action
  * (CC materialize + iterations show up via GRAFT_CC_DEBUG). */
object RunLiteProbe {
  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toLong else 400000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Corpus.generate(spark, docs)
      .select("id", "url", "warc_ts", "text", "lang").persist()
    corpus.count()
    val t0 = System.nanoTime()
    val out = Pipeline.runLite(spark, corpus)
    val t1 = System.nanoTime()
    println(f"[probe] build (incl. PairGen collects): ${(t1 - t0) / 1e9}%.1f s")
    out.count()
    val t2 = System.nanoTime()
    println(f"[probe] count action: ${(t2 - t1) / 1e9}%.1f s  total ${(t2 - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
