package graft.tools

import graft.expr.GraftFunctions
import graft.fixtures.Corpus
import graft.model.EngineConfig
import graft.stages._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only per-stage wall profiler. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GRAFT_PARTS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val cfg = EngineConfig.default
    val n = if (args.nonEmpty) args(0).toLong else 2000L

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val corpus = t("generate+persist") {
      val c = Corpus.generate(spark, n).select("id", "url", "warc_ts", "text", "lang").persist()
      c.count(); c
    }
    val (survivors0, holdouts) = ExactDedup.split(corpus)
    val survivors = t("exactdup") { val s = survivors0.persist(); s.count(); s }
    t("holdouts") { holdouts.count() }
    val sigs = t("signatures") {
      val s = Signatures.withSignatures(survivors, cfg).select("id", "minhash", "simhash").persist()
      s.count(); s
    }
    val cand = t("blocking") { val c = Blocking.candidatePairs(sigs, cfg).persist(); c.count(); c }
    val scored = t("scoring") { val s = Scoring.score(cand, sigs, cfg).persist(); s.count(); s }
    val sub = t("substring") { val s = Substring.edges(survivors, cfg).persist(); s.count(); s }
    val edges = Scoring.edges(scored).unionByName(sub.select("src", "dst")).persist()
    t("edges-union") { edges.count() }
    val cc = t("cc") {
      val a = ConnectedComponents.assign(spark, survivors.select("id"), edges).persist()
      a.count(); a
    }
    t("reattach+count") {
      val h = holdouts.join(cc.withColumnRenamed("id", "__sid"),
        holdouts("master_id") === col("__sid"), "left")
        .select(col("id"), coalesce(col("cluster_id"), col("master_id")).as("cluster_id"))
      cc.unionByName(h).agg(countDistinct("cluster_id")).head()
    }
    spark.stop()
  }
}
