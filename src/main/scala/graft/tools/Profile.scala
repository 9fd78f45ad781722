package graft.tools

import graft.expr.GraftFunctions
import graft.fixtures.Corpus
import graft.model.EngineConfig
import graft.stages._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only per-stage wall profiler — mirrors `Pipeline.runLite`'s actual
  * plan (hash-based exact dedup, exact verify, substring union) with each
  * stage materialized separately so the wall attributes to stages. The
  * per-stage sum exceeds one fused end-to-end run (extra actions +
  * materializations); use `graft.Bench` for the end-to-end number. */
object Profile {
  def main(args: Array[String]): Unit = {
    val builder0 = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GRAFT_PARTS", "8"))
      .config("spark.ui.enabled", "false")
    val spark = graft.Bench.localDir.fold(builder0)(d => builder0.config("spark.local.dir", d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val cfg = EngineConfig.default
    val n = if (args.nonEmpty) args(0).toLong else 2000L
    // pass 1 pays JIT (the signature kernels run interpreted until C2
    // compiles them — measured 3-6x slower); pass 2 is the steady state a
    // long-running job lives in. Both print; read pass 2.
    val passes = if (args.length > 1) args(1).toInt else 2

    var pass = 1

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] pass $pass $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val corpus0 = Corpus.generate(spark, n, includeHtml = false).select("id", "text").persist()
    corpus0.count()
    while (pass <= passes) {
    val corpus = corpus0
    val (survivors0, holdouts) =
      if (cfg.exactDedupByHash) ExactDedup.splitByHash(corpus, persistHoldouts = true)
      else ExactDedup.split(corpus, persistRanked = true)
    val survivors = t("exactdup") {
      val s = survivors0.persist(); s.count(); s
    }
    t("holdouts") { holdouts.count() }
    val sigs = t("signatures") {
      val s = Signatures.withSignatures(survivors, cfg).select("id", "minhash", "simhash").persist()
      s.count(); s
    }
    val cand = t("blocking") { val c = Blocking.candidatePairs(sigs, cfg).persist(); c.count(); c }
    val scored = t("scoring+verify") {
      val raw = Scoring.score(cand, sigs, cfg)
      val s = (if (cfg.exactVerify) Scoring.exactVerify(raw, survivors, cfg) else raw).persist()
      s.count(); s
    }
    val sub = t("substring") { val s = Substring.edges(survivors, cfg).persist(); s.count(); s }
    val edges = Scoring.edges(scored).unionByName(sub.select("src", "dst")).persist()
    t("edges-union") { edges.count() }
    val cc = t("cc") {
      val a = ConnectedComponents.assign(spark, survivors.select("id"), edges).persist()
      a.count(); a
    }
    t("reattach+count") {
      ExactDedup.reattach(cc, holdouts).agg(countDistinct("cluster_id")).head()
    }
    // drop every cache except the input so the next pass is a cold
    // end-to-end run of warm code (skipped after the FINAL pass — the
    // re-persist + count would regenerate the whole corpus for nothing)
    if (pass < passes) {
      spark.sharedState.cacheManager.clearCache()
      corpus0.persist(); corpus0.count()
    }
    pass += 1
    }
    spark.stop()
  }
}
