package graft.tools

import graft.expr.GraftFunctions
import graft.fixtures.Corpus
import graft.model.EngineConfig
import graft.stages._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** tfWeighting cost/benefit probe (VERDICT r4 item 7): the idf gate
  * (`Scoring.tfWeightedScores`) is spec-tested but its COST — a
  * full-corpus shingle groupBy plus three candidate-restricted joins —
  * had never been timed, so the default-off choice was argued, not
  * measured. This probe, at bench scale:
  *
  *   1. times the end-to-end pipeline (runLite, cold caches) with
  *      tfWeighting off vs on;
  *   2. counts the DEMOTIONS the gate actually buys: candidate pairs at
  *      level 2 under the raw exact-Jaccard gate that the idf-weighted
  *      gate rejects (and the reverse: pairs only the idf gate passes).
  *
  * Usage: `taskset -c 0-31 sbt -batch "runMain graft.tools.TfProbe 800000"`.
  */
object TfProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 800000L
    val cores = sys.env.getOrElse("GRAFT_CORES", "32").toInt
    val builder0 = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = graft.Bench.localDir
      .fold(builder0)(d => builder0.config("spark.local.dir", d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val corpus = Corpus.generate(spark, n, includeHtml = false)
      .select("id", "text").persist()
    val total = corpus.count()
    println(s"[tf] corpus $total docs, $cores cores")

    // ---- end-to-end walls, cold engine + SQL caches per rep (Bench
    // discipline); off first, then on, `reps` each, min wall reported
    val reps = sys.env.getOrElse("GRAFT_TF_REPS", "3").toInt
    def cold(): Unit = {
      graft.Pipeline.clearIntermediateCaches(spark)
      spark.sharedState.cacheManager.clearCache()
      corpus.persist(); corpus.count()
    }
    val walls = Seq(false, true).map { tf =>
      val cfg = EngineConfig.default.copy(tfWeighting = tf)
      val ws = (1 to reps).map { _ =>
        cold()
        val t0 = System.nanoTime()
        graft.Pipeline.runLite(spark, corpus, cfg).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[tf] tfWeighting=$tf walls ${ws.map(w => f"$w%.1f").mkString("/")} s " +
        f"(min ${ws.min}%.1f)")
      tf -> ws.min
    }.toMap

    // ---- what the gate buys: same candidates scored both ways
    cold()
    val cfgOff = EngineConfig.default
    val sigs = IntermediateCaches.persistTracked(
      Signatures.withSignatures(corpus, cfgOff).select("id", "minhash", "simhash"))
    val cand = IntermediateCaches.persistTracked(Blocking.candidatePairs(sigs, cfgOff))
    val scored = IntermediateCaches.persistTracked(Scoring.score(cand, sigs, cfgOff))
    def level2(tf: Boolean) = Scoring
      .exactVerify(scored, corpus, EngineConfig.default.copy(tfWeighting = tf))
      .filter(col("level") === 2).select("id_l", "id_r")
    val off = IntermediateCaches.persistTracked(level2(false))
    val on = IntermediateCaches.persistTracked(level2(true))
    val nOff = off.count(); val nOn = on.count()
    val demoted = off.join(on, Seq("id_l", "id_r"), "left_anti").count()
    val promoted = on.join(off, Seq("id_l", "id_r"), "left_anti").count()
    println(s"[tf] level-2 pairs: raw-gate=$nOff idf-gate=$nOn " +
      s"demoted-by-idf=$demoted promoted-by-idf=$promoted")
    graft.Pipeline.clearIntermediateCaches(spark)

    val json = Map(
      "docs" -> total, "cores" -> cores.toLong,
      "wall_off_sec" -> walls(false).toLong, "wall_on_sec" -> walls(true).toLong,
      "level2_raw" -> nOff, "level2_idf" -> nOn,
      "demoted_by_idf" -> demoted, "promoted_by_idf" -> promoted)
      .toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    spark.stop()
    println(json)
  }
}
