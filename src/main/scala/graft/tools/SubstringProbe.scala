package graft.tools

import graft.expr.GraftFunctions
import graft.fixtures.Corpus
import graft.model.EngineConfig
import graft.stages.PairGen
import org.apache.spark.sql.functions._

/** Dev-only substring-stage cost attribution: times the three phases of
  * `Substring.edges` separately, interleaved A/B in ONE JVM (the only
  * measurement discipline that survives this sandbox's 3-8× co-tenant
  * noise — see BENCH.md):
  *   1. winnow kernel (withFps materialize)
  *   2. fingerprint explode + PairGen.pairs (the wide shuffle)
  *   3. shared-count + ratio verify
  * Optional arg2 = interleaved rep count (default 2); each rep times
  * phase 2 at BOTH objectHashAggregate fallback thresholds (128 and an
  * effectively-disabled 20M), so the ObjectAgg-vs-sort-fallback question
  * is answered inside one process. */
object SubstringProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[16]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GRAFT_PARTS", "16"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val cfg = EngineConfig.default
    val docs = Corpus.generate(spark, n, includeHtml = false).select("id", "text").persist()
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }

    for (r <- 1 to reps; thr <- Seq("128", "20000000")) {
      println(s"--- rep $r fallbackThreshold=$thr ---")
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
      spark.sharedState.cacheManager.clearCache()
      docs.persist(); docs.count()
      val withFps = docs.select(col("id"),
        GraftFunctions.winnowFps(col("text"), cfg.winnowK, cfg.winnowWindow).as("__fps"))
        .persist()
      time("1-winnow")(withFps.count())
      val fps = withFps.select(col("id"), explode(col("__fps")).as("key"))
        .withColumn("sort", col("id"))
      time("1b-explode-count")(fps.count())
      val pairs = PairGen.pairs(fps, cfg.allPairsCap, dropHotAbove = Some(cfg.substringDfCap))
        .persist()
      time("2-pairgen")(pairs.count())
      val shared = pairs.groupBy("id_l", "id_r").agg(count(lit(1)).as("shared_fps"))
        .filter(col("shared_fps") >= cfg.substringMinFps)
      val nFps = withFps.select(col("id"), size(col("__fps")).as("n_fps"))
      val edges = shared
        .join(nFps.select(col("id").as("id_l"), col("n_fps").as("n_l")), "id_l")
        .join(nFps.select(col("id").as("id_r"), col("n_fps").as("n_r")), "id_r")
        .filter(col("shared_fps") >= lit(cfg.substringMinRatio) * least(col("n_l"), col("n_r")))
      time("3-verify")(edges.count())
    }
    spark.stop()
  }
}
