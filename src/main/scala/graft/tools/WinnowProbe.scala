package graft.tools

import graft.expr.GraftFunctions
import graft.fixtures.Corpus
import graft.model.EngineConfig
import graft.stages.Substring
import org.apache.spark.sql.functions._

/** Winnow-window tradeoff measurement: fingerprint density ≈ 2/(w+1), so
  * `winnowWindow` trades substring-stage cost (fps volume through the
  * PairGen shuffle) against containment recall on SHORT overlaps (a
  * contained span must yield ≥ substringMinFps shared fingerprints).
  * Runs the full Substring.edges at w ∈ {16, 32, 64}, interleaved in ONE
  * JVM (the sandbox's only noise-robust discipline, BENCH.md), reporting
  * per w: fps/doc, stage wall, and planted-containment recall (the
  * corpus's `substring` rows each contain a ≥60% slice of their base doc
  * — recall = found (base, substring-doc) edges / planted).
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[16]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GRAFT_PARTS", "16"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val corpus = Corpus.generate(spark, n, includeHtml = false).persist()
    val docs = corpus.select("id", "text")
    val truth = corpus.filter(col("kind") === "substring")
      .select(col("truth_cluster").as("src"), col("id").as("dst")).persist()
    val truthCount = truth.count()
    println(s"[winnow] corpus $n docs, planted containments: $truthCount")

    for (r <- 1 to reps; w <- Seq(16, 32, 64)) {
      val cfg = EngineConfig.default.copy(winnowWindow = w)
      spark.sharedState.cacheManager.clearCache()
      corpus.persist(); corpus.count()
      truth.persist(); truth.count()
      val fpsTotal = docs
        .select(sum(size(GraftFunctions.winnowFps(col("text"), cfg.winnowK, w))))
        .head().getLong(0)
      val t0 = System.nanoTime()
      val edges = Substring.edges(docs, cfg).persist()
      val nEdges = edges.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val found = truth.join(edges, Seq("src", "dst"), "left_semi").count()
      edges.unpersist()
      graft.Pipeline.clearIntermediateCaches(spark)
      println(f"[winnow] rep $r w=$w%2d: fps/doc=${fpsTotal.toDouble / n}%6.1f " +
        f"wall=$wall%6.1f s edges=$nEdges recall=${found.toDouble / truthCount}%.4f")
    }
    spark.stop()
  }
}
