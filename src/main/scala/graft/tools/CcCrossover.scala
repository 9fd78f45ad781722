package graft.tools

import graft.expr.GraftFunctions
import graft.fixtures.Corpus
import graft.model.EngineConfig
import graft.stages._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Natural distributed-CC crossover probe (VERDICT r4 item 2), phase per
  * JVM: the single-JVM [[ScaleProbe]] cannot reach the ~16M-doc crossover
  * on this sandbox — shuffle files live for the JVM lifetime, and one
  * 79 GB disk cannot hold the winnowing stage's fingerprint shuffles next
  * to everything upstream. Running each stage in its OWN invocation with
  * parquet hand-off (snappy-compressed, a fraction of shuffle volume)
  * drops dead shuffles with each JVM exit — the exact deployment shape
  * `Pipeline.runResumable` commits with its snapshot store, driven here
  * stage-at-a-time so per-stage walls stay measurable.
  *
  * Phases (run in order, same dir):
  *   survivors <dir> <n>  corpus → exact-dedup split → survivors/holdouts
  *   simedges  <dir>      signatures → LSH candidates → score+verify edges
  *   subedges  <dir>      winnowing substring edges
  *   cc        <dir>      union edges → ConnectedComponents.assign under
  *                        the DEFAULT config — past ~16M docs the edge set
  *                        exceeds ccFastPathMaxEdges (4M) and the
  *                        distributed star loop engages NATURALLY
  *                        (ScaleStats printed as proof)
  */
object CcCrossover {
  def main(args: Array[String]): Unit = {
    val phase = args(0)
    val dir = args(1)
    val n = if (args.length > 2) args(2).toLong else 17000000L
    val cores = sys.env.getOrElse("GRAFT_CORES", "16").toInt
    val builder0 = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .config("spark.rdd.compress", "true")
      // candidate side ≪ signature side at probe scale — see ScaleProbe
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_SCALE_BCAST", "256m"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_SCALE_BCAST", "256m"))
    val spark = graft.Bench.localDir
      .fold(builder0)(d => builder0.config("spark.local.dir", d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val cfg = EngineConfig.default
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc17] phase $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    phase match {
      case "survivors" =>
        val corpus = Corpus.generate(spark, n, includeHtml = false).select("id", "text")
        timed("survivors") {
          val (surv, hold) = ExactDedup.splitByHash(corpus, persistHoldouts = true)
          surv.write.mode("overwrite").parquet(s"$dir/survivors")
          hold.write.mode("overwrite").parquet(s"$dir/holdouts")
        }
      case "simedges" =>
        // optional chunking (args: simedges <dir> <chunk> <of>): exact
        // verification is per-pair independent, so hash-partitioning the
        // CANDIDATE set across invocations divides the one shuffle this
        // box cannot hold — exactVerify's second join streams the
        // pair-enriched frame against ~30 GB of shingle arrays (neither
        // side broadcastable), a ~47 GB sort-merge spill at 17M docs.
        // Signatures/candidates are deterministic, so re-deriving them
        // per chunk and filtering yields a disjoint exact partition of
        // the DEFAULT-config edge set; the cc phase globs sim_edges_*.
        val (chunk, of) = if (args.length > 3) (args(2).toInt, args(3).toInt) else (0, 1)
        val surv = spark.read.parquet(s"$dir/survivors")
        timed(s"simedges_${chunk}_of_$of") {
          val sigs = IntermediateCaches.persistTracked(
            Signatures.withSignatures(surv, cfg).select("id", "minhash", "simhash"))
          val all = Blocking.candidatePairs(sigs, cfg)
          val cand = IntermediateCaches.persistTracked(
            if (of == 1) all
            else all.filter(pmod(xxhash64(col("id_l"), col("id_r")), lit(of)) === chunk))
          // materialize BEFORE the scoring joins plan: only then does the
          // cached candidate side carry real (~MB) stats and broadcast —
          // un-materialized, the planner estimates from the PairGen
          // subtree and sort-merges the 17 GB signature table twice
          println(s"[cc17] chunk $chunk candidates: ${cand.count()}")
          val scored = Scoring.exactVerify(Scoring.score(cand, sigs, cfg), surv, cfg)
          Scoring.edges(scored).write.mode("overwrite").parquet(s"$dir/sim_edges_$chunk")
        }
      case "subedges" =>
        val surv = spark.read.parquet(s"$dir/survivors")
        timed("subedges") {
          Substring.edges(surv, cfg).select("src", "dst")
            .write.mode("overwrite").parquet(s"$dir/sub_edges")
        }
      case "cc" =>
        val ids = spark.read.parquet(s"$dir/survivors").select("id")
        val edges = spark.read.parquet(s"$dir/sim_edges_*")
          .unionByName(spark.read.parquet(s"$dir/sub_edges"))
        ScaleStats.reset()
        val assign = timed("cc") {
          val a = ConnectedComponents.assign(spark, ids, edges, cfg.maxCcIterations,
            cfg.reliableCheckpoints, cfg.ccFastPathMaxEdges).persist()
          a.count(); a
        }
        val nClusters = assign.agg(countDistinct("cluster_id")).head().getLong(0)
        val nEdges = edges.distinct().count()
        println(s"[cc17] survivors=${ids.count()} edges_distinct=$nEdges clusters=$nClusters")
        ScaleStats.snapshot().toSeq.sortBy(_._1)
          .foreach { case (k, v) => println(s"[cc17] bound $k = $v") }
      case other => sys.error(s"unknown phase $other")
    }
    spark.stop()
  }
}
