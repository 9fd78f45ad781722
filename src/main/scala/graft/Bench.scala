package graft

import graft.fixtures.Corpus
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline operator queries on the sf-dir tables +
  * the north-star metric — end-to-end dedup docs/sec on the deterministic
  * synthetic corpus (BASELINE.md anchor: reference ≈ 1,580 docs/s
  * single-node, person_1/person.py:20,389).
  *
  * Measurement discipline (this sandbox shows 3–8× wall-clock variance from
  * co-tenant CPU steal): the corpus pipeline runs up to [[MaxReps]]
  * repetitions inside one JVM and the MINIMUM per-doc time is reported —
  * the least-contended sample is the engine's real number. Reps stop early
  * once [[RepBudgetSec]] cumulative seconds are spent so a heavily-stolen
  * window degrades to fewer reps, never to an unbounded run.
  *
  * The result JSON is printed as the LAST stdout line (after
  * `spark.stop()`, so no log interleaving) and also written to
  * `bench.json` in the working directory.
  */
object Bench {

  /** Headline subset (kept fast; full surface is exercised by Verify). */
  val headline: Seq[String] = Seq(
    "q01_agg_tf", "q03_window_dedup", "q07_golden_fill", "q16_event_windows",
    "q17_token_stats", "q20_ngram_jaccard", "q21_cc_clusters",
    "q22_minhash_lsh", "q24_dedup_pipeline", "q25_cosine_top1")

  val MaxReps = 5
  val MinReps = 2
  val RepBudgetSec = 1800.0

  /** Spark scratch space (shuffle files, spills): memory-backed tmpfs when
    * available — the single shared virtio disk of this sandbox serializes
    * shuffle I/O across all cores, which a real cluster's per-executor
    * local NVMe does not; tmpfs models the per-node fast scratch disk.
    * Override with SPARK_GRAFT_LOCAL_DIR (empty string = Spark default). */
  def localDir: Option[String] = sys.env.get("SPARK_GRAFT_LOCAL_DIR")
    .map(_.trim).map(s => if (s.isEmpty) null else s)
    .orElse(Option(if (new java.io.File("/dev/shm").canWrite) "/dev/shm/graft-spark" else null))
    .filter(_ != null)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 800k docs ≈ 50-110 s/rep at local[32] on round-3 code: large enough
    // that per-job fixed latency (~10 s across the pipeline's jobs,
    // size-independent) is well amortized, small enough for 5 reps in
    // budget even with one heavily-stolen rep (RepBudgetSec guards)
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "800000").toLong
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = localDir.fold(builder0)(d => builder0.config("spark.local.dir", d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline queries: one warm-up pass (discarded — pays JIT + parquet
    // footer reads + co-tenant noise) then min of 2 timed passes. Single
    // samples in this sandbox vary up to 5× between runs of identical code
    // (round-2 artifact: q22 16.3 s recorded vs 3.4 s same code in a calm
    // window), which reads as a fake regression; the min-of-2-after-warm
    // discipline matches the corpus metric's min-of-reps. Failures are
    // recorded as null, never silently folded into a timing — including a
    // headline name that no longer resolves in the query registry.
    val qs = SparkEntry.queries
    val QueryReps = 2
    val results: Seq[(String, Option[Double])] = headline.map { name =>
      if (!qs.contains(name)) {
        System.err.println(s"[bench] $name MISSING from SparkEntry.queries")
        name -> None
      } else try {
        qs(name)(spark, sfDir).count() // warm-up, discarded
        val secs = (1 to QueryReps).map { _ =>
          // drop the engine caches the warm-up (or a previous rep) left
          // behind: cache-persisting queries (q24's pipeline, q20-q22's
          // candidate stages) would otherwise substitute their cached
          // InMemoryRelations and the "timing" would measure warm-cache
          // replay of a fraction of the plan, not the query — the same
          // cold-per-rep discipline as the corpus loop below. JIT and OS
          // file-cache warmth (the legitimate warm-up targets) survive a
          // Spark-level cache clear.
          Pipeline.clearIntermediateCaches(spark)
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          qs(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        name -> Some(secs.min)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> None
      }
    }

    // north-star: end-to-end dedup throughput on the synthetic corpus,
    // min over interleaved reps (generation excluded from the timed window).
    // Headline-query caches are dropped BEFORE rep 1 so every rep runs
    // under the same memory conditions.
    spark.sharedState.cacheManager.clearCache()
    val corpus = Corpus.generate(spark, benchDocs, includeHtml = false)
      .select("id", "url", "warc_ts", "text", "lang").persist()
    corpus.count()
    var repSecs = List.empty[Double]
    var more = true
    while (more) {
      val t0 = System.nanoTime()
      Pipeline.runLite(spark, corpus).count()
      repSecs ::= (System.nanoTime() - t0) / 1e9
      more = repSecs.size < MaxReps &&
        (repSecs.size < MinReps || repSecs.sum < RepBudgetSec)
      if (more) {
        // drop the pipeline's internal caches so the next rep measures a
        // COLD end-to-end run (not a warm-cache replay), then restore the
        // input cache outside the timed window; skipped after the last rep
        spark.sharedState.cacheManager.clearCache()
        corpus.persist()
        corpus.count()
      }
    }
    val corpusSec = repSecs.min
    val docsPerSec = benchDocs / corpusSec

    val qJson = results.map {
      case (k, Some(v)) => f""""$k":$v%.3f"""
      case (k, None) => s""""$k":null"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => s""""$k"""" }.mkString("[", ",", "]")
    val repsJson = repSecs.reverse.map(s => f"$s%.1f").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum + repSecs.sum
    val json =
      f"""{"metric":"dedup_docs_per_sec","value":$docsPerSec%.1f,"unit":"docs/s","queries":$qJson,"failed_queries":$failed,"sf":"$sfDir","corpus_docs":$benchDocs,"corpus_sec":$corpusSec%.1f,"corpus_rep_secs":$repsJson,"total_sec":$total%.1f,"cpus":$cpus}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), json)
    catch { case _: Throwable => () }
    spark.stop()
    // LAST stdout line, after spark.stop(): nothing can interleave with it
    println(json)
  }
}
