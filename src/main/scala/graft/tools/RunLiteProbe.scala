package graft.tools

import graft.Pipeline
import graft.fixtures.Corpus
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: phase timing of the EXACT runLite path the benches measure —
  * build (PairGen bounded collects run here), then the single count action
  * (CC materialize + iterations show up via GRAFT_CC_DEBUG). With
  * GRAFT_STAGE_DEBUG=1 prints per-stage task counts, wall, summed task
  * time, cpu and GC time — the tool for finding stages that run with
  * fewer tasks than cores or burn wall on GC/shuffle instead of cpu. */
object RunLiteProbe {

  final case class StageRow(id: Int, name: String, tasks: Int, wallMs: Long,
                            taskMs: Long, cpuMs: Long, gcMs: Long,
                            shuffleReadMb: Long, shuffleWriteMb: Long)

  private class StageStats extends SparkListener {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      rows.add(StageRow(
        si.stageId,
        si.name.takeWhile(_ != '\n').take(60),
        si.numTasks,
        (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L),
        m.executorRunTime,
        m.executorCpuTime / 1000000L,
        m.jvmGCTime,
        m.shuffleReadMetrics.totalBytesRead / (1 << 20),
        m.shuffleWriteMetrics.bytesWritten / (1 << 20)))
    }
  }

  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toLong else 400000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val builder0 = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
    val spark = graft.Bench.localDir.fold(builder0)(d => builder0.config("spark.local.dir", d))
      .getOrCreate()
    val stats = if (sys.env.contains("GRAFT_STAGE_DEBUG")) {
      val s = new StageStats; spark.sparkContext.addSparkListener(s); Some(s)
    } else None
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Corpus.generate(spark, docs, includeHtml = false)
      .select("id", "url", "warc_ts", "text", "lang").persist()
    corpus.count()
    val t0 = System.nanoTime()
    val out = Pipeline.runLite(spark, corpus)
    val t1 = System.nanoTime()
    println(f"[probe] build (incl. PairGen collects): ${(t1 - t0) / 1e9}%.1f s")
    out.count()
    val t2 = System.nanoTime()
    println(f"[probe] count action: ${(t2 - t1) / 1e9}%.1f s  total ${(t2 - t0) / 1e9}%.1f s")
    stats.foreach { s =>
      Thread.sleep(500) // let straggling listener events drain
      val rows = s.rows.toArray(Array.empty[StageRow]).sortBy(-_.wallMs)
      val totalWall = rows.map(_.wallMs).sum
      println(f"[stages] total stage wall ${totalWall / 1000.0}%.1f s (sum over ${rows.length} stages; driver gaps = probe total - this)")
      println("[stages] wall_s tasks task_s cpu_s gc_s shufR_mb shufW_mb  name")
      rows.take(25).foreach { r =>
        println(f"[stages] ${r.wallMs / 1000.0}%6.1f ${r.tasks}%5d ${r.taskMs / 1000.0}%6.1f ${r.cpuMs / 1000.0}%6.1f ${r.gcMs / 1000.0}%5.1f ${r.shuffleReadMb}%8d ${r.shuffleWriteMb}%8d  ${r.name}")
      }
    }
    spark.stop()
  }
}
