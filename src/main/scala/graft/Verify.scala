package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (dev use)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // drop any previous run's manifest FIRST: if this JVM dies mid-run into
    // a reused outDir, a stale manifest must not pair with the fresh partial
    // output dirs and masquerade as a completed run — a missing manifest is
    // the unambiguous crash signal for the comparator
    Files.deleteIfExists(Paths.get(s"$outDir/_manifest.json"))
    val ran = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    ran.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
      }
      // pipeline-shaped queries persist intermediates they cannot unpersist
      // (lazy contract); without this, 36 queries accumulate caches and the
      // tail of the run measures eviction churn, not the queries
      spark.sharedState.cacheManager.clearCache()
    }
    // machine-readable manifest: a failed query writes NO q-dir, so a
    // directory-globbing comparator would otherwise silently skip it and
    // read green — the gate must see what was ATTEMPTED, not just what
    // succeeded (failures also go to stdout, not only the stderr log noise)
    if (failed.nonEmpty) println(s"[verify] FAILED: ${failed.mkString(",")}")
    def jarr(xs: Seq[String]): String = xs.map(x => s""""$x"""").mkString("[", ", ", "]")
    Files.writeString(Paths.get(s"$outDir/_manifest.json"),
      s"""{"failed": ${jarr(failed.toSeq.sorted)}, "ran": ${jarr(ran.keys.toSeq.sorted)}, "filtered": ${only.isDefined}}""")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
