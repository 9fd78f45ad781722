package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

/** Iceberg-style snapshot store (SURVEY §7.2 module 11).
  *
  * No Iceberg runtime jar ships in this sandbox (offline build), so this
  * module implements the Iceberg *contract* the pipeline needs — immutable
  * parquet data files + a tiny JSON manifest per snapshot (id, parent,
  * stage name, config fingerprint, row count), committed atomically by
  * manifest rename — giving checkpoint-based resumability and lineage
  * (north_rule: "restarts from the last committed snapshot"). A real
  * Iceberg catalog slots in by replacing this class: `commit` ≙ append
  * snapshot, `latest` ≙ current-snapshot scan.
  *
  * All I/O goes through the Hadoop `FileSystem`/`FileContext` API resolved
  * from the root URI, NOT `java.nio.file`: on a real cluster the store
  * root is `hdfs://…` (or an object store), where driver-local `Files.move`
  * has no meaning and resumability would die with the driver's machine. A
  * plain local path or `file://` URI maps to the local Hadoop FS and
  * behaves exactly as before (SnapshotSpec runs the same suite both ways).
  *
  * Atomicity caveat by scheme: the manifest swap uses
  * `FileContext.rename(OVERWRITE)`, which is atomic on HDFS and on the
  * local FS — a killed job leaves either the old manifest or the new one,
  * never a torn file. On S3/object stores rename is copy+delete and NOT
  * atomic; deployments there should point the store at an HDFS/consistent
  * volume or front it with a real Iceberg catalog (whose commit protocol
  * solves exactly this). Data files are immutable and id-suffixed, so the
  * non-atomic window only ever concerns the one-file manifest.
  *
  * Reference analog: trained-model JSON save/load + idempotent DDL reruns
  * (`person_1/link_model_per.py:745-752,1281-1286`, `person_1/person.py:752-756`).
  */
final class SnapshotStore(val root: String,
                          hadoopConf: Configuration = SnapshotStore.defaultConf()) {
  private val fs: FileSystem = new HPath(root).getFileSystem(hadoopConf)
  private val rootPath: HPath = fs.makeQualified(new HPath(root))
  // FileContext (not FileSystem.rename) for rename-with-overwrite: the
  // public FileSystem.rename(src,dst) refuses an existing destination, and
  // delete-then-rename would open a manifest-less crash window
  private val fc: FileContext = FileContext.getFileContext(rootPath.toUri, hadoopConf)
  private val dataDir: HPath = new HPath(rootPath, "data")
  private val manifestDir: HPath = new HPath(rootPath, "manifests")
  fs.mkdirs(dataDir)
  fs.mkdirs(manifestDir)

  private def manifestPath(stage: String): HPath = new HPath(manifestDir, s"$stage.json")

  private def readString(p: HPath): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  private def writeString(p: HPath, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def listDir(dir: HPath): Array[HPath] =
    fs.listStatus(dir).map(_.getPath)

  /** Highest id this instance has ISSUED (not yet necessarily visible as
    * a manifest): a commit writes its parquet before its manifest, so a
    * concurrent nextId() re-scan alone would re-issue the in-flight id.
    * Cross-INSTANCE commits to one root are a single-writer contract (the
    * manifest swap is atomic, the counter is advisory — the same stance
    * as an Iceberg committer without a catalog lock). */
  private val lastIssued = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Next snapshot id (monotone counter across all stages). */
  private def nextId(): Long = synchronized {
    val ids = listDir(manifestDir)
      .filter(_.getName.endsWith(".json"))
      .flatMap { p =>
        val s = readString(p)
        "\"id\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong)
      }
    val scanned = if (ids.isEmpty) 1L else ids.max + 1
    val id = math.max(scanned, lastIssued.get() + 1)
    lastIssued.set(id)
    id
  }

  /** Commit a stage result: write immutable parquet, then atomically move
    * the manifest into place. A killed job leaves either no manifest (stage
    * recomputes on restart) or a complete one (stage is skipped) — never a
    * half-visible snapshot.
    *
    * The manifest row count is observed ON the write job itself
    * (`Dataset.observe`) — committing executes exactly one Spark job; the
    * old form re-read the parquet it had just written for a second
    * full-scan count per stage.
    *
    * `partitionBy`: optional partition columns for the data files — at
    * scale a resumed stage that is later read with a partition-column
    * predicate prunes to the matching directories instead of re-scanning
    * the whole snapshot. Restriction: partition VALUES round-trip through
    * Hive-style directory names, so an empty-string (or null) value in a
    * partition column is written as __HIVE_DEFAULT_PARTITION__ and reads
    * back as NULL — choose non-null, non-empty partition columns or the
    * byte-identical-resume contract does not hold for that column.
    *
    * The manifest `rows` field (surfaced via currentRows) is observed on
    * the write job: under stage retries / speculative duplicate task
    * successes observed metrics can overcount — treat it as informational;
    * the data files are the source of truth. */
  def commit(stage: String, df: DataFrame, configFingerprint: String,
             partitionBy: Seq[String] = Nil): DataFrame = {
    // names are embedded raw in file paths, JSON, and (for the
    // fingerprint) a lookup regex — constrain them instead of escaping
    // in three syntaxes (Pipeline passes hex; this makes it a contract)
    require(stage.matches("[A-Za-z0-9._-]+"), s"unsupported stage name: $stage")
    require(configFingerprint.matches("[A-Za-z0-9._-]*"),
      s"unsupported config fingerprint: $configFingerprint")
    val spark = df.sparkSession
    val id = nextId()
    val dest = new HPath(dataDir, s"$stage-$id")
    val obs = Observation()
    val writer = df.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dest.toString)
    val rows = obs.get("rows").asInstanceOf[Long]
    val parent = currentId(stage).getOrElse(0L)
    val manifest =
      s"""{"id":$id,"parent":$parent,"stage":"$stage","path":"${dest.toString}",
         |"config":"$configFingerprint","rows":$rows}""".stripMargin.replace("\n", "")
    val tmp = new HPath(manifestDir, s".$stage.json.tmp")
    writeString(tmp, manifest)
    fc.rename(tmp, manifestPath(stage), Options.Rename.OVERWRITE)
    // read back with the KNOWN schema: schema inference would launch a
    // footer-read job, making commit a two-job operation again (partition
    // columns resolve from the user schema by name, so partitioned commits
    // keep their original column order and types)
    spark.read.schema(df.schema).parquet(dest.toString)
  }

  private def readManifest(stage: String): Option[String] = {
    val p = manifestPath(stage)
    if (fs.exists(p)) Some(readString(p)) else None
  }

  def currentId(stage: String): Option[Long] =
    readManifest(stage).flatMap(s =>
      "\"id\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong))

  /** Manifest row count of the current snapshot for a stage (metrics use —
    * no data scan). */
  def currentRows(stage: String): Option[Long] =
    readManifest(stage).flatMap(s =>
      "\"rows\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong))

  /** Latest committed snapshot for a stage, iff its config fingerprint
    * matches (a changed engine config invalidates downstream snapshots —
    * model-JSON semantics). */
  def latest(spark: SparkSession, stage: String, configFingerprint: String): Option[DataFrame] =
    readManifest(stage).flatMap { m =>
      // quote the fingerprint: '.' or '+' in a caller-supplied value must
      // match literally, not as regex syntax (a '.' would accept a stale
      // snapshot committed under a different config)
      val quoted = java.util.regex.Pattern.quote(s""""config":"$configFingerprint"""")
      val cfgOk = quoted.r.findFirstIn(m).isDefined
      val path = "\"path\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(m).map(_.group(1))
      if (cfgOk) path.filter(p => fs.exists(new HPath(p)))
        .map(p => spark.read.parquet(p))
      else None
    }

  /** Compute-or-load: the resumability primitive. */
  def stage(spark: SparkSession, name: String, configFingerprint: String,
            partitionBy: Seq[String] = Nil)
           (compute: => DataFrame): DataFrame =
    latest(spark, name, configFingerprint).getOrElse {
      commit(name, compute, configFingerprint, partitionBy)
    }

  /** Snapshot expiry (the Iceberg `expire_snapshots` contract this module
    * implements): every commit writes a fresh immutable `stage-<id>` data
    * dir and supersedes the previous one, so a long-lived resumable
    * deployment accumulates dead parquet forever without GC. Deletes all
    * but the `keepLast` newest data dirs per stage — NEVER the one the
    * stage's current manifest points to (resume stays byte-identical even
    * with keepLast = 1, enforced explicitly rather than assumed from id
    * ordering). Returns the number of data dirs deleted. */
  def expireSnapshots(keepLast: Int = 1): Int = synchronized {
    require(keepLast >= 1, "keepLast must be >= 1 (the current snapshot is never expired)")
    // dirs named <stage>-<id>; stage names may themselves contain '-', so
    // split on the LAST dash. Current manifest paths are always retained.
    // qualify BOTH sides of the retain check: a pre-port manifest stores a
    // plain local path while listStatus returns scheme-qualified paths
    // (file:/...), and a raw string compare would fail to protect such a
    // manifest's current data dir — expireSnapshots(keepLast=1) after a
    // crash could then delete the current snapshot's data and force a
    // silent recompute on resume
    val currentPaths = listDir(manifestDir)
      .filter(_.getName.endsWith(".json"))
      .flatMap { p =>
        val s = readString(p)
        "\"path\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
      }
      .map(p => fs.makeQualified(new HPath(p)).toString)
      .toSet
    val byStage = fs.listStatus(dataDir).filter(_.isDirectory).map(_.getPath).flatMap { p =>
      val name = p.getName
      val cut = name.lastIndexOf('-')
      if (cut <= 0) None
      else name.drop(cut + 1).toLongOption.map(id => (name.take(cut), id, p))
    }.groupBy(_._1)
    var deleted = 0
    byStage.values.foreach { dirs =>
      dirs.sortBy(-_._2).drop(keepLast).foreach { case (_, _, p) =>
        if (!currentPaths.contains(fs.makeQualified(p).toString)) {
          fs.delete(p, true)
          deleted += 1
        }
      }
    }
    deleted
  }
}

object SnapshotStore {
  /** Hadoop conf for the store: the active session's (so cluster-deployed
    * credentials/filesystem settings — fs.defaultFS, s3a keys — apply),
    * falling back to a vanilla Configuration off-session. */
  def defaultConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
}
