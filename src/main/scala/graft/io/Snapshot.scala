package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * Reference analog: trained-model JSON save/load + idempotent DDL reruns
  * (`person_1/link_model_per.py:745-752,1281-1286`, `person_1/person.py:752-756`).
  */
final class SnapshotStore(val root: String) {
  private val dataDir: Path = Paths.get(root, "data")
  private val manifestDir: Path = Paths.get(root, "manifests")
  Files.createDirectories(dataDir)
  Files.createDirectories(manifestDir)

  private def manifestPath(stage: String): Path = manifestDir.resolve(s"$stage.json")

  /** List a directory, closing the stream (Files.list holds an open fd
    * until closed — leaking one per commit under repeated use). */
  private def listDir(dir: Path): Array[Path] = {
    val s = Files.list(dir)
    try s.toArray.map(_.asInstanceOf[Path]) finally s.close()
  }

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
      .flatMap { p =>
        val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
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
    * half-visible snapshot. */
  def commit(stage: String, df: DataFrame, configFingerprint: String): DataFrame = {
    // names are embedded raw in file paths, JSON, and (for the
    // fingerprint) a lookup regex — constrain them instead of escaping
    // in three syntaxes (Pipeline passes hex; this makes it a contract)
    require(stage.matches("[A-Za-z0-9._-]+"), s"unsupported stage name: $stage")
    require(configFingerprint.matches("[A-Za-z0-9._-]*"),
      s"unsupported config fingerprint: $configFingerprint")
    val spark = df.sparkSession
    val id = nextId()
    val dest = dataDir.resolve(s"$stage-$id")
    df.write.mode("overwrite").parquet(dest.toString)
    val rows = spark.read.parquet(dest.toString).count()
    val parent = currentId(stage).getOrElse(0L)
    val manifest =
      s"""{"id":$id,"parent":$parent,"stage":"$stage","path":"${dest.toString}",
         |"config":"$configFingerprint","rows":$rows}""".stripMargin.replace("\n", "")
    val tmp = manifestDir.resolve(s".$stage.json.tmp")
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(stage), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    spark.read.parquet(dest.toString)
  }

  private def readManifest(stage: String): Option[String] = {
    val p = manifestPath(stage)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else None
  }

  def currentId(stage: String): Option[Long] =
    readManifest(stage).flatMap(s =>
      "\"id\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong))

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
      if (cfgOk) path.filter(p => Files.exists(Paths.get(p)))
        .map(p => spark.read.parquet(p))
      else None
    }

  /** Compute-or-load: the resumability primitive. */
  def stage(spark: SparkSession, name: String, configFingerprint: String)
           (compute: => DataFrame): DataFrame =
    latest(spark, name, configFingerprint).getOrElse {
      commit(name, compute, configFingerprint)
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
    val currentPaths = listDir(manifestDir)
      .filter(_.getFileName.toString.endsWith(".json"))
      .flatMap { p =>
        val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        "\"path\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
      }.toSet
    val byStage = listDir(dataDir).filter(p => Files.isDirectory(p)).flatMap { p =>
      val name = p.getFileName.toString
      val cut = name.lastIndexOf('-')
      if (cut <= 0) None
      else name.drop(cut + 1).toLongOption.map(id => (name.take(cut), id, p))
    }.groupBy(_._1)
    var deleted = 0
    byStage.values.foreach { dirs =>
      dirs.sortBy(-_._2).drop(keepLast).foreach { case (_, _, p) =>
        if (!currentPaths.contains(p.toString)) {
          deleteRecursively(p)
          deleted += 1
        }
      }
    }
    deleted
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
