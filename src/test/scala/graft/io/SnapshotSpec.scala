package graft.io

import graft.{Pipeline, SparkSpec}
import graft.fixtures.Corpus
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-snap").toString

  test("commit/latest round-trip with config fingerprint gating") {
    val root = tmpDir()
    val store = new SnapshotStore(root)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    store.commit("s1", df, "cfgA")
    val back = store.latest(spark, "s1", "cfgA")
    assert(back.isDefined && back.get.count() == 2)
    assert(store.latest(spark, "s1", "cfgB").isEmpty) // config changed → recompute
    assert(store.latest(spark, "nope", "cfgA").isEmpty)
  }

  test("config fingerprint matches literally — '.' must not wildcard") {
    val store = new SnapshotStore(tmpDir())
    val df = Seq((1L, "a")).toDF("id", "v")
    store.commit("s", df, "cfgxa")
    // '.' in a looked-up fingerprint is a regex metachar: unquoted it
    // would match 'cfgxa' and silently resume from a different config
    assert(store.latest(spark, "s", "cfg.a").isEmpty)
    assert(store.latest(spark, "s", "cfgxa").isDefined)
    // names that cannot be embedded in path/JSON/regex are rejected up front
    intercept[IllegalArgumentException](store.commit("bad/stage", df, "c"))
    intercept[IllegalArgumentException](store.commit("s", df, "c\"x"))
  }

  test("stage() computes once, then serves the snapshot") {
    val root = tmpDir()
    val store = new SnapshotStore(root)
    var computes = 0
    def body = { computes += 1; Seq((1L, 10L)).toDF("id", "x") }
    store.stage(spark, "st", "c")(body)
    store.stage(spark, "st", "c")(body)
    assert(computes == 1)
    // a NEW store instance (≙ restarted job) still sees the snapshot
    val store2 = new SnapshotStore(root)
    store2.stage(spark, "st", "c")(body)
    assert(computes == 1)
  }

  test("kill/restart: resumed run reproduces byte-identical assignments") {
    val root = tmpDir()
    val docs = Corpus.generate(spark, 600)
      .select("id", "url", "warc_ts", "text", "lang").persist()
    docs.count()

    val full = Pipeline.runResumable(spark, docs, root)
      .as[(Long, Long)].collect().sortBy(_._1)

    // simulate a kill AFTER the edges snapshot: delete only the downstream
    // assignment snapshot, keep upstream commits
    val manifests = Files.list(Paths.get(root, "manifests")).iterator().asScala.toList
    manifests.filter(_.getFileName.toString.startsWith("assignments"))
      .foreach(Files.delete)
    val resumed = Pipeline.runResumable(spark, docs, root)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(resumed.sameElements(full))

    // restart from scratch in a different store: identical again
    val fresh = Pipeline.runResumable(spark, docs, tmpDir())
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(fresh.sameElements(full))
  }

  test("expireSnapshots removes superseded data dirs; resume stays byte-identical") {
    val root = tmpDir()
    val store = new SnapshotStore(root)
    // three commits to the same stage → three stage-<id> data dirs
    val expected = Seq((1L, "x"), (2L, "y"), (3L, "z"))
    expected.zipWithIndex.foreach { case (_, i) =>
      store.commit("st", expected.take(i + 1).toDF("id", "v"), s"cfg$i")
    }
    def dataDirs() = Files.list(Paths.get(root, "data")).iterator().asScala.toList
      .map(_.getFileName.toString).sorted
    assert(dataDirs().size == 3, s"expected 3 data dirs, got ${dataDirs()}")
    val deleted = store.expireSnapshots(keepLast = 1)
    assert(deleted == 2, s"expected 2 expired, got $deleted")
    assert(dataDirs().size == 1)
    // the surviving dir is the current manifest's — resume is unaffected
    val back = store.latest(spark, "st", "cfg2")
    assert(back.isDefined)
    assert(back.get.as[(Long, String)].collect().sortBy(_._1).toSeq == expected)
    // a fresh store instance (restarted job) also still resumes
    assert(new SnapshotStore(root).latest(spark, "st", "cfg2").isDefined)
    // idempotent: nothing left to expire
    assert(store.expireSnapshots(keepLast = 1) == 0)
  }

  test("expireSnapshots never deletes a current manifest's dir even when ids skew") {
    val root = tmpDir()
    val store = new SnapshotStore(root)
    store.commit("a", Seq((1L, "p")).toDF("id", "v"), "c")   // a-1 (current for a)
    store.commit("b", Seq((2L, "q")).toDF("id", "v"), "c")   // b-2 (current for b)
    store.commit("b", Seq((3L, "r")).toDF("id", "v"), "c")   // b-3 supersedes b-2
    assert(store.expireSnapshots(keepLast = 1) == 1) // only b-2 goes
    assert(store.latest(spark, "a", "c").isDefined)
    assert(store.latest(spark, "b", "c").get.count() == 1)
  }

  test("lineage snapshots are committed per stage") {
    val root = tmpDir()
    val docs = Corpus.generate(spark, 200)
      .select("id", "url", "warc_ts", "text", "lang")
    Pipeline.runResumable(spark, docs, root)
    val store = new SnapshotStore(root)
    for (st <- Seq("survivors", "signatures", "edges", "assignments"))
      assert(store.currentId(s"lineage_$st").isDefined, s"missing lineage for $st")
    val lin = store.latest(spark, "lineage_assignments",
      Integer.toHexString(Pipeline.configJson(graft.model.EngineConfig.default).hashCode))
    assert(lin.get.agg(org.apache.spark.sql.functions.sum("count"))
      .head().getLong(0) == 200L)
  }
}
