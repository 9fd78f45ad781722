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
