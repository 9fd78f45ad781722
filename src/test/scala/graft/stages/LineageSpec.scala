package graft.stages

import graft.SparkSpec
import graft.model.EngineConfig
import org.apache.spark.sql.functions._

/** Cluster-row lineage gates (reference semantics:
  * person_1/link_model_per.py:1064-1129, :1219-1262, counts :1267-1269). */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  test("planted triangle + exact holdout reproduce the three label classes") {
    // cluster {1,2,3,4}: edges 1-2 and 2-3 (3 is transitive w.r.t. master 1),
    // 4 is an exact-dup holdout of 2; 5 is a singleton
    val assignments = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L))
      .toDF("id", "cluster_id")
    val edges = Seq(
      (1L, 2L, 0.9, 1, 2, "minhash-band=0"),
      (2L, 3L, 0.8, 2, 2, "minhash-band=3"))
      .toDF("id_l", "id_r", "jaccard_est", "hamming", "level", "reason")
    val holdouts = Seq(4L).toDF("id")

    val rows = Lineage.clusterRows(assignments, edges, holdouts)
      .select("id", "match_type", "level", "reason")
      .as[(Long, String, Option[Int], Option[String])]
      .collect().sortBy(_._1)

    assert(rows(0) == ((1L, "Self", None, None)))
    assert(rows(1) == ((2L, "Direct match", Some(2), Some("minhash-band=0"))))
    // 3 has an edge to 2 but NOT to master 1 → association by transitivity
    assert(rows(2) == ((3L, "Association match", None, None)))
    assert(rows(3) == ((4L, "Association match (Exact)", None, None)))
    assert(rows(4) == ((5L, "Self", None, None)))

    val counts = Lineage.labelCounts(Lineage.clusterRows(assignments, edges, holdouts))
      .as[(String, Long)].collect().toMap
    assert(counts == Map(
      "Self" -> 2L, "Direct match" -> 1L,
      "Association match" -> 1L, "Association match (Exact)" -> 1L))
  }

  test("gamma description mapping has the reference's default semantics (F18)") {
    val df = Seq(Some(2), Some(1), Some(0), Some(-1), Some(7), None).toDF("level")
      .select(col("level"), Lineage.levelDesc(col("level")).as("d"))
    val got = df.as[(Option[Int], String)].collect().toMap
    assert(got(Some(2)) == "Jaccard >= threshold")
    assert(got(Some(1)) == "SimHash Hamming <= threshold")
    assert(got(Some(0)) == "Below threshold")
    assert(got(Some(-1)) == "Invalid (NULL)")
    assert(got(Some(7)) == "No direct comparison") // unseen level → default
    assert(got(None) == "No direct comparison")    // NULL → default (NaN analog)
  }

  test("full pipeline lineage: exact dups labelled (Exact), substring edges carry reason") {
    val base = (1 to 120).map(i => s"w$i").mkString(" ")
    val near = (1 to 120).map(i => if (i == 60) "edited" else s"w$i").mkString(" ")
    val far = (1 to 120).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),          // exact dup → 2 is a holdout of 1
      (3L, near),                       // near-dup of 1 → direct edge
      (4L, far), (5L, base + " " + far) // 5 contains 4 → substring edge
    ).toDF("id", "text")
      .withColumn("url", concat(lit("u"), col("id")))
      .withColumn("warc_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("lang", lit("en"))
    val res = graft.Pipeline.run(spark, docs, EngineConfig.default)
    val byId = res.lineage
      .select("id", "cluster_id", "match_type", "reason")
      .as[(Long, Long, String, Option[String])].collect().map(r => r._1 -> r).toMap

    assert(byId(1L)._3 == "Self")
    assert(byId(2L)._2 == 1L && byId(2L)._3 == "Association match (Exact)")
    assert(byId(3L)._2 == 1L && byId(3L)._3 == "Direct match")
    // 4-5 substring containment: one of them is the master, the other a
    // direct match with reason substring (5 also chains to 1 via its prefix)
    val subRow = Seq(byId(4L), byId(5L)).filter(_._3 == "Direct match")
    assert(subRow.nonEmpty && subRow.forall(_._4.exists(r => r == "substring" || r.startsWith("minhash"))),
      s"got ${byId(4L)} / ${byId(5L)}")
  }
}
