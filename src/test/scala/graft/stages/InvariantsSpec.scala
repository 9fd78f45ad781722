package graft.stages

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The q41 gate only has teeth if every counter can PROVABLY fail: each
  * test corrupts one aspect of a correct assignment and asserts exactly
  * the matching invariant trips (and, on the happy path, that the engine's
  * real output passes with non-trivial pair counts). */
class InvariantsSpec extends SparkSpec {
  import spark.implicits._

  // 1&2 share a text, 5&6 share a text: 2 required exact pairs
  private def docs: DataFrame = Seq(
    (1L, "aa bb cc"), (2L, "aa bb cc"), (3L, "dd ee ff"),
    (4L, "gg hh ii"), (5L, "jj kk ll"), (6L, "jj kk ll"))
    .toDF("id", "text")

  private def correct: DataFrame = Seq(
    (1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 5L), (6L, 5L))
    .toDF("id", "cluster_id")

  private def inv(assigns: DataFrame): Map[String, Long] =
    try Invariants.dedupInvariants(docs, assigns)
      .as[(String, Long)].collect().toMap
    finally graft.Pipeline.clearIntermediateCaches(spark)

  test("correct assignment: totals match, zero violations") {
    val m = inv(correct)
    assert(m("identical_text_pairs_total") == 2L)
    assert(m("identical_text_pairs_co_clustered") == 2L)
    assert(m("clusters_id_ne_min_member") == 0L)
    assert(m("docs_multiply_assigned") == 0L)
    assert(m("docs_missing_assignment") == 0L)
  }

  test("split exact pair trips co-clustered (and only it)") {
    // doc 2 exiled to its own cluster: root invariant still holds (2 is
    // min of {2}), but the exact pair (1,2) is no longer co-clustered
    val broken = correct.withColumn("cluster_id",
      when(col("id") === 2L, 2L).otherwise(col("cluster_id")))
    val m = inv(broken)
    assert(m("identical_text_pairs_total") == 2L)
    assert(m("identical_text_pairs_co_clustered") == 1L)
    assert(m("clusters_id_ne_min_member") == 0L)
  }

  test("mis-rooted cluster trips id-ne-min-member") {
    // cluster {5,6} relabeled to its NON-min member 6
    val broken = correct.withColumn("cluster_id",
      when(col("cluster_id") === 5L, 6L).otherwise(col("cluster_id")))
    assert(inv(broken)("clusters_id_ne_min_member") == 1L)
  }

  test("duplicated assignment row trips multiply-assigned") {
    val broken = correct.unionByName(Seq((3L, 3L)).toDF("id", "cluster_id"))
    assert(inv(broken)("docs_multiply_assigned") == 1L)
  }

  test("dropped doc trips missing-assignment; its pair stops co-clustering") {
    val broken = correct.filter(col("id") =!= 6L)
    val m = inv(broken)
    assert(m("docs_missing_assignment") == 1L)
    assert(m("identical_text_pairs_co_clustered") == 1L)
  }

  test("real runLite output passes the gate with planted dups (q41 shape)") {
    val base = graft.fixtures.Corpus.generate(spark, 300)
      .select(col("id"), col("text"))
    val aug = base.unionByName(base.filter(col("id") % 20 === 0)
      .select((col("id") + 10000000L).as("id"), col("text")))
    val assigns = graft.Pipeline.runLite(spark, aug)
    val m = try Invariants.dedupInvariants(aug, assigns)
      .as[(String, Long)].collect().toMap
      finally graft.Pipeline.clearIntermediateCaches(spark)
    assert(m("identical_text_pairs_total") > 0L, "planting must create exact pairs")
    assert(m("identical_text_pairs_co_clustered") == m("identical_text_pairs_total"))
    assert(m("clusters_id_ne_min_member") == 0L)
    assert(m("docs_multiply_assigned") == 0L)
    assert(m("docs_missing_assignment") == 0L)
  }
}
