package graft.stages

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Necessary-condition invariants over a dedup pipeline's OUTPUT.
  *
  * The engine-native stages (minhash/LSH/CC) cannot be reproduced in ANSI
  * SQL, but several conditions their output MUST satisfy can: identical
  * texts must co-cluster (the exact-dup closure IS SQL-expressible), a
  * cluster's id must equal its minimum member id (the CC contract,
  * `person_1/link_model_per.py:1045` cluster = min linked id), and every
  * input doc must carry exactly one assignment (the reference's lookup is
  * one row per id, `person_1/link_model_per.py:1248-1253`). Emitting these
  * as COUNTERS — total exact pairs vs exact pairs co-clustered, plus three
  * violation counts expected 0 — turns the weakest driver-gate class
  * (rows-only "it returned rows") into invariants held under an
  * independent oracle: DuckDB computes the same totals from the same
  * parquet, and any engine defect (a split exact pair, a mis-rooted
  * cluster, a dropped or duplicated doc) breaks the value match.
  */
object Invariants {

  /** Invariant counters for (docs ⊲ assignments), one row per invariant:
    *
    *  - `identical_text_pairs_total`: pairs of docs sharing a text —
    *    what the exact closure requires to co-cluster (> 0 when callers
    *    plant dups, so the check is non-trivially exercised);
    *  - `identical_text_pairs_co_clustered`: of those, pairs the engine
    *    actually co-clustered — must equal the total;
    *  - `clusters_id_ne_min_member`: clusters violating id = min(member);
    *  - `docs_multiply_assigned` / `docs_missing_assignment`: assignment
    *    is a bijection onto the input ids.
    *
    * Lazy plan (no action here); the five branches reuse the persisted
    * doc⊲assignment join and assignment frame.
    *
    * Cache contract: the two persists are ENGINE-TRACKED
    * ([[IntermediateCaches]]) and live until
    * `Pipeline.clearIntermediateCaches(spark)` — call it after consuming
    * the returned counters. A monitoring caller invoking this periodically
    * in a long session without clearing accumulates two cached frames per
    * invocation. */
  def dedupInvariants(docs: DataFrame, assignments: DataFrame,
                      idCol: String = "id", textCol: String = "text"): DataFrame = {
    val assigns = IntermediateCaches.persistTracked(
      assignments.select(col(idCol).as("__id"), col("cluster_id")))
    val joined = IntermediateCaches.persistTracked(
      docs.select(col(idCol).as("__id"), col(textCol).as("__text"))
        .join(assigns, Seq("__id"), "left"))

    // n docs share a text → n*(n-1) div 2 required pairs (integer-exact)
    val totalPairs = joined.groupBy("__text").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("value"))
      .select(lit("identical_text_pairs_total").as("invariant"), col("value"))
    // pairs co-clustered: group by (text, cluster); unassigned rows
    // (cluster null) never count as co-clustered with anything
    val coClustered = joined.filter(col("cluster_id").isNotNull)
      .groupBy("__text", "cluster_id").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("value"))
      .select(lit("identical_text_pairs_co_clustered").as("invariant"), col("value"))
    val badRoot = assigns.groupBy("cluster_id").agg(min(col("__id")).as("__min"))
      .filter(col("cluster_id") =!= col("__min"))
      .agg(count(lit(1)).as("value"))
      .select(lit("clusters_id_ne_min_member").as("invariant"), col("value"))
    val multi = assigns.groupBy("__id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("value"))
      .select(lit("docs_multiply_assigned").as("invariant"), col("value"))
    val missing = joined.filter(col("cluster_id").isNull)
      .agg(count(lit(1)).as("value"))
      .select(lit("docs_missing_assignment").as("invariant"), col("value"))

    totalPairs.unionByName(coClustered).unionByName(badRoot)
      .unionByName(multi).unionByName(missing)
  }
}
