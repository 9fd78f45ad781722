package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-row lineage — the reference pipeline's main human-facing output:
  * one row per cluster member carrying the comparison evidence (gammas) of
  * its direct edge to the cluster master, plus a match-type label.
  *
  * Reference semantics being re-expressed
  * (`person_1/link_model_per.py:1064-1129` gamma merge-back,
  * `:1219-1262` association labels, counts `:1267-1269`):
  * - the reference builds `key = cluster_id_id` and left-joins predictions
  *   TWICE (key_l = id_l_id_r, key_r = id_r_id_l) then `combine_first`s the
  *   columns. Because our edges are already canonicalised to
  *   `id_l < id_r` and `cluster_id = min(member id)` (so cluster_id < id
  *   for every non-self row), ONE equi-join on
  *   (id_l = cluster_id, id_r = id) is equivalent — the J5 simplification
  *   SURVEY §2.3 calls out;
  * - self rows (id == cluster_id) get sentinel gammas
  *   (`link_model_per.py:1110-1123`) → label "Self";
  * - members WITH a direct above-threshold edge to the master → "Direct
  *   match";
  * - members without one that came from the exact-duplicate pre-pass →
  *   "Association match (Exact)" (`:1248-1253`);
  * - remaining members (connected only transitively) → "Association match"
  *   (`:1254-1262`).
  */
object Lineage {

  /** Gamma-level → human description (F18,
    * `person_1/link_model_per.py:1137-1213`: dict per gamma column with a
    * NaN default). Engine levels: 2 = Jaccard ≥ threshold (exact-verified),
    * 1 = SimHash Hamming ≤ threshold, 0 = below threshold, -1 = invalid. */
  val LevelDescriptions: Map[Int, String] = Map(
    2 -> "Jaccard >= threshold",
    1 -> "SimHash Hamming <= threshold",
    0 -> "Below threshold",
    -1 -> "Invalid (NULL)")

  /** Description column for a gamma/level column: literal map + element_at,
    * default for unseen/null levels (the reference's NaN default). */
  def desc(level: Column, m: Map[Int, String], default: String): Column =
    coalesce(element_at(typedlit(m), level.cast("int")), lit(default))

  def levelDesc(level: Column, default: String = "No direct comparison"): Column =
    desc(level, LevelDescriptions, default)

  /** @param assignments (id, cluster_id) — every input doc, cluster_id =
    *        min member id
    * @param scoredEdges (id_l, id_r, ...gamma columns) with id_l < id_r,
    *        already threshold-filtered (level ≥ 1)
    * @param exactHoldoutIds single column `id`: docs removed by the
    *        exact-dup pre-pass (re-attached via their master, J4)
    * @param gammaCols the per-edge evidence columns to merge back onto
    *        member rows (null on rows without a direct edge to the master)
    * @return assignments + gammaCols + `match_type`. */
  def clusterRows(assignments: DataFrame, scoredEdges: DataFrame,
                  exactHoldoutIds: DataFrame,
                  gammaCols: Seq[String] = Seq("jaccard_est", "hamming", "level", "reason"))
      : DataFrame = {
    val direct = scoredEdges.select(
      col("id_l").as("cluster_id"), col("id_r").as("id"),
      struct(gammaCols.map(col): _*).as("__g"))
    // a (cluster_id, id) pair can have at most one canonical edge, so the
    // join is 1:≤1; left join keeps edge-less members with null gammas
    val exact = exactHoldoutIds.select(col("id"), lit(true).as("__is_exact"))
    val merged = assignments
      .join(direct, Seq("cluster_id", "id"), "left")
      .join(exact, Seq("id"), "left")
      .withColumn("match_type",
        when(col("id") === col("cluster_id"), lit("Self"))
          .when(col("__g").isNotNull, lit("Direct match"))
          .when(col("__is_exact"), lit("Association match (Exact)"))
          .otherwise(lit("Association match")))
    gammaCols.foldLeft(merged)((df, c) => df.withColumn(c, col("__g").getField(c)))
      .drop("__g", "__is_exact")
  }

  /** Label counts (≙ the reference's printed association-match counts,
    * `person_1/link_model_per.py:1267-1269`). */
  def labelCounts(clusterRows: DataFrame): DataFrame =
    clusterRows.groupBy("match_type").agg(count(lit(1)).as("n"))
      .orderBy("match_type")
}
