package graft.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical-document ("golden record") selection + id namespacing
  * (SURVEY §7.2 module 10).
  *
  * Reference semantics being re-expressed:
  * - master re-selection by completeness then id
  *   (`person_1/dedup_per.sql:102-121`, W5): ORDER BY non_null_count DESC,
  *   TRY_CAST(id) ASC NULLS LAST, id ASC;
  * - per-column recency fill (`person_1/dedup_per.sql:226-301`, W4):
  *   first non-null by last_updated DESC;
  * - dense new ids from a namespace base (`person_1/dedup_per.sql:365-371`,
  *   `person_2/fv_all_person_lookup.sql:32-109`, W6).
  */
object Golden {

  /** Pick one canonical doc per cluster: longest text (completeness analog),
    * then earliest warc_ts (most-authoritative crawl), then min id —
    * a total order, so deterministic (reference invariant §1.4.4). */
  def canonicalDocs(clustered: DataFrame,
                    idCol: String = "id",
                    tsCol: String = "warc_ts",
                    textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy("cluster_id")
      .orderBy(length(col(textCol)).desc, col(tsCol).asc, col(idCol).asc)
    clustered.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-cluster, per-column most-recent non-null fill (W4/A7 analog):
    * one pass with max_by over (value, recency) — not one window per column. */
  def goldenFill(clustered: DataFrame, orderCol: String, fillCols: Seq[String]): DataFrame = {
    val aggs = fillCols.map { c =>
      // ordering key is (recency, value): recency alone is not a total
      // order, and on ties max_by keeps whichever row the merge visits
      // first — nondeterministic across partitionings, violating the
      // byte-identical-rerun invariant. NULL values order first in the
      // struct, so a non-null value still wins its recency tie.
      max_by(col(c), when(col(c).isNotNull, struct(col(orderCol), col(c)))).as(c)
    }
    clustered.groupBy("cluster_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Dense ids from a namespace base — scalable form of
    * `DENSE_RANK() OVER (ORDER BY …) + base` (W6). A single-partition
    * global window is the reference shape but a scale hazard (SURVEY
    * §7.5.5); this version range-partitions, computes per-partition counts
    * (small collect), then offsets within partitions: distributed, same
    * total order, same result. */
  def denseIds(spark: SparkSession, masters: DataFrame, keyCol: String, base: Long,
               partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = masters.select(col(keyCol)).distinct()
      .repartitionByRange(n, col(keyCol))
      .sortWithinPartitions(col(keyCol))
    // The range exchange SAMPLES its boundaries per physical-plan execution
    // (seeded by RDD id), so the counts action below and the lazy rank
    // window would otherwise each re-execute the exchange with DIFFERENT
    // boundaries — per-partition offsets keyed to stale pids, i.e.
    // duplicate/gapped ids (observed at sf0.1 multi-partition scale).
    // Persisting pins ONE materialized partitioning for every consumer;
    // recompute of a lost block re-reads the same shuffle dependency
    // (boundaries are fixed per exchange execution), never resamples.
    // The final ids are boundary-independent either way — offsets + local
    // ranks reconstruct the same global order wherever the cuts fall — so
    // results stay deterministic across runs and parallelism levels.
    val withPid = IntermediateCaches.persistTracked(
      sorted.withColumn("__pid", spark_partition_id()))
    val counts = withPid.groupBy("__pid").count().as[(Int, Long)].collect().toMap
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    val offsets = (0 to maxPid).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetsB = spark.sparkContext.broadcast(offsets.toArray)
    val rankW = Window.partitionBy("__pid").orderBy(col(keyCol))
    val offsetUdf = udf((pid: Int) => offsetsB.value(pid))
    withPid
      .withColumn("__local", row_number().over(rankW).cast("long"))
      .withColumn("new_id", lit(base) + offsetUdf(col("__pid")) + col("__local"))
      .select(col(keyCol), col("new_id"))
  }

  /** Case-restore update-join (J6 variant,
    * `person_1/link_model_per.py:1379-1399`: `UPDATE c SET … FROM lookup c
    * INNER JOIN person p ON c.id = p.id` restoring original-case names).
    * The linking pipeline lowercases/cleans compared columns; the published
    * lookup restores the ORIGINAL source values by id. Spark has no
    * in-place UPDATE — the same semantics is a join producing a new table
    * (broadcast-eligible when the restored projection is narrow). */
  def restoreOriginal(lookup: DataFrame, source: DataFrame, idCol: String,
                      restoreCols: Seq[String]): DataFrame = {
    val src = source.select((idCol +: restoreCols).map(col): _*)
    restoreCols.foldLeft(lookup)((df, c) => df.drop(c))
      .join(src, Seq(idCol), "left")
  }

  /** Ordered string aggregation (W8, the reference's alternative
    * golden-record form: `STRING_AGG(col, ', ') WITHIN GROUP (ORDER BY
    * last_updated DESC)` + first-token extract,
    * `person_1/link_model_per.py:1591-1665`): collect (order, value)
    * structs, sort, reverse, join — one hash-aggregate shuffle, no window.
    * Ties on the order column break by value descending (total order ⇒
    * deterministic, reference invariant §1.4.4). */
  def orderedStringAgg(df: DataFrame, keyCol: String, valCol: String,
                       orderCol: String, sep: String = ", "): DataFrame =
    df.filter(col(valCol).isNotNull)
      .groupBy(keyCol)
      .agg(array_join(
        expr(s"transform(reverse(array_sort(collect_list(struct($orderCol as o, $valCol as v)))), x -> x.v)"),
        sep).as(s"${valCol}_agg"))

  /** Lineage lookup old_id → (cluster_id, new_id, is_master) — the engine's
    * `DO_NOT_MIGRATE_*_lookup` analog (`person_1/person.py:281`). */
  def lookupTable(assignments: DataFrame, newIds: DataFrame): DataFrame =
    assignments
      .join(newIds.withColumnRenamed("cluster_id", "cid"),
        assignments("cluster_id") === col("cid"), "left")
      .drop("cid")
      .withColumn("is_master", col("id") === col("cluster_id"))
}
