package graft.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

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
      // A non-null value with NULL recency stays ELIGIBLE and loses to any
      // non-null recency (struct with null first field sorts lowest) —
      // T-SQL parity: ORDER BY last_updated DESC puts NULLs last, it does
      // not exclude the row (`person_1/link_model_per.py:1597`).
      max_by(col(c), when(col(c).isNotNull, struct(col(orderCol), col(c)))).as(c)
    }
    clustered.groupBy("cluster_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Dense ids from a namespace base — scalable form of
    * `DENSE_RANK() OVER (ORDER BY …) + base` (W6). A single-partition
    * global window is the reference shape but a scale hazard (SURVEY
    * §7.5.5); this version discovers range boundaries once (small collect
    * of per-range min key + count), then assigns each key a range by
    * binary search and offsets local ranks within ranges: distributed,
    * same total order, same result.
    *
    * The range cuts are FROZEN on the driver, so the returned plan is a
    * pure function of (input keys, frozen cuts): any re-execution —
    * evicted cache, cleared engine caches before a late consumer, lost
    * block — reconstructs identical ids. The earlier form reused the
    * range exchange's own sampled partition ids, which RESAMPLE per
    * physical execution; driver offsets keyed to one sampling then met
    * rows partitioned by another, emitting duplicate/gapped ids.
    *
    * Keys must be integral or string (the engine's two uses: numeric
    * cluster ids, name keys); a null key, if present, ranks first. */
  def denseIds(spark: SparkSession, masters: DataFrame, keyCol: String, base: Long,
               partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keyType = masters.schema(keyCol).dataType
    val integral = keyType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case StringType => false
      case t => throw new IllegalArgumentException(
        s"denseIds supports integral and string keys, got $t for '$keyCol'")
    }
    val keys = IntermediateCaches.persistTracked(masters.select(col(keyCol)).distinct())
    // One materialization of a range exchange to DISCOVER cuts: the i-th
    // non-empty partition covers exactly [min_i, min_{i+1}) — any key
    // between partition i's upper boundary and min_{i+1} would itself be
    // a smaller member of partition i+1. So (min, count) per partition,
    // in order, fully describes a valid range split of the key set.
    val stats = keys.repartitionByRange(n, col(keyCol))
      .select(spark_partition_id().as("__p"), col(keyCol))
      .groupBy("__p")
      .agg(min(col(keyCol)).as("__min"), count(lit(1)).as("__cnt"))
      .orderBy("__p")
      .collect() // ≤ n rows, one per non-empty range
    val offsets = stats.map(_.getLong(2)).scanLeft(0L)(_ + _)
    val offsetsB = spark.sparkContext.broadcast(offsets)
    // range index = last i with min_i <= key (binary search over the
    // frozen mins). A null min marks the range holding only the null key
    // (min() ignores nulls) = -infinity; null keys route to range 0 in
    // the column guard, mirroring asc_nulls_first.
    val pidOf = if (integral) {
      val mins = stats.map(r => if (r.isNullAt(1)) null
        else java.lang.Long.valueOf(r.get(1).asInstanceOf[Number].longValue))
      val minsB = spark.sparkContext.broadcast(mins)
      val u = udf((k: Long) => rangeOfLong(minsB.value, k))
      when(col(keyCol).isNull, lit(0)).otherwise(u(col(keyCol).cast("long")))
    } else {
      // Spark sorts strings as unsigned UTF-8 bytes (UTF8String binary
      // order); Java String.compareTo is UTF-16 code-unit order. The two
      // disagree for supplementary-plane characters (U+FFFF sorts below
      // U+1F600 in UTF-8 but above it in UTF-16), so the driver-side
      // binary search MUST compare the same way the range exchange
      // sorted, or a key near a range boundary routes to the wrong range.
      val mins = stats.map(r => if (r.isNullAt(1)) null
        else r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val minsB = spark.sparkContext.broadcast(mins)
      val u = udf((k: String) => rangeOfString(minsB.value,
        k.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      when(col(keyCol).isNull, lit(0)).otherwise(u(col(keyCol)))
    }
    val rankW = Window.partitionBy("__pid").orderBy(col(keyCol).asc_nulls_first)
    val offsetUdf = udf((pid: Int) => offsetsB.value(pid))
    keys
      .withColumn("__pid", pidOf)
      .withColumn("__local", row_number().over(rankW).cast("long"))
      .withColumn("new_id", lit(base) + offsetUdf(col("__pid")) + col("__local"))
      .select(col(keyCol), col("new_id"))
  }

  // largest i with mins(i) <= k over ascending mins; a null min is the
  // -infinity range (only the null key sorts below every non-null min,
  // and callers route null keys to range 0 before the udf)
  private def rangeOfLong(mins: Array[java.lang.Long], k: Long): Int = {
    var lo = 0; var hi = mins.length - 1; var ans = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (mins(mid) == null || mins(mid).longValue <= k) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    ans
  }

  private def rangeOfString(mins: Array[Array[Byte]], k: Array[Byte]): Int = {
    var lo = 0; var hi = mins.length - 1; var ans = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (mins(mid) == null || utf8Compare(mins(mid), k) <= 0) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    ans
  }

  // unsigned byte-wise lexicographic compare — identical to Spark's
  // UTF8String.compareTo, the order repartitionByRange sorted the keys in
  private def utf8Compare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
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
