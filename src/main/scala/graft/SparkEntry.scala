package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: full near-dup pipeline over the sf0.001 documents table →
    * (doc_id, cluster_id) assignments. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    Pipeline.runLite(spark, docs)
      .select(col("id").as("doc_id"), col("cluster_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data-pipeline operators). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Engine-native ops (minhash/simhash/LSH/pipeline) are
    * omitted → driver records a rows-only check; those are covered by the
    * ScalaTest all-pairs oracles instead. */
  def oracleSql: Map[String, String] = graft.queries.Queries.oracleSql
}
