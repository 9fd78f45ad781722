package graft.tools

import graft.Pipeline
import graft.fixtures.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: same corpus at two parallelism levels must produce
  * byte-identical cluster assignments (reference determinism invariant,
  * person_1/person.py:752-756; partition-count invariance SURVEY §5). */
object DeterminismProbe {
  def checksum(cores: Int, n: Long): (Long, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Corpus.generate(spark, n, includeHtml = false).select("id", "url", "warc_ts", "text", "lang")
    val res = Pipeline.run(spark, corpus)
    val row = res.assignments
      .agg(count(lit(1)),
        coalesce(sum(shiftrightunsigned(xxhash64(col("id"), col("cluster_id")), 32)), lit(0L)))
      .head()
    val out = (row.getLong(0), row.getLong(1))
    spark.stop()
    out
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000L
    val a = checksum(4, n)
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val b = checksum(8, n)
    println(s"[determinism] local[4]=$a local[8]=$b identical=${a == b}")
    assert(a == b, "assignments differ across parallelism levels")
  }
}
