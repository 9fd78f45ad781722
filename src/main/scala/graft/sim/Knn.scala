package graft.sim

import graft.expr.{GraftFunctions, Hashing}
import graft.model.EngineConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbour search over an embedding column
  * (`array<float>`): brute-force cosine as the correctness baseline
  * (oracle-checked, see Queries q25) and a random-hyperplane-LSH bucketed
  * variant as the scale path — at 10^12 vectors the cross join is
  * impossible; bucketing bounds each comparison set.
  */
object Knn {

  /** Signed random hyperplanes → bucket id. Deterministic from cfg.seed. */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    Array.tabulate(bits) { b =>
      Array.tabulate(dim) { i =>
        // deterministic pseudo-gaussian via sum of 4 uniforms
        val u = (0 until 4).map(j =>
          (Hashing.mix64(seed ^ (b * 1309L + i * 7919L + j * 104729L)) >>> 11).toDouble / (1L << 53).toDouble)
        u.sum - 2.0
      }
    }
  }

  /** LSH-bucketed top-1 neighbour: bucket by hyperplane sign bits, compare
    * only within buckets. Vectors whose bucket is a singleton get nn_id -1
    * (honest "not found" — a production caller would multi-probe). */
  def lshTop1(spark: SparkSession, embeddings: DataFrame, cfg: EngineConfig,
              bits: Int = 8): DataFrame = {
    GraftFunctions.register(spark)
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    val planes = hyperplanes(dim, bits, cfg.seed)
    val planesB = spark.sparkContext.broadcast(planes)
    val bucketUdf = udf((v: Seq[Float]) => {
      val ps = planesB.value
      var b = 0
      var i = 0
      while (i < ps.length) {
        var dot = 0.0
        var j = 0
        while (j < v.length) { dot += ps(i)(j) * v(j); j += 1 }
        if (dot >= 0) b |= (1 << i)
        i += 1
      }
      b
    })
    val bucketed = embeddings
      .select(col("vec_id"), col("embedding"), bucketUdf(col("embedding")).as("bucket"))
    val a = bucketed.select(col("bucket"), col("vec_id"), col("embedding"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("nid"), col("embedding").as("emb_b"))
    val within = a.join(b, Seq("bucket")).filter(col("vec_id") =!= col("nid"))
      .withColumn("cos", GraftFunctions.cosineSim(col("embedding"), col("emb_b")))
      .groupBy("vec_id").agg(max_by(col("nid"), col("cos")).as("nn_id"))
    bucketed.select("vec_id")
      .join(within, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("nn_id"), lit(-1L)).as("nn_id"))
  }

  /** Brute-force cosine top-k (baseline; O(n^2) — test scale only). */
  def bruteTopK(spark: SparkSession, embeddings: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val a = embeddings.select(col("vec_id"), col("embedding"))
    val b = embeddings.select(col("vec_id").as("nid"), col("embedding").as("emb_b"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nid").asc)
    a.join(b, col("vec_id") =!= col("nid"))
      .withColumn("cos", GraftFunctions.cosineSim(col("embedding"), col("emb_b")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "nid", "cos")
  }
}
