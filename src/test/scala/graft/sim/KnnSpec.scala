package graft.sim

import graft.SparkSpec
import graft.expr.Hashing
import graft.model.EngineConfig
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic clustered embeddings: 10 well-separated centers, 40 points
    * each with small deterministic jitter — ANN must find same-center
    * neighbours. */
  private lazy val clustered = {
    val rnd = new java.util.SplittableRandom(23)
    val centers = Array.fill(10, 16)(rnd.nextDouble() * 2 - 1)
    (0L until 400L).map { i =>
      val c = (i % 10).toInt
      val v = centers(c).map(x => (x + (Hashing.mix64(i * 31 + x.hashCode) % 1000) / 50000.0).toFloat)
      (i, v, c)
    }.toDF("vec_id", "embedding", "label").persist()
  }

  test("brute-force topK: neighbours are same-cluster, ranks are dense") {
    val top3 = Knn.bruteTopK(spark, clustered.select("vec_id", "embedding"), 3)
    val joined = top3
      .join(clustered.select(col("vec_id"), col("label").as("l_q")), "vec_id")
      .join(clustered.select(col("vec_id").as("nid"), col("label").as("l_n")), "nid")
    val (same, total) = joined
      .agg(sum((col("l_q") === col("l_n")).cast("long")), count(lit(1)))
      .as[(Long, Long)].head()
    assert(total == 1200)
    assert(same == total, s"brute top-3 must stay within the tight clusters ($same/$total)")
  }

  test("IVF top-1 recall vs brute-force >= 0.9 on clustered data") {
    val emb = clustered.select("vec_id", "embedding")
    val brute = Knn.bruteTopK(spark, emb, 1)
      .select(col("vec_id"), col("nid").as("nn_brute"))
    val ivf = Knn.ivfTop1(spark, emb, k = 16, nProbe = 3)
    val joined = brute.join(ivf, "vec_id")
      .join(clustered.select(col("vec_id").as("nn_brute"), col("label").as("l_b")), "nn_brute")
      .join(clustered.select(col("vec_id").as("nn_id"), col("label").as("l_i")), "nn_id")
    // cluster-level recall: IVF neighbour lands in the same cluster as the
    // true nearest neighbour (exact-id can differ within a tight cluster)
    val (hit, total) = joined
      .agg(sum((col("l_b") === col("l_i")).cast("long")), count(lit(1)))
      .as[(Long, Long)].head()
    assert(hit.toDouble / total >= 0.9, s"IVF cluster recall ${hit.toDouble / total}")
  }

  test("LSH top-1 hot-bucket chain path keeps cluster recall with bounded pairs") {
    val emb = clustered.select("vec_id", "embedding")
    // cap of 8 forces EVERY 40-member center bucket onto the chain path
    val capped = Knn.lshTop1(spark, emb, EngineConfig.default, bucketCap = 8, chainWidth = 4)
    assert(capped.count() == 400)
    val joined = capped.filter(col("nn_id") >= 0)
      .join(clustered.select(col("vec_id"), col("label").as("l_q")), "vec_id")
      .join(clustered.select(col("vec_id").as("nn_id"), col("label").as("l_n")), "nn_id")
    val (same, total) = joined
      .agg(sum((col("l_q") === col("l_n")).cast("long")), count(lit(1)))
      .as[(Long, Long)].head()
    assert(total >= 390, s"capped path must still answer (answered $total)")
    assert(same.toDouble / total >= 0.95,
      s"chain ordering by secondary projection must keep cluster recall (${same.toDouble / total})")
  }

  test("LSH top-1 is deterministic and covers every vector") {
    val emb = clustered.select("vec_id", "embedding")
    val a = Knn.lshTop1(spark, emb, EngineConfig.default).orderBy("vec_id")
      .as[(Long, Long)].collect()
    val b = Knn.lshTop1(spark, emb, EngineConfig.default).orderBy("vec_id")
      .as[(Long, Long)].collect()
    assert(a.sameElements(b))
    assert(a.length == 400)
  }
}
