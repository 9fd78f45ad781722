package graft.tools

import graft.stages.ConnectedComponents
import org.apache.spark.sql.SparkSession

/** Dev-only: CC in isolation on a synthetic edge list. */
object CcBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GRAFT_PARTS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = if (args.nonEmpty) args(0).toInt else 2000
    // chains of length 5 + some stars
    val edges = (0 until n).flatMap { i =>
      val base = i.toLong * 10
      (0 until 4).map(j => (base + j, base + j + 1))
    }.toDF("src", "dst")

    val t0 = System.nanoTime()
    val cc = ConnectedComponents.run(spark, edges)
    val k = cc.select("cluster_id").distinct().count()
    println(f"[ccbench] n=$n components=$k wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
