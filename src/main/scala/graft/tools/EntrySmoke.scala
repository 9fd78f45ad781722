package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only: exercise the driver's entry() contract. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(f"[entry] rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    df.show(5, false)
    assert(n > 0)
    spark.stop()
  }
}
