package graft.io

import graft.SparkSpec
import graft.model.EngineConfig
import org.apache.spark.sql.functions._

/** S4 CSV sink, S5 parquet sink, S6 config (model JSON) save/load parity. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("S4/S5: csv and parquet sinks round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val df = Seq((1L, "a,with comma", 0.5), (2L, "plain", 1.5)).toDF("id", "s", "v")
    df.write.option("header", "true").csv(s"$dir/csv")
    df.write.parquet(s"$dir/pq")
    val csvBack = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/csv")
    assert(csvBack.count() == 2)
    assert(csvBack.filter(col("s") === "a,with comma").count() == 1)
    val pqBack = spark.read.parquet(s"$dir/pq")
    assert(pqBack.as[(Long, String, Double)].collect().sortBy(_._1)
      .sameElements(df.as[(Long, String, Double)].collect().sortBy(_._1)))
  }

  test("S6: engine config JSON is stable and fingerprints distinguish configs") {
    val a = graft.Pipeline.configJson(EngineConfig.default)
    val b = graft.Pipeline.configJson(EngineConfig.default)
    val c = graft.Pipeline.configJson(EngineConfig.default.copy(bands = 32, rowsPerBand = 4))
    assert(a == b)
    assert(a != c)
    assert(a.contains("\"numPerms\":128") && a.contains("\"extractor\":\"graft-extract-1.0.0\""))
  }
}
