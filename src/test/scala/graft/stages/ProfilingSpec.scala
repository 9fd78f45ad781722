package graft.stages

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("exact mode: cardinality + completeness per column (q40 contract)") {
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("a")), (4L, Option("b")))
      .toDF("id", "v")
    val got = Profiling.profileColumns(df, Seq("id", "v"), approx = false)
      .orderBy("col_name")
      .as[(String, Long, Long, Long)].collect()
    assert(got.sameElements(Array(("id", 4L, 4L, 4L), ("v", 2L, 3L, 4L))))
  }

  test("duplicate columns are rejected up front, not as a Catalyst ambiguity") {
    val df = Seq((1L, "a")).toDF("id", "v")
    val ex = intercept[IllegalArgumentException](
      Profiling.profileColumns(df, Seq("v", "v"), approx = false))
    assert(ex.getMessage.contains("duplicate columns"))
  }

  test("empty table profiles as zeros, not nulls (sum-over-zero-rows)") {
    val empty = Seq.empty[(Long, Option[String])].toDF("id", "v")
    val got = Profiling.profileColumns(empty, Seq("id", "v"), approx = false)
      .orderBy("col_name").as[(String, Long, Long, Long)].collect()
    assert(got.sameElements(Array(("id", 0L, 0L, 0L), ("v", 0L, 0L, 0L))))
  }

  test("approx mode: HLL estimate within tolerance, single pass without expand") {
    val df = spark.range(5000).selectExpr("id", "CAST(id % 700 AS STRING) AS v",
      "CASE WHEN id % 10 = 0 THEN NULL ELSE id % 40 END AS w")
    val prof = Profiling.profileColumns(df, Seq("v", "w"))
    // exact distincts: v = 700, w = 40; default HLL rsd = 5%
    val rows = prof.orderBy("col_name").as[(String, Long, Long, Long)].collect()
    val Array((_, dv, nv, rv), (_, dw, nw, rw)) = rows
    assert(math.abs(dv - 700) <= 70, s"v distinct estimate $dv")
    assert(math.abs(dw - 40) <= 8, s"w distinct estimate $dw")
    assert(nv == 5000 && nw == 4500 && rv == 5000 && rw == 5000)
    // the approx plan must NOT multiply rows per column (no Expand node) —
    // that is what makes it the 10^12-row mode
    assert(!prof.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profiling must stay a single non-expanded aggregation")
  }
}
