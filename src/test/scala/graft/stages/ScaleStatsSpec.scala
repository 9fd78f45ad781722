package graft.stages

import graft.SparkSpec

class ScaleStatsSpec extends SparkSpec {
  import spark.implicits._

  test("PairGen records the observed hot-key collect against its bound") {
    ScaleStats.reset()
    // one hot key (100 members > cap 4) + one small key
    val buckets = ((1L to 100L).map(i => (7L, i, i)) ++ Seq((9L, 1L, 201L), (9L, 2L, 202L)))
      .toDF("key", "sort", "id")
    PairGen.pairs(buckets, allPairsCap = 4).count()
    assert(ScaleStats.maxBigKeysCollected.get() === 1L)
    assert(ScaleStats.windowedFallbacks.get() === 0L)
    assert(ScaleStats.snapshot()("pairgen_broadcast_key_limit") === PairGen.BroadcastKeyLimit)
  }

  test("CC records edge counts per path: driver fast path vs distributed loop") {
    ScaleStats.reset()
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    ConnectedComponents.run(spark, edges).count() // under fast-path bound
    assert(ScaleStats.ccDriverRuns.get() === 1L)
    assert(ScaleStats.maxCcDriverEdges.get() === 3L)
    assert(ScaleStats.ccDistributedRuns.get() === 0L)

    ConnectedComponents.run(spark, edges, fastPathMaxEdges = 0L).count() // force distributed
    assert(ScaleStats.ccDistributedRuns.get() === 1L)
    assert(ScaleStats.maxCcDistributedEdges.get() === 3L)
    graft.Pipeline.clearIntermediateCaches(spark)
  }

  test("fast-path limit gauge pairs with the run that produced the edge max") {
    ScaleStats.reset()
    val big = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    ConnectedComponents.run(spark, big, fastPathMaxEdges = 10L).count()
    assert(ScaleStats.maxCcDriverEdges.get() === 2L)
    assert(ScaleStats.snapshot()("cc_driver_fast_path_limit") === 10L)
    // a later run under a BIGGER limit with FEWER edges must not re-label
    // the recorded max as having run under the bigger limit
    val small = Seq((5L, 6L)).toDF("src", "dst")
    ConnectedComponents.run(spark, small, fastPathMaxEdges = 4000000L).count()
    assert(ScaleStats.maxCcDriverEdges.get() === 2L)
    assert(ScaleStats.snapshot()("cc_driver_fast_path_limit") === 10L)
    graft.Pipeline.clearIntermediateCaches(spark)
  }
}
