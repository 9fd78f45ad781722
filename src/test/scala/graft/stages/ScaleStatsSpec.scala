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
}
