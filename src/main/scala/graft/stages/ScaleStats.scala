package graft.stages

import java.util.concurrent.atomic.AtomicLong

/** Driver-side telemetry for the engine's bounded-collect safety valves.
  *
  * Several stages argue a driver-memory bound rather than observing one:
  * PairGen collects hot-bucket KEYS (≤ rows/cap of them, broadcast-limited
  * at [[PairGen.BroadcastKeyLimit]], falling back to the windowed plan
  * past it) and connected components collects EDGES below the fast-path
  * threshold. These counters record what those bounds actually see at
  * run time so a scale probe can report observed headroom instead of an
  * argument (VERDICT r3 item 2). Updated only on the driver (each record
  * site runs once per invocation, after an action), so plain atomics are
  * enough; values are maxima across invocations since [[reset]].
  */
object ScaleStats {
  /** Largest hot-key set PairGen collected to the driver (bound:
    * [[PairGen.BroadcastKeyLimit]]). */
  val maxBigKeysCollected = new AtomicLong(0L)
  /** Times the hot-key set exceeded the broadcast limit and PairGen fell
    * back to the windowed (full-sort, driver-safe) plan. */
  val windowedFallbacks = new AtomicLong(0L)
  /** Largest edge set CC resolved via the driver union-find fast path. */
  val maxCcDriverEdges = new AtomicLong(0L)
  /** Largest fast-path bound actually honored by a CC run — the gauge the
    * probes compare maxCcDriverEdges against. Recorded from the run's
    * effective parameter, NOT the object default: EngineConfig carries its
    * own default, and reporting the constant here once misstated the limit
    * a 10M-doc probe ran under (2.48M edges "under" a reported 2M). */
  val ccFastPathLimitUsed = new AtomicLong(0L)
  /** Largest edge count CC resolved via the distributed star loop. */
  val maxCcDistributedEdges = new AtomicLong(0L)
  /** Invocation counts per CC path. */
  val ccDriverRuns = new AtomicLong(0L)
  val ccDistributedRuns = new AtomicLong(0L)

  private[stages] def recordMax(a: AtomicLong, v: Long): Unit = {
    var cur = a.get()
    while (v > cur && !a.compareAndSet(cur, v)) cur = a.get()
  }

  def reset(): Unit =
    Seq(maxBigKeysCollected, windowedFallbacks, maxCcDriverEdges,
      maxCcDistributedEdges, ccDriverRuns, ccDistributedRuns,
      ccFastPathLimitUsed).foreach(_.set(0L))

  def snapshot(): Map[String, Long] = Map(
    "pairgen_max_big_keys_collected" -> maxBigKeysCollected.get(),
    "pairgen_broadcast_key_limit" -> PairGen.BroadcastKeyLimit,
    "pairgen_windowed_fallbacks" -> windowedFallbacks.get(),
    "cc_max_driver_edges" -> maxCcDriverEdges.get(),
    "cc_max_distributed_edges" -> maxCcDistributedEdges.get(),
    "cc_driver_fast_path_limit" -> ccFastPathLimitUsed.get(),
    "cc_driver_runs" -> ccDriverRuns.get(),
    "cc_distributed_runs" -> ccDistributedRuns.get())
}
