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
  /** The fast-path bound of the RUN that produced [[maxCcDriverEdges]] —
    * the gauge the probes compare it against. Recorded as a pair with the
    * max (see [[recordCcDriverRun]]), from the run's effective parameter,
    * NOT the object default: pairing the largest limit ever seen with a
    * max observed under a smaller limit (or reporting the constant)
    * overstates headroom — e.g. 0.9M edges collected under a 1M limit
    * must not read as "0.9M under 4M". */
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

  /** One CC driver fast-path run: keep (max edges, limit of that run) as
    * an atomic PAIR so the snapshot never mixes observations across runs
    * with different limits. */
  private[stages] def recordCcDriverRun(edges: Long, limit: Long): Unit = synchronized {
    ccDriverRuns.incrementAndGet()
    if (edges > maxCcDriverEdges.get()) {
      maxCcDriverEdges.set(edges)
      ccFastPathLimitUsed.set(limit)
    }
  }

  def reset(): Unit =
    Seq(maxBigKeysCollected, windowedFallbacks, maxCcDriverEdges,
      maxCcDistributedEdges, ccDriverRuns, ccDistributedRuns,
      ccFastPathLimitUsed).foreach(_.set(0L))

  def snapshot(): Map[String, Long] = {
    // Read the (max edges, limit) pair under the SAME lock the writer
    // holds — a concurrent snapshot between the two writer sets would
    // otherwise pair the new max with the previous run's limit.
    val (ccEdges, ccLimit) = synchronized {
      (maxCcDriverEdges.get(), ccFastPathLimitUsed.get())
    }
    Map(
      "pairgen_max_big_keys_collected" -> maxBigKeysCollected.get(),
      "pairgen_broadcast_key_limit" -> PairGen.BroadcastKeyLimit,
      "pairgen_windowed_fallbacks" -> windowedFallbacks.get(),
      "cc_max_driver_edges" -> ccEdges,
      "cc_max_distributed_edges" -> maxCcDistributedEdges.get(),
      "cc_driver_fast_path_limit" -> ccLimit,
      "cc_driver_runs" -> ccDriverRuns.get(),
      "cc_distributed_runs" -> ccDistributedRuns.get())
  }
}
