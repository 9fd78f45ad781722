package graft.model

import java.sql.Timestamp

/** Core data model of the dedup engine.
  *
  * Shapes derive from BASELINE.json `input_hint` (url, warc_ts, html, text,
  * lang) and the reference pipeline's intermediate tables — see SURVEY.md
  * §1.2/§1.3 and reference `person_1/link_model_per.py:1288-1333` (DDLs).
  * Implementation is Spark-first: typed Datasets over these case classes.
  */

/** One web page row — the engine's primary input table
  * (Iceberg-style table of Common-Crawl-style pages). */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Page with the engine's stable numeric id (assigned once at ingest,
  * = xxhash64-style hash of url unless provided). cluster_id = min(id)
  * invariant (SURVEY §1.4.3) requires a total order on ids. */
final case class DocRow(
    id: Long,
    url: String,
    warc_ts: Timestamp,
    text: String,
    lang: String)

/** Per-document signature: 128-perm MinHash + 64-bit SimHash.
  * nShingles==0 marks unlinkable docs (too short — reference analog:
  * unlinkable records, person_1/link_model_per.py:754-762). */
final case class DocSig(
    id: Long,
    minhash: Array[Long],
    simhash: Long,
    nShingles: Int)

/** Candidate pair produced by LSH blocking (J3 analog). Canonical form
  * idL < idR; matchKey = first band index that produced the pair
  * (provenance, ≙ Splink match_key, person_1/link_model_per.py:489). */
final case class CandidatePair(idL: Long, idR: Long, matchKey: Int)

/** Scored pair (edge) — similarity analog of Splink match_weight. */
final case class ScoredPair(
    idL: Long,
    idR: Long,
    jaccardEst: Double,
    hammingDist: Int,
    level: Int,
    reason: String)

final case class Edge(src: Long, dst: Long)

final case class ClusterAssignment(id: Long, clusterId: Long)

/** Engine configuration — the analog of the reference's Splink model JSON
  * (person_1/link_model_per.py:745-752): everything that must be pinned for
  * determinism and for oracle parity lives here.
  *
  * Default banding: 128 perms = 16 bands x 8 rows; candidate threshold
  * s ≈ (1/b)^(1/r) = 0.707 (SURVEY §4 "Blocking").
  */
final case class EngineConfig(
    shingleK: Int = 3,            // tokens per shingle
    numPerms: Int = 128,
    // MinHash kernel: "oph" = one-permutation hashing with optimal
    // densification (one hash per shingle — ~numPerms× less hashing per
    // doc, same estimator family; Li et al. NIPS'12, Shrivastava ICML'17),
    // "perm" = the classic numPerms-universal-hash kernel. Both produce
    // numPerms-slot signatures with P[slot agreement] ≈ Jaccard, so
    // banding/scoring are kernel-agnostic; signatures differ bit-for-bit,
    // so the choice participates in the snapshot config fingerprint.
    minhashKernel: String = "oph",
    bands: Int = 16,
    rowsPerBand: Int = 8,
    simhashBits: Int = 64,
    seed: Long = 42L,
    // ordered-level thresholds (≙ gamma levels, SURVEY §2.11): first
    // match wins. exact-hash > jaccard > simhash-hamming > substring.
    jaccardThreshold: Double = 0.7,
    hammingThreshold: Int = 3,
    // staged-predicate exact check: MinHash estimate gates exact Jaccard
    exactVerify: Boolean = true,
    // substring (winnowing) pass
    winnowK: Int = 25,            // chars per fingerprint gram
    winnowWindow: Int = 32,       // fp density ≈ 2/(w+1) per char
    substringMinFps: Int = 6,     // shared fingerprints to emit an edge
    substringMinRatio: Double = 0.5, // shared / min(nFps) containment ratio
    // a fingerprint shared by more docs than this is boilerplate, not
    // containment evidence (document-frequency pruning ≙ TF adjustment A1)
    substringDfCap: Int = 50,
    // LSH buckets up to this size are paired all-pairs (exact J3
    // semantics); larger ones get O(n) sorted-chain pairing (skew control,
    // SURVEY §4 "Skew detection") — nothing is dropped
    allPairsCap: Int = 64,
    maxCcIterations: Int = 50,
    // cut CC lineage with reliable checkpoint() (needs a checkpoint dir:
    // HDFS/S3 in production) instead of executor-local blocks — survives
    // executor loss at real cluster scale; identical assignments either way
    reliableCheckpoints: Boolean = false,
    // adaptive CC plan choice: edge sets ≤ this run driver union-find
    // (the distributed loop is 4-6 rounds of pure serial scheduling time
    // on a graph this small); larger sets run large-star/small-star.
    // 0 forces the distributed path. Identical output (spec-pinned).
    // Must equal ConnectedComponents.DriverFastPathMaxEdges (the direct-
    // caller default) — EngineConfigSpec pins the two together.
    ccFastPathMaxEdges: Long = graft.stages.ConnectedComponents.DriverFastPathMaxEdges,
    // df-weighted exact similarity (≙ reference term_frequency_adjustments,
    // person_1/link_model_per.py:614-651): weight each shingle by
    // log(nDocs/df) so boilerplate overlap scores below content overlap
    tfWeighting: Boolean = false,
    // exact-dup pre-pass plan: true = 128-bit content-hash groupBy
    // (24 B/row shuffle — the scale path; ExactDedup.splitByHash), false =
    // full-text window (shuffles the whole corpus text; kept as the
    // hash-free reference plan). Identical output either way (spec-pinned).
    exactDedupByHash: Boolean = true) {
  require(bands * rowsPerBand == numPerms, "bands*rowsPerBand must equal numPerms")
  require(minhashKernel == "oph" || minhashKernel == "perm",
    s"unknown minhashKernel '$minhashKernel' (expected 'oph' or 'perm')")
}

object EngineConfig {
  val default: EngineConfig = EngineConfig()

  /** Banding auto-tuner: pick (bands, rowsPerBand) for a target Jaccard
    * threshold — the engine-side analog of Splink's threshold-centric
    * model config (the reference picks `match_probability >= 0.95` and
    * lets the model place the boundary; here the LSH S-curve IS the
    * model). For each divisor pair b·r = numPerms the candidate-capture
    * S-curve crosses 1/2 at s* ≈ (1/b)^(1/r); choose the pair whose s* is
    * CLOSEST to `threshold` (ties break toward the lower s* — recall
    * side; the divisor grid is sparse, so "at-or-below" would jump from
    * 0.707 to 0.42 for a 0.7 target and over-generate candidates ~10×).
    * The exact-Jaccard verify stage cleans false positives downstream
    * either way.
    *
    * forThreshold(0.7) on 128 perms returns the default 16×8 banding
    * (s* = 2^-0.5 ≈ 0.707). */
  def forThreshold(threshold: Double, base: EngineConfig = default): EngineConfig = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    val sStar = (1 to base.numPerms)
      .filter(base.numPerms % _ == 0)
      .map(b => ((b, base.numPerms / b), math.pow(1.0 / b, 1.0 / (base.numPerms / b))))
    val ((b, r), _) = sStar.minBy { case (_, s) =>
      (math.abs(s - threshold), s) // closest; tie → lower s* (recall side)
    }
    base.copy(bands = b, rowsPerBand = r, jaccardThreshold = threshold)
  }
}
