package graft.stages

import graft.SparkSpec
import graft.model.EngineConfig
import org.apache.spark.sql.functions._

/** df-weighted similarity gates (A1 full analog of the reference's
  * `term_frequency_adjustments=True`, person_1/link_model_per.py:614-651):
  * shared boilerplate must score below shared content at equal raw Jaccard. */
class TfWeightingSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = EngineConfig.default

  private def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i")

  test("boilerplate-heavy overlap scores below content overlap at equal raw Jaccard") {
    val S = toks("s", 12) // boilerplate: shared by A, B and 10 filler docs
    val T = toks("t", 12) // content: shared ONLY by C and D
    val docA = (S ++ toks("a", 12)).mkString(" ")
    val docB = (S ++ toks("b", 12)).mkString(" ")
    val docC = (T ++ toks("c", 12)).mkString(" ")
    val docD = (T ++ toks("d", 12)).mkString(" ")
    val fillers = (1 to 10).map(i => (100L + i, (S ++ toks(s"f$i", 12)).mkString(" ")))
    val docs = (Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD)) ++ fillers)
      .toDF("id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_l", "id_r")

    // raw Jaccard is identical by construction (symmetric shapes)
    val rawAB = graft.expr.Hashing.exactJaccard(
      graft.expr.Hashing.shingleHashes(docA, cfg.shingleK),
      graft.expr.Hashing.shingleHashes(docB, cfg.shingleK))
    val rawCD = graft.expr.Hashing.exactJaccard(
      graft.expr.Hashing.shingleHashes(docC, cfg.shingleK),
      graft.expr.Hashing.shingleHashes(docD, cfg.shingleK))
    assert(math.abs(rawAB - rawCD) < 1e-12)

    val tf = Scoring.tfWeightedScores(pairs, docs, cfg)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val ab = tf((1L, 2L)); val cd = tf((3L, 4L))
    assert(ab < cd, s"boilerplate pair $ab must score below content pair $cd")
    assert(ab < rawAB, s"df weighting must discount boilerplate ($ab vs raw $rawAB)")
    // content pair stays near its raw Jaccard (idf re-weights, same order)
    assert(cd > rawCD * 0.5 && cd <= 1.0)
  }

  test("exactVerify with tfWeighting demotes a boilerplate pair that raw Jaccard keeps") {
    val S = toks("s", 80)
    val docA = (S ++ toks("a", 10)).mkString(" ")
    val docB = (S ++ toks("b", 10)).mkString(" ")
    val fillers = (1 to 10).map(i => (100L + i, (S ++ toks(s"f$i", 10)).mkString(" ")))
    val docs = (Seq((1L, docA), (2L, docB)) ++ fillers).toDF("id", "text")
    // simulate a level-2 candidate whose SimHash also disagrees (hamming big)
    val scored = Seq((1L, 2L, 0, 0.8, 30, 2, "minhash-band=0"))
      .toDF("id_l", "id_r", "match_key", "jaccard_est", "hamming", "level", "reason")

    val raw = Scoring.exactVerify(scored, docs, cfg).collect().head
    assert(raw.getAs[Int]("level") === 2,
      s"raw gate keeps the boilerplate pair (exact=${raw.getAs[Double]("jaccard_exact")})")

    val weighted = Scoring.exactVerify(scored, docs, cfg.copy(tfWeighting = true)).collect().head
    assert(weighted.getAs[Int]("level") === 0,
      s"df-weighted gate must demote it (tf=${weighted.getAs[Double]("jaccard_tf")})")
  }
}
