package graft.stages

import graft.SparkSpec
import graft.model.EngineConfig
import org.apache.spark.sql.functions._

class StagesSpec extends SparkSpec {
  import spark.implicits._

  test("ExactDedup: survivors keep rn=1, holdouts carry master = min id") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "other"), (5L, "third")).toDF("id", "text")
    val (surv, hold) = ExactDedup.split(docs)
    assert(surv.select("id").as[Long].collect().sorted.sameElements(Array(1L, 4L, 5L)))
    val h = hold.as[(Long, Long)].collect().sortBy(_._1)
    assert(h.sameElements(Array((2L, 1L), (3L, 1L))))
  }

  test("ExactDedup.reattach: holdouts inherit the master's cluster; orphans root at master") {
    // masters 1 and 4 clustered together (cluster 1); holdout 2 -> master 1
    // inherits cluster 1 TRANSITIVELY; holdout 9 -> master 8 which never
    // reached assignment (defensive path): roots at its master id, and two
    // orphans of one absent master land in the SAME cluster
    val assign = Seq((1L, 1L), (4L, 1L), (5L, 5L)).toDF("id", "cluster_id")
    val hold = Seq((2L, 1L), (9L, 8L), (10L, 8L)).toDF("id", "master_id")
    val out = ExactDedup.reattach(assign, hold)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.sameElements(Array(
      (1L, 1L), (2L, 1L), (4L, 1L), (5L, 5L), (9L, 8L), (10L, 8L))), out.mkString(","))
  }

  test("ExactDedup: splitByHash (24 B/row scale plan) matches the window plan exactly") {
    // includes the null/empty corner: null-text docs must dedup together
    // (window semantics) yet stay distinct from empty-string text
    val docs = ((1L to 400L).map(i => (i, s"text ${i % 37}")) ++
      Seq((1001L, "unique a"), (1002L, "unique b"),
        (1003L, null.asInstanceOf[String]), (1004L, null.asInstanceOf[String]),
        (1005L, ""), (1006L, ""))).toDF("id", "text")
    val (sw, hw) = ExactDedup.split(docs)
    val (sh, hh) = ExactDedup.splitByHash(docs)
    assert(sh.select("id").as[Long].collect().sorted
      .sameElements(sw.select("id").as[Long].collect().sorted))
    assert(hh.as[(Long, Long)].collect().sortBy(_._1)
      .sameElements(hw.as[(Long, Long)].collect().sortBy(_._1)))
    // the scale plan must not move text through an exchange: no window, and
    // text appears in no shuffle key (only the narrow hash projection)
    val plan = ExactDedup.splitByHash(docs)._2.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"hash plan must not window:\n$plan")
  }

  test("persistTracked never adopts a caller's cache: engine clear leaves it live") {
    import org.apache.spark.storage.StorageLevel
    val df = Seq(1, 2, 3).toDF("x").persist()
    try {
      df.count()
      IntermediateCaches.persistTracked(df) // no-op: plan already cached
      graft.Pipeline.clearIntermediateCaches(spark)
      assert(df.storageLevel != StorageLevel.NONE,
        "engine clear evicted the CALLER's cache")
    } finally df.unpersist()
  }

  test("minhash_sig: unknown kernel fails at analysis, not as silent perm signatures") {
    // a typo'd kernel silently computing perm signatures would disagree
    // bit-for-bit with every oph-signed table — recall collapse, no error
    graft.expr.GraftFunctions.register(spark)
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + " | " + chain(t.getCause)
    val ex = intercept[Throwable](
      spark.sql("SELECT minhash_sig('abc def ghi', 3, 16, 42, 'ohp')").collect())
    assert(chain(ex).contains("unknown minhash kernel"), chain(ex))
  }

  test("collect_capped: complete+sorted under cap, exactly cap when truncated") {
    graft.expr.GraftFunctions.register(spark)
    val rows = ((1L to 100L).map(i => (1L, i)) ++ Seq((2L, 7L), (2L, 3L), (2L, 5L)))
      .toDF("key", "id").repartition(8)
    val got = rows.groupBy("key")
      .agg(graft.expr.GraftFunctions.collectCapped(col("id"), 11).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(2L) == Seq(3L, 5L, 7L)) // complete and sorted
    assert(got(1L).length == 11)        // truncated at cap = big-key flag
    assert(got(1L).toSet.subsetOf((1L to 100L).toSet))
  }

  test("collect_capped: identical results on the sort-based fallback path") {
    // ObjectHashAggregate falls back to sort-based merging beyond
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold in-memory
    // keys — the plan every big corpus runs. Force it at threshold=2 and
    // pin equality with the hash path (exercises serialize/deserialize).
    graft.expr.GraftFunctions.register(spark)
    val rows = (1L to 2000L).map(i => (i % 97, i)).toDF("key", "id").repartition(8)
    def agg() = rows.groupBy("key")
      .agg(graft.expr.GraftFunctions.collectCapped(col("id"), 64).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val hashPath = agg()
    val prev = spark.conf.getOption("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    try {
      val sortPath = agg()
      assert(sortPath == hashPath)
      assert(sortPath(0L).length == 20 && sortPath(0L) == sortPath(0L).sorted)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
      case None => spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }
  }

  test("PairGen: chain band when dropHotAbove > allPairsCap (exact counts via sliver job)") {
    // key A: 10 members (all-pairs), key B: 30 (chain band: > cap 16,
    // <= dropHot 50), key C: 60 (dropped: > 50)
    val rows = (1L to 10L).map(i => (1L, i, i)) ++
      (1L to 30L).map(i => (2L, 100L + i, i)) ++
      (1L to 60L).map(i => (3L, 1000L + i, i))
    val pairs = PairGen.pairs(rows.toDF("key", "id", "sort"), allPairsCap = 16,
      dropHotAbove = Some(50)).as[(Long, Long, Long)].collect()
    assert(pairs.count(_._3 == 1L) == 45) // C(10,2)
    assert(pairs.count(_._3 == 2L) == 29) // chain n-1
    assert(!pairs.exists(_._3 == 3L))     // df-pruned
    // windowed fallback agrees on the same input
    val win = PairGen.pairsWindowed(rows.toDF("key", "id", "sort"), 16, Some(50))
      .as[(Long, Long, Long)].collect().toSet
    assert(win == pairs.toSet)
  }

  test("PairGen: all pairs for small buckets, chain for hot, none for singles") {
    val small = (1L to 5L).map(i => (100L, i, i)) // one bucket of 5
    val single = Seq((200L, 9L, 9L))
    val hot = (1L to 80L).map(i => (300L, 1000L + i, i)) // > cap(64)
    val buckets = (small ++ single ++ hot).toDF("key", "id", "sort")
    val pairs = PairGen.pairs(buckets).as[(Long, Long, Long)].collect()
    val smallPairs = pairs.filter(_._3 == 100L)
    assert(smallPairs.length == 10) // C(5,2)
    assert(smallPairs.forall(p => p._1 < p._2))
    val hotPairs = pairs.filter(_._3 == 300L)
    assert(hotPairs.length == 79) // chain n-1
    assert(!pairs.exists(_._3 == 200L))
  }

  test("PairGen: mega-bucket chains via range partitioning across tasks, no per-key window") {
    // one hot key with 5,000 members, scrambled sort order — must spread
    // over multiple range partitions and still emit EXACTLY the global
    // consecutive chain (boundary stitching included)
    val rows = (1L to 5000L).map(i => (42L, i, graft.expr.Hashing.mix64(i)))
    val buckets = rows.toDF("key", "id", "sort").repartition(8)
    val got = PairGen.pairs(buckets).as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2)).toSet
    val ordered = rows.sortBy(r => (r._3, r._2)).map(_._2)
    val want = ordered.zip(ordered.tail)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(got == want, s"chain mismatch: missing ${(want -- got).take(5)}, extra ${(got -- want).take(5)}")
    // plan shape: range exchange present; the only Window allowed is the
    // boundary stitch (ordered by pid/kind over ≤ 2 rows per key ×
    // partition) — a window touching the data's `sort` column would be the
    // full-bucket single-task hazard this path exists to avoid
    val plan = PairGen.pairs(buckets).queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected range exchange:\n$plan")
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windowLines.forall(l => l.contains("pid#") && !l.contains("sort#")),
      s"hot path may window only the boundary table:\n$plan")
  }

  test("PairGen: rankedWidthPairs equals the per-key width-k window pair set") {
    val width = 3
    val rows = ((1L to 500L).map(i => (5L, i, graft.expr.Hashing.mix64(i * 13))) ++
      (1L to 40L).map(i => (9L, 1000L + i, graft.expr.Hashing.mix64(i))))
    val got = PairGen.rankedWidthPairs(rows.toDF("key", "id", "sort").repartition(8), width)
      .as[(Long, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (k, members) =>
      val ordered = members.sortBy(r => (r._3, r._2)).map(_._2)
      ordered.indices.flatMap { i =>
        ((i + 1) to math.min(i + width, ordered.length - 1)).map { j =>
          (math.min(ordered(i), ordered(j)), math.max(ordered(i), ordered(j)), k)
        }
      }
    }.toSet
    assert(got == want,
      s"missing ${(want -- got).take(5)}, extra ${(got -- want).take(5)}")
  }

  test("PairGen streamed pass: many adjacent groups per partition, mixed sizes") {
    // exercises the emit-while-buffering-next-group path of streamedTagged:
    // hundreds of groups land in each shuffle partition, sizes 1..6 plus a
    // dropped big group, so group closes interleave densely with emission
    val rnd = new java.util.SplittableRandom(5)
    val rows = (1L to 400L).flatMap { k =>
      val m = 1 + rnd.nextInt(6)
      (1 to m).map(i => (k, k * 1000 + i, 0L))
    } ++ (1L to 80L).map(i => (9999L, 100000L + i, 0L)) // big → dropped
    val got = PairGen.pairs(rows.toDF("key", "id", "sort"), allPairsCap = 64,
        dropHotAbove = Some(50))
      .as[(Long, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).filter { case (_, ms) => ms.size >= 2 && ms.size <= 50 }
      .flatMap { case (k, ms) =>
        val ids = ms.map(_._2).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j), k)
      }.toSet
    assert(got == want,
      s"missing ${(want -- got).take(5)}, extra ${(got -- want).take(5)} (|got|=${got.size}, |want|=${want.size})")
  }

  test("PairGen: windowed fallback produces the identical pair set") {
    val buckets = ((1L to 5L).map(i => (100L, i, i)) ++
      (1L to 80L).map(i => (300L, 1000L + i, i)) ++ Seq((200L, 9L, 9L)))
      .toDF("key", "id", "sort")
    val main = PairGen.pairs(buckets).as[(Long, Long, Long)].collect().toSet
    val fallback = PairGen.pairsWindowed(buckets, PairGen.AllPairsCap, None)
      .as[(Long, Long, Long)].collect().toSet
    assert(main == fallback)
  }

  test("PairGen: dropHotAbove excludes boilerplate buckets entirely") {
    val buckets = ((1L to 80L).map(i => (1L, i, i)) ++ Seq((2L, 1L, 1L), (2L, 2L, 2L)))
      .toDF("key", "id", "sort")
    val pairs = PairGen.pairs(buckets, 64, dropHotAbove = Some(50))
      .as[(Long, Long, Long)].collect()
    assert(pairs.forall(_._3 == 2L))
    assert(pairs.length == 1)
  }

  test("PairGen: main and windowed plans agree when dropHotAbove < allPairsCap") {
    // the df band (dropHotAbove, allPairsCap] must be DROPPED by both plans:
    // a fingerprint with df 51-64 is boilerplate under the df cap even
    // though it would fit the all-pairs cap
    val buckets = ((1L to 55L).map(i => (10L, i, i)) ++   // in the band → drop
      (1L to 80L).map(i => (20L, 100L + i, i)) ++          // above both → drop
      (1L to 5L).map(i => (30L, 200L + i, i)))             // small → all-pairs
      .toDF("key", "id", "sort")
    val main = PairGen.pairs(buckets, 64, dropHotAbove = Some(50))
      .as[(Long, Long, Long)].collect().toSet
    val windowed = PairGen.pairsWindowed(buckets, 64, dropHotAbove = Some(50))
      .as[(Long, Long, Long)].collect().toSet
    assert(main == windowed, s"plan divergence: ${main.diff(windowed)} vs ${windowed.diff(main)}")
    assert(main.forall(_._3 == 30L) && main.size == 10)

    // and with dropHotAbove > allPairsCap: (allPairsCap, cap] chains, > cap drops
    val buckets2 = ((1L to 70L).map(i => (40L, i, i)) ++   // chain (64 < 70 ≤ 100)
      (1L to 120L).map(i => (50L, 300L + i, i)))           // drop (> 100)
      .toDF("key", "id", "sort")
    val main2 = PairGen.pairs(buckets2, 64, dropHotAbove = Some(100))
      .as[(Long, Long, Long)].collect().toSet
    val windowed2 = PairGen.pairsWindowed(buckets2, 64, dropHotAbove = Some(100))
      .as[(Long, Long, Long)].collect().toSet
    assert(main2 == windowed2)
    assert(main2.forall(_._3 == 40L) && main2.size == 69)
  }

  test("withSignatures: n_shingles is the document's real shingle count") {
    val cfg = EngineConfig.default
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "tiny")).toDF("id", "text")
    val got = Signatures.withSignatures(docs, cfg)
      .select("id", "n_shingles").as[(Long, Int)].collect().toMap
    // Model.DocSig contract: the field is the COUNT (docSignature parity),
    // not the permutation constant; 0 still marks unlinkable docs
    val real = docs.filter(col("id") === 1L)
      .select(size(graft.expr.GraftFunctions.shingleHashes(col("text"), cfg.shingleK)))
      .as[Int].head()
    assert(real > 0 && real != cfg.numPerms)
    assert(got(1L) == real)
    assert(got(2L) == 0)
  }

  test("Blocking: identical docs collide in all bands, candidates dedup across bands") {
    val cfg = EngineConfig.default
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text), (3L, (1 to 200).map(i => s"zz$i").mkString(" ")))
      .toDF("id", "text")
    val sigs = Signatures.withSignatures(docs, cfg).select("id", "minhash", "simhash")
    val cand = Blocking.candidatePairs(sigs, cfg).as[(Long, Long, Int)].collect()
    assert(cand.count(c => c._1 == 1L && c._2 == 2L) == 1) // deduped across 16 bands
    assert(cand.forall(c => !(c._1 == 3L || c._2 == 3L)))
    assert(cand.head._3 == 0) // lowest band index kept as match_key
  }

  test("Scoring: ordered levels, threshold semantics") {
    val cfg = EngineConfig.default
    val t1 = (1 to 100).map(i => s"tok$i").mkString(" ")
    val t2 = (1 to 100).map(i => if (i % 50 == 0) "edited" else s"tok$i").mkString(" ")
    val docs = Seq((1L, t1), (2L, t2)).toDF("id", "text")
    val sigs = Signatures.withSignatures(docs, cfg).select("id", "minhash", "simhash")
    val pairs = Seq((1L, 2L, 0)).toDF("id_l", "id_r", "match_key")
    val scored = Scoring.score(pairs, sigs, cfg).collect().head
    assert(scored.getAs[Int]("level") >= 1)
    val edges = Scoring.edges(Scoring.score(pairs, sigs, cfg)).count()
    assert(edges == 1)
  }

  test("exactVerify demotes level-2 pairs whose exact Jaccard misses the threshold") {
    val cfg = EngineConfig.default
    // two docs sharing exactly half their shingles: exact jaccard ≈ 0.33
    // (< 0.7), but feed a fake level-2 row as if the estimate had passed
    val t1 = (1 to 60).map(i => s"a$i").mkString(" ")
    val t2 = ((1 to 30).map(i => s"a$i") ++ (1 to 30).map(i => s"z$i")).mkString(" ")
    val docs = Seq((1L, t1), (2L, t2)).toDF("id", "text")
    val scored = Seq((1L, 2L, 0, 0.75, 30, 2, "minhash-band=0"))
      .toDF("id_l", "id_r", "match_key", "jaccard_est", "hamming", "level", "reason")
    val v = Scoring.exactVerify(scored, docs, cfg).collect().head
    assert(v.getAs[Int]("level") == 0, s"expected demotion, got $v")
    assert(v.getAs[Double]("jaccard_exact") < cfg.jaccardThreshold)
    // provenance follows the demotion: the stale band reason must not
    // survive on a level-0 row
    assert(v.getAs[String]("reason") == "below-threshold", s"stale reason on $v")
    // and a genuinely identical pair stays level 2 with its band reason
    val docs2 = Seq((1L, t1), (2L, t1)).toDF("id", "text")
    val v2 = Scoring.exactVerify(scored, docs2, cfg).collect().head
    assert(v2.getAs[Int]("level") == 2 && v2.getAs[Double]("jaccard_exact") == 1.0)
    assert(v2.getAs[String]("reason") == "minhash-band=0")
  }

  test("Substring: slice+boilerplate detected; boilerplate-only pair rejected") {
    val cfg = EngineConfig.default.copy(substringDfCap = 3)
    val rnd = new java.util.SplittableRandom(13)
    def words(n: Int, p: String) = (1 to n).map(i => p + rnd.nextInt(100000)).mkString(" ")
    val boiler = words(30, "b")
    val base = words(300, "w")
    val slice = boiler + " " + base.split(" ").slice(50, 250).mkString(" ")
    // 5 docs sharing only boilerplate (df-pruned), plus a true containment
    val docs = (Seq((1L, base), (2L, slice)) ++
      (3L to 7L).map(i => (i, boiler + " " + words(100, s"u$i")))).toDF("id", "text")
    val edges = Substring.edges(docs, cfg).as[(Long, Long, Long)].collect()
    assert(edges.exists(e => e._1 == 1L && e._2 == 2L), s"missing containment edge: ${edges.mkString(",")}")
    assert(edges.forall(e => e._1 == 1L && e._2 == 2L), s"boilerplate false edge: ${edges.mkString(",")}")
  }

  test("clearIntermediateCaches releases engine-tracked blocks, never the caller's") {
    val callerCache = Seq((1L, "caller")).toDF("id", "text").persist()
    callerCache.count()
    val buckets = ((1L to 40L).map(i => (1L, i, i)) ++ Seq((2L, 100L, 1L), (2L, 101L, 2L)))
      .toDF("key", "id", "sort")
    // tracks `grouped` internally (PairGen single-shuffle plan)
    assert(PairGen.pairs(buckets, allPairsCap = 64).count() > 0)
    graft.Pipeline.clearIntermediateCaches(spark)
    assert(callerCache.storageLevel.useMemory, "caller cache must survive the engine clear")
    // idempotent: a second clear with nothing tracked is a no-op
    graft.Pipeline.clearIntermediateCaches(spark)
    callerCache.unpersist()
  }

  test("forThreshold(0.8) banding captures high-Jaccard pairs end-to-end (q38 contract)") {
    // the tuned config (8 bands x 16 rows, S-curve midpoint 0.878): a pair
    // at J ~ 0.94 has per-band collision p = 0.94^16 ~ 0.37, miss
    // (1-p)^8 ~ 2.5% — so >= 28/30 planted twins must surface as
    // candidates, and every candidate at exact J >= 0.8 must score level 2
    // under the retuned jaccardThreshold. Deterministic (seeded kernels).
    val tuned = EngineConfig.forThreshold(0.8)
    assert(tuned.bands == 8 && tuned.rowsPerBand == 16 && tuned.jaccardThreshold == 0.8)
    val docs = (0 until 30).flatMap { p =>
      val toks = (0 until 100).map(i => s"w${p}_$i")
      val twin = toks.updated(50, "CHANGED")
      Seq((p * 2L, toks.mkString(" ")), (p * 2L + 1, twin.mkString(" ")))
    }.toDF("id", "text")
    val sigs = Signatures.withSignatures(docs, tuned).select("id", "minhash", "simhash")
    val cand = Blocking.candidatePairs(sigs, tuned)
    val scored = Scoring.exactVerify(Scoring.score(cand, sigs, tuned), docs, tuned)
    val twinHits = scored.filter(col("id_r") === col("id_l") + 1 && col("id_l") % 2 === 0)
    assert(twinHits.count() >= 28, s"tuned banding captured only ${twinHits.count()}/30 twins")
    // every captured twin verifies at level 2 (exact J ~ 0.94 >= 0.8)
    assert(twinHits.filter(col("level") === 2).count() == twinHits.count())
    // no cross-family false candidates survive exact verify at level 2
    val cross = scored.filter(col("level") >= 1 && !(col("id_r") === col("id_l") + 1))
    assert(cross.count() == 0, s"false positives: ${cross.count()}")
  }
}
