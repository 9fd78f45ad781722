package graft.tools
import graft.expr.GraftFunctions
import graft.fixtures.Corpus
import graft.model.EngineConfig
import graft.stages._
import org.apache.spark.sql.functions._
object CandProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[12]").config("spark.sql.shuffle.partitions", "12")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val docs = Corpus.generate(spark, n, includeHtml = false).select("id", "text").persist()
    docs.count()
    // interleaved warm-up + timed rep (same discipline as SubstringProbe/
    // WinnowProbe): a single sequential pass would bill the FIRST kernel
    // for the 3-6x JIT warm-up of the shared signature/corpus code paths
    // and could flip the very comparison this probe exists to answer
    for (rep <- 0 to 1; k <- Seq("oph", "perm")) {
      val cfg = EngineConfig.default.copy(minhashKernel = k)
      val sigs = Signatures.withSignatures(docs, cfg).select("id", "minhash", "simhash").persist()
      val t0 = System.nanoTime()
      sigs.count()
      val tSig = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val cand = Blocking.candidatePairs(sigs, cfg).persist()
      val nc = cand.count()
      val tCand = (System.nanoTime() - t1) / 1e9
      if (rep > 0) {
        val lvl = Scoring.score(cand, sigs, cfg).groupBy("level").count()
          .collect().map(r => s"${r.getInt(0)}:${r.getLong(1)}").sorted.mkString(" ")
        println(f"[cand] kernel=$k sig=$tSig%.1fs cand=$nc ($tCand%.1fs) levels: $lvl")
      }
      sigs.unpersist(); cand.unpersist()
    }
    spark.stop()
  }
}
