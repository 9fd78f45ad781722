package graft.fixtures

import graft.expr.Hashing.mix64
import graft.extract.TextExtract
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic web corpus with planted duplicate classes —
  * FIXTURES.md F1. Every row is a pure function of its index (splittable
  * per-row RNG via splitmix64 on the index, NOT shared Random state), so
  * generation is distributed (spark.range → map) and byte-stable across
  * runs, partitionings, and parallelism levels.
  *
  * Planted classes (truth kept in `truth_cluster`):
  * - exact: byte-identical text, different url (≙ reference exact-dup
  *   pre-pass, person_1/link_model_per.py:142-149)
  * - near: 1-5 token edits (≙ typo gamma levels)
  * - substring: contiguous ~60% slice + boilerplate (substring pass)
  * - boilerplate skew: shared 30-token header on ~20% of docs — creates hot
  *   LSH buckets (≙ "michael b" skew blocks) but must not merge docs
  * - hard negatives: same structure, different/cross-lang vocab; and short
  *   docs (< k tokens ⇒ unlinkable singletons)
  */
object Corpus {

  final case class CorpusRow(
      id: Long,
      url: String,
      warc_ts: java.sql.Timestamp,
      html: Array[Byte],
      text: String,
      lang: String,
      truth_cluster: Long,
      kind: String)

  val GroupSize = 8
  private val VocabSize = 5000
  private val BaseTs = 1704067200000L // 2024-01-01T00:00:00Z

  /** Deterministic vocab word for (lang, index). */
  private def word(lang: String, i: Int): String = {
    val cons = "bcdfghjklmnprstvz"
    val vow = "aeiou"
    var h = mix64(mix64(lang.hashCode.toLong) ^ i.toLong)
    val syllables = 2 + (Math.floorMod(h, 3)).toInt
    val sb = new StringBuilder
    var s = 0
    while (s < syllables) {
      h = mix64(h)
      sb.append(cons.charAt(Math.floorMod(h, cons.length).toInt))
      h = mix64(h)
      sb.append(vow.charAt(Math.floorMod(h, vow.length).toInt))
      s += 1
    }
    sb.toString
  }

  private def pick(lang: String, h: Long): String =
    word(lang, Math.floorMod(h, VocabSize).toInt)

  private def baseTokens(group: Long, lang: String): Array[String] = {
    val len = 50 + Math.floorMod(mix64(group ^ 0x1111L), 450).toInt
    // decorrelate token streams across groups: seed each position from the
    // group's own mixed key, not from a linear index (a linear index makes
    // nearby groups shifted copies of one token stream)
    val gk = mix64(group ^ 0xA11CE5L)
    Array.tabulate(len)(i => pick(lang, mix64(gk ^ (i * 0x632BE59BD9B4E019L))))
  }

  def rowFor(n: Long): CorpusRow = rowFor(n, includeHtml = true)

  /** @param includeHtml build the html byte column (entity-encode + UTF-8
    *        of the full text — the most expensive part of a row). Only the
    *        extractor byte-identity test reads it; benches and probes pass
    *        false because `.select(...)` column pruning cannot reach
    *        inside this typed map lambda, so they would otherwise pay the
    *        encode per row on every corpus materialization. Text/planting
    *        generation is IDENTICAL either way. */
  def rowFor(n: Long, includeHtml: Boolean): CorpusRow = {
    val group = n / GroupSize
    val p = (n % GroupSize).toInt
    val gh = mix64(group)
    val clusterSize = {
      val r = Math.floorMod(gh, 100).toInt
      if (r < 50) 1 else if (r < 65) 2 else if (r < 75) 3 else if (r < 82) 4
      else if (r < 88) 5 else if (r < 92) 6 else if (r < 96) 7 else 8
    }
    val lang = {
      val r = Math.floorMod(mix64(group ^ 0x7777L), 100).toInt
      if (r < 90) "en" else if (r < 95) "de" else "fr"
    }
    val baseId = group * GroupSize
    val inCluster = p > 0 && p < clusterSize
    val kindRoll = Math.floorMod(mix64(group * 131 + p), 100).toInt

    val (text, truth, kind) =
      if (p == 0) {
        var t = baseTokens(group, lang).mkString(" ")
        if (Math.floorMod(mix64(group ^ 0xBEEFL), 5) == 0L) t = boilerplate + " " + t
        (t, baseId, "base")
      } else if (!inCluster) {
        // independent singleton or planted hard negative
        if (kindRoll < 15) {
          // short unlinkable doc (< shingleK tokens); unique suffix so two
          // short docs are never byte-identical (identical text would be a
          // legitimate exact dup, not a planted negative)
          val t = pick(lang, mix64(n ^ 0x51L)) + " q" + n
          (t, n, "short")
        } else if (kindRoll < 30) {
          // cross-lang negative: same shape, other-language vocab, own seed
          val other = if (lang == "en") "de" else "en"
          val nk = mix64(n ^ 0x417AL)
          val toks = Array.tabulate(
            50 + Math.floorMod(mix64(n ^ 0x5EEDL), 450).toInt)(
            i => pick(other, mix64(nk ^ (i * 0x632BE59BD9B4E019L))))
          (toks.mkString(" "), n, "xlang-negative")
        } else {
          val nk = mix64(n ^ 0x5EED5EEDL)
          val toks = Array.tabulate(
            50 + Math.floorMod(mix64(n ^ 0x5EEDL), 450).toInt)(
            i => pick(lang, mix64(nk ^ (i * 0x632BE59BD9B4E019L))))
          var t = toks.mkString(" ")
          if (Math.floorMod(mix64(n ^ 0xBEEFL), 5) == 0L) t = boilerplate + " " + t
          (t, n, "singleton")
        }
      } else {
        val base = baseTokens(group, lang)
        if (kindRoll < 35) {
          var t = base.mkString(" ")
          if (Math.floorMod(mix64(group ^ 0xBEEFL), 5) == 0L) t = boilerplate + " " + t
          (t, baseId, "exact")
        } else if (kindRoll < 75) {
          // near-dup: 1-5 token substitutions/deletions
          val edits = 1 + Math.floorMod(mix64(n ^ 0xED17L), 5).toInt
          val buf: Array[String] = base.clone()
          var i = 0
          var h = mix64(n ^ 0xACE1L)
          while (i < edits) {
            h = mix64(h)
            val pos = Math.floorMod(h, buf.length).toInt
            h = mix64(h)
            buf(pos) = if (Math.floorMod(h, 4) == 0L) null // deletion
              else pick(lang, h)
            i += 1
          }
          var t = buf.filter(_ != null).mkString(" ")
          if (Math.floorMod(mix64(group ^ 0xBEEFL), 5) == 0L) t = boilerplate + " " + t
          (t, baseId, "near")
        } else {
          // substring: contiguous >=60% slice of base + boilerplate header
          val h = mix64(n ^ 0x5AB5L)
          val sliceLen = math.max((base.length * 6) / 10, 1)
          val start = Math.floorMod(h, math.max(base.length - sliceLen, 1)).toInt
          val t = boilerplate + " " + base.slice(start, start + sliceLen).mkString(" ")
          (t, baseId, "substring")
        }
      }

    val site = Math.floorMod(mix64(n ^ 0x517EL), 100).toInt
    val html =
      if (includeHtml)
        ("<html><body>" + TextExtract.encodeEntities(text) + "</body></html>")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      else Array.emptyByteArray
    CorpusRow(
      id = n,
      url = s"https://site$site.example/p/$n",
      warc_ts = new java.sql.Timestamp(BaseTs + n * 37000L),
      html = html,
      text = text,
      lang = lang,
      truth_cluster = truth,
      kind = kind)
  }

  /** Shared 30-token boilerplate header (hot-bucket generator). */
  val boilerplate: String =
    Array.tabulate(30)(i => pick("en", mix64(0xB011E4L + i))).mkString(" ")

  def generate(spark: SparkSession, nRows: Long,
               includeHtml: Boolean = true): DataFrame = {
    import spark.implicits._
    spark.range(nRows).map(n => rowFor(n, includeHtml)).toDF()
  }

  /** Ground-truth duplicate pairs (all pairs within a truth cluster). */
  def truthPairs(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = corpus.select(col("id"), col("truth_cluster"))
    val l = t.select(col("truth_cluster"), col("id").as("id_l"))
    val r = t.select(col("truth_cluster"), col("id").as("id_r"))
    l.join(r, "truth_cluster").filter(col("id_l") < col("id_r"))
      .select("id_l", "id_r")
  }
}
