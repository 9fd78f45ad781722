package graft.extract

import java.nio.charset.StandardCharsets

/** The pinned html→text extractor (SURVEY §7.2 module 3).
  *
  * Per-row invariant from BASELINE.json `input_hint`: extracted `text` per
  * `url` must be byte-identical to the reference extractor across reruns and
  * versions — so this function is FROZEN and versioned; any change bumps
  * [[version]] and is a new snapshot lineage (reference determinism analog:
  * `person_1/person.py:752-756`).
  *
  * Deterministic pure function: UTF-8 decode → drop script/style subtrees →
  * strip tags → decode the five predefined XML entities. No whitespace
  * collapsing (that would break byte-identity for pre-cleaned corpora).
  */
object TextExtract {
  val version: String = "graft-extract-1.0.0"

  private val ScriptStyle =
    "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r
  private val Tag = "(?s)<[^>]*>".r

  def extract(html: Array[Byte]): String = {
    if (html == null) return null
    val raw = new String(html, StandardCharsets.UTF_8)
    val noBlocks = ScriptStyle.replaceAllIn(raw, "")
    val noTags = Tag.replaceAllIn(noBlocks, "")
    decodeEntities(noTags)
  }

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&amp;", "&") // last, so "&amp;lt;" → "&lt;" stays literal
  }

  /** Inverse used only by the synthetic corpus generator. */
  def encodeEntities(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&#39;")
}
