package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalars for the training-data pipeline: tokenization,
  * quality scoring, fingerprinting, language-ID. All Column builders
  * compose built-in (codegen'd) expressions — no UDF in the hot path
  * except [[langId]] (table-lookup heuristic, cheap).
  *
  * Capability analogues in the reference: stopword counting / text
  * gating (/root/reference/newspaperlite/texthelper.py:47-89, used by the
  * gravity scorer), corpus quality filters (/root/reference/script2.py:8-21).
  */
object TextOps {

  /** Whitespace tokens (single-space-joined corpora; multi-space safe via
    * regex split, empty tokens dropped).
    */
  def tokens(text: Column): Column =
    filter(split(text, " +"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles (orderful), 1-based sequence over the token
    * array; returns fewer-than-n-token docs an empty array.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))

  /** Non-overlapping word segments of `n` tokens (the last may be
    * shorter), single-space-joined — the unit of corpus-level
    * duplicated-segment removal ([[graft.operators.Dedup.duplicateSegments]]).
    * Empty token arrays give empty segment arrays (guarded explicitly:
    * Spark's integer `(-1)/n` truncates toward zero, which would emit a
    * phantom empty segment).
    */
  def segments(toks: Column, n: Int): Column =
    when(size(toks) === 0, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0), floor((size(toks) - lit(1)) / lit(n)).cast("int")),
        p => array_join(slice(toks, p * lit(n) + lit(1), lit(n)), " ")))

  /** Ratio columns for quality scoring. Integer/integer division in Spark
    * promotes to double with IEEE-correct rounding — byte-stable across
    * engines (used by the DuckDB oracle too).
    */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") / length(text)

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double") / length(text)

  def stopwordRatio(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stops))).cast("double") / size(toks)

  /** MD5 content fingerprint of the case/whitespace-normalized text —
    * the exact-dedup key (hex string matches every engine's md5()).
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Polynomial rolling hash (Rabin-Karp, base 257 mod 2^61-1) over the
    * UTF-8 bytes — the incremental-fingerprint primitive used for
    * chunk-level dedup at scale. Pure Scala; exposed as UDF.
    */
  def rollingHash(s: String): Long = {
    val Mod = (1L << 61) - 1
    var h = 0L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      // (h * 257 + b) mod (2^61-1) via 128-bit-free split multiply
      h = mulMod(h, 257L, Mod)
      h = (h + (bytes(i) & 0xffL)) % Mod
      i += 1
    }
    h
  }

  private def mulMod(a: Long, b: Long, m: Long): Long = {
    // a < 2^61, b small (257): direct multiply fits in a Long only if
    // a < 2^63/257 — not guaranteed, so split a into hi/lo 31-bit halves.
    val aHi = a >>> 31
    val aLo = a & 0x7fffffffL
    // a*b = (aHi*b)*2^31 + aLo*b  (mod m)
    var r = (aHi * b) % m
    var i = 0
    while (i < 31) { r = (r << 1) % m; i += 1 }
    (r + aLo * b) % m
  }

  // ---- language ID (n-gram/function-word heuristic) ------------------

  private val langMarkers: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "with", "for", "it"),
    "es" -> Set("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es"),
    "fr" -> Set("le", "la", "les", "des", "du", "et", "que", "est", "une", "dans"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"),
    "it" -> Set("il", "lo", "gli", "di", "che", "e", "per", "con", "del", "della"))

  /** Deterministic heuristic language-ID: CJK codepoint share first, then
    * function-word hit counts (ties broken by fixed language order),
    * fallback "en". O(tokens); no per-row allocation beyond the split.
    */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0; var total = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!Character.isWhitespace(c)) {
        total += 1
        if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk * 2 > total) return "zh"
    val toks = text.toLowerCase.split("\\s+")
    var best = "en"; var bestHits = 0
    for ((lang, markers) <- langMarkers) {
      var hits = 0
      var j = 0
      while (j < toks.length) { if (markers.contains(toks(j))) hits += 1; j += 1 }
      if (hits > bestHits) { best = lang; bestHits = hits }
    }
    if (bestHits == 0) "en" else best
  }
}
