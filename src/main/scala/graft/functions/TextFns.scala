package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis Column expressions for large-scale training-data pipelines:
  * token counting, language-ID heuristic, quality scoring, fingerprinting.
  *
  * Everything is a codegen-friendly builtin composition (no UDFs); regex
  * patterns are restricted to character classes + alternation so Java regex
  * (Spark) and RE2 (DuckDB oracle) agree.
  */
object TextFns {

  /** Whitespace-token count. Empty/blank text counts 0. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish token count: letter runs, digit runs, single punctuation.
    * (group index 0 is explicit: Spark's regexp_extract_all defaults to
    * group 1, which errors on group-free patterns.)
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Count of English stopword occurrences (word-boundary matched). */
  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(the|a|an|and|of|to|in|is|it|that)\\b"), lit(0))).cast("long")

  /** Per-language stopword hit counts for the lang-ID heuristic. */
  val langStopwords: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|that|with|for)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|mit|ein)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|pour|dans)\\b",
    "es" -> "\\b(el|la|los|y|es|una|por|para)\\b"
  )

  /** N-gram/stopword language-ID heuristic: argmax of per-language stopword
    * hits, deterministic tie-break by language order above, "und"(etermined)
    * when nothing matches.
    */
  def langIdGuess(text: Column): Column = {
    val scores = langStopwords.map { case (lang, re) =>
      lang -> size(regexp_extract_all(lower(text), lit(re), lit(0))).cast("long")
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(best > 0 && sc === best, lit(lang)).otherwise(acc)
    }
  }

  /** Integer quality score in [0,10]: rewards mid-length docs, penalizes
    * punctuation soup, rewards stopword presence. Pure integer arithmetic —
    * engine-agnostic by construction; divide by 10 (a single IEEE division)
    * only at the edge if a [0,1] value is needed.
    */
  def qualityScore10(text: Column): Column = {
    val nTok   = wsTokenCount(text)
    val nPunct = punctCount(text)
    val nStop  = stopwordCount(text)
    val lenOk  = when(length(text).between(100, 2000), lit(1L)).otherwise(lit(0L))
    val punctOk = when(nPunct * 10 <= nTok, lit(1L)).otherwise(lit(0L))
    val stopOk  = when(nStop > 0, lit(1L)).otherwise(lit(0L))
    lenOk * 4 + punctOk * 3 + stopOk * 3
  }

  /** Quality score in [0,1]: [[qualityScore10]] / 10 as one IEEE division. */
  def qualityScore(text: Column): Column =
    qualityScore10(text).cast("double") / lit(10.0)

  /** Normalized-text document fingerprint: md5 over lowercased,
    * whitespace-collapsed, trimmed text. Two docs differing only in case or
    * spacing collide — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  // ---- variants over a precomputed graft_text_stats struct -------------
  // (GraftNative.textStats: one native pass instead of 5+ regex passes;
  // value-identical counters, asserted in NativeExprsSpec)

  /** [[qualityScore10]] from a stats struct + the text (length only). */
  def qualityScore10From(stats: Column, text: Column): Column = {
    val lenOk = when(length(text).between(100, 2000), lit(1L)).otherwise(lit(0L))
    val punctOk = when(stats.getField("n_punct") * 10 <= stats.getField("ws_tokens"),
      lit(1L)).otherwise(lit(0L))
    val stopOk = when(stats.getField("n_stop") > 0, lit(1L)).otherwise(lit(0L))
    lenOk * 4 + punctOk * 3 + stopOk * 3
  }

  /** [[langIdGuess]] from a stats struct (same order + tie-break). */
  def langIdGuessFrom(stats: Column): Column = {
    val scores = Seq("en" -> "s_en", "de" -> "s_de", "fr" -> "s_fr", "es" -> "s_es")
      .map { case (lang, f) => lang -> stats.getField(f) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(best > 0 && sc === best, lit(lang)).otherwise(acc)
    }
  }
}
