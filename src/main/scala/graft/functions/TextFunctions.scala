package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text helpers, built entirely from Catalyst built-ins so they
  * stay inside whole-stage codegen (no UDFs — a Scala UDF here would break
  * the codegen span and cost 2-5x on a full-corpus pass at 100 TB).
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** 60-bit hash from the md5 prefix. Slower than xxhash64 (the default leaf
    * hash everywhere) but exactly re-derivable in standard SQL — DuckDB:
    * `('0x' || substr(md5(x), 1, 15))::BIGINT` — which makes hash-dependent
    * operators (SimHash, rolling fingerprints) oracle-checkable end to end.
    * 15 hex chars = 60 bits keeps the value positive in a signed 64-bit
    * lane on both engines, sidestepping signed-overflow/shift differences.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Consecutive w-token n-grams of a token array, duplicates KEPT (the
    * multiset — dedup with array_distinct where set semantics are wanted).
    * The guard matters: `sequence(1, 0)` is DESCENDING `[1, 0]`, so short
    * inputs must short-circuit to an empty array; that subtlety lives here
    * once (consumed by Dedup.shingles, rollingHashes, and the repetition
    * signals).
    */
  def ngrams(toks: Column, w: Int): Column =
    when(size(toks) < w, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))

  /** Maximum element multiplicity of a string array in O(n log n) per row:
    * sort, then one fold tracking the longest equal run. The naive
    * count-per-distinct-element formulation is O(n × distinct) — quadratic
    * on diverse documents, which at corpus scale dominates the pass.
    */
  def maxMultiplicity(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Language marker-word profiles for the heuristic identifier. */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "is", "and", "of", "to", "a", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "zh" -> Seq("的", "是", "了", "我", "不", "在", "他"))

  /** Heuristic language ID: argmax of marker-word hit counts per language.
    * Deterministic tie-break (lexicographically larger lang code wins) via
    * struct ordering inside `array_max`.
    */
  def langId(text: Column): Column = langIdFromTokens(tokens(lower(text)))

  /** [[langId]] over an already-staged lowered-token array. Callers scoring
    * a whole corpus should bind the token array to its own projection
    * column first (`.select(tokens(lower(text)).as("tk"))`) and pass the
    * attribute: each per-language filter re-evaluates its input expression
    * tree, so handing this an inline `tokens(lower(text))` tree re-splits
    * the text once per language (the staged form splits once per row).
    */
  def langIdFromTokens(toks: Column): Column = {
    val scored = profiles.map { case (lang, markers) =>
      struct(
        size(filter(toks, x => x.isInCollection(markers))).as("score"),
        lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Character n-gram profiles: the most frequent trigrams of each language
    * (classic Cavnar–Trenkle-style profile, tiny cut).
    */
  private val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "he ", " th", "ing", "and", " an", "ion", " of", "ed ", "is "),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", "el ", " el", "ión", "es ", "ue "),
    "fr" -> Seq(" de", "de ", "es ", " le", "le ", "ent", "et ", " et", "que", "ion"),
    "de" -> Seq("er ", "en ", "ch ", " de", "der", "die", " di", "ein", "sch", "und"))

  /** Char-trigram language ID: slide a 3-char window over the lowered text
    * and argmax per-language profile hits — pure built-ins (substring over a
    * position sequence), no UDF, deterministic tie-break as in [[langId]].
    */
  def langIdNgram(text: Column): Column = langIdNgramFromGrams(trigrams(lower(text)))

  /** All sliding 3-char windows of an (already-lowered) text column.
    * IMPORTANT for corpus-wide callers: pass an ATTRIBUTE, not an inline
    * `lower(text)` tree — the per-element lambda references the input, so
    * an inline subtree is re-evaluated once per character position
    * (quadratic in document length); see the staging note on
    * [[langIdFromTokens]].
    */
  def trigrams(lowered: Column): Column =
    transform(
      sequence(lit(1), greatest(length(lowered) - 2, lit(0))),
      i => lowered.substr(i, lit(3)))

  /** [[langIdNgram]] over an already-staged trigram array (same staging
    * rationale as [[langIdFromTokens]]). Kept as the interpreted
    * cross-check of the codegen [[langIdNgramHits]] path (spec-verified
    * equal).
    */
  def langIdNgramFromGrams(grams: Column): Column = {
    val scored = trigramProfiles.map { case (lang, prof) =>
      struct(
        size(filter(grams, g => g.isInCollection(prof))).as("score"),
        lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Per-language trigram hit counts of an (already-lowered) text column in
    * one codegen byte scan ([[TrigramProfileHits]]) — the corpus-scale
    * scoring path: no trigram array materializes, no per-profile re-scan.
    * Index order matches [[trigramProfiles]].
    */
  def langIdNgramHits(lowered: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(TrigramProfileHits(
      Bridge.childExpr(lowered), trigramProfiles.map(_._2)))
  }

  /** Argmax language from a staged [[langIdNgramHits]] array (same
    * larger-lang-code tie-break as [[langIdNgram]]).
    */
  def langIdNgramFromHits(hits: Column): Column = {
    val scored = trigramProfiles.zipWithIndex.map { case ((lang, _), i) =>
      struct(element_at(hits, i + 1).as("score"), lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Rolling window hash over the token sequence: returns the array of
    * window hashes for `w`-token windows (the hash of each w-gram's joined
    * text — the classic winnowing k-gram hash) — the building block for
    * winnowing-style document fingerprints. The leaf hash is pluggable:
    * xxhash64 by default (fast path; [[graft.functions.ShingleHashes]] is
    * its codegen dual that skips window-string materialization), or
    * [[md5Hash60]] when the result must be SQL-re-derivable for an oracle.
    * No unbounded arithmetic, so nothing trips Spark 4's default ANSI
    * overflow checks.
    */
  def rollingHashes(text: Column, w: Int,
      hasher: Column => Column = xxhash64(_)): Column =
    transform(ngrams(tokens(text), w), g => hasher(g))

  /** Winnowing fingerprint: the minimum rolling hash per document — a
    * compact signature stable under small edits away from the minimum.
    */
  def minFingerprint(text: Column, w: Int,
      hasher: Column => Column = xxhash64(_)): Column =
    array_min(rollingHashes(text, w, hasher))
}
