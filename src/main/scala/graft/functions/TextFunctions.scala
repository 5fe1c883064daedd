package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, language-ID, quality scoring, fingerprinting. All are
  * compositions of built-in (whole-stage-codegen'd) expressions — no
  * UDFs — so they stay inside WSCG and scale linearly with the scan.
  *
  * Determinism discipline: counting is done over token ARRAYS (filter +
  * size), never substring-replace tricks, so results are exact and
  * engine-independent (overlapping-match semantics differ between
  * engines' replace()).
  */
object TextFunctions {

  /** Whitespace tokenization. Empty/blank text → empty array.
    * split on trimmed text can only produce an empty token for blank
    * input, so a cheap conditional replaces a per-element filter HOF. */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Occurrences of an exact token (word-boundary semantics by
    * construction). */
  def tokenOccurrences(toks: Column, word: String): Column =
    size(filter(toks, t => t === word))

  /** Marker-token language ID: count each language's marker tokens,
    * argmax with deterministic tie-break (first language in `markers`
    * wins ties). Languages with zero marker hits fall through to
    * `fallback`. N-gram-free but the same shape as fasttext-style
    * heuristics: score per language, max wins. */
  def langId(text: Column, markers: Seq[(String, Seq[String])],
      fallback: String = "und"): Column = {
    val toks = tokens(text)
    val scores = markers.map { case (lang, words) =>
      lang -> words.map(w => tokenOccurrences(toks, w)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit(fallback))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit(fallback))
  }

  /** Integer-exact quality signals: token count, stopword count, mean
    * token length ×100 (integer), all comparable across engines without
    * floating point. */
  def qualitySignals(text: Column, stopwords: Seq[String])
      : (Column, Column, Column) = {
    val toks = tokens(text)
    val nTokens = size(toks)
    val nStop = stopwords.map(w => tokenOccurrences(toks, w))
      .reduceOption(_ + _).getOrElse(lit(0))
    // mean token length in hundredths, integer division — exact
    val charSum = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val meanLenX100 = when(nTokens > 0, (charSum * 100L).cast("long") / nTokens)
      .otherwise(lit(0L)).cast("long")
    (nTokens.cast("long"), nStop.cast("long"), meanLenX100)
  }

  /** Quality gate (integer arithmetic only): enough tokens, stopword
    * ratio in [min,max] per-mille, mean token length sane. */
  def qualityGate(nTokens: Column, nStop: Column, meanLenX100: Column,
      minTokens: Long = 10, minStopPerMille: Long = 10,
      maxStopPerMille: Long = 600,
      minMeanLenX100: Long = 150, maxMeanLenX100: Long = 1200): Column =
    nTokens >= minTokens &&
      nStop * 1000L >= nTokens * minStopPerMille &&
      nStop * 1000L <= nTokens * maxStopPerMille &&
      meanLenX100 >= minMeanLenX100 && meanLenX100 <= maxMeanLenX100

  /** Exact-dup fingerprint: md5 of case/whitespace-normalized text. */
  def exactFingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(lower(text))).cast("binary"))

  /** Order-insensitive bag fingerprint: md5 over the sorted distinct
    * token set — catches shuffled near-dups exactly. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(lower(text))))).cast("binary"))

  /** Word n-gram shingles from a token array ("w1 w2", "w2 w3", ...).
    * Native kernel ([[graft.functions.expressions.WordShingles]]);
    * value-identical to the HOF formulation
    * `transform(sequence(1, size-n+1), i -> concat_ws(' ', slice(toks, i, n)))`
    * but ~1000× cheaper per element (single loop vs interpreted lambda). */
  def shingles(toks: Column, n: Int): Column =
    graft.functions.expressions.GraftFunctions.wordShingles(toks, n)

  /** Character n-grams of the normalized text (native kernel, same
    * values as `transform(sequence(1, len-n+1), i -> substring(s, i, n))`). */
  def charNgrams(text: Column, n: Int): Column =
    graft.functions.expressions.GraftFunctions.charNgramsNative(
      concat_ws(" ", tokens(lower(text))), n)

  /** Deterministic per-seed shingle hash for MinHash: the md5 hex of
    * `seed:shingle`. Lexicographic MIN over these hex strings is a
    * valid minhash permutation and is engine-portable (same md5, same
    * string ordering) — no platform hash functions involved. */
  def seededHash(seed: Int, shingle: Column): Column =
    md5(concat(lit(s"$seed:"), shingle).cast("binary"))
}
