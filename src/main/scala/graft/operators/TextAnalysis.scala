package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for large-scale document pipelines:
 * tokenization stats, quality signals, language-ID heuristics and
 * fingerprints. All pure Catalyst expressions (codegen-friendly, no UDFs),
 * so they vectorize inside whole-stage codegen and scale linearly with
 * partition count — no shuffles, no driver involvement.
 */
object TextAnalysis {

  /** Whitespace tokens (single-space split, empties removed). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of punctuation characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Mean token length (chars excluding spaces / token count); null for
    * empty docs. */
  def avgTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(null))
      .otherwise(length(regexp_replace(text, " ", "")).cast("double") / n)
  }

  /** Stopword-marker language ID: count marker-token hits per language and
    * take the argmax with a fixed preference order (en > es > de > fr),
    * "und" (undetermined) when no marker hits. A real pipeline would use
    * char n-gram profiles; the shape (per-doc scoring → argmax) is the same
    * and stays fully vectorized. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "fr" -> Seq("le", "les", "des", "et", "du", "une"))

  def langHits(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isin(langMarkers(lang).map(x => x: Any): _*)))

  def langId(text: Column): Column = {
    val en = langHits(text, "en"); val es = langHits(text, "es")
    val de = langHits(text, "de"); val fr = langHits(text, "fr")
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Canonical document fingerprint: md5 over lower-cased,
    * whitespace-collapsed text. Equal fingerprints ⇔ same normalized
    * content — the exact-dedup key at any scale. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  /** Rolling polynomial hash over the token stream (base-31 mod 1e9+7,
    * over per-token xxhash64 reduced mod 1e9+7). Order-sensitive — unlike
    * [[fingerprint]] it distinguishes permuted documents. Arithmetic stays
    * below 2^63 so it is overflow-free. */
  def rollingHash(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), p), p))
  }
}
