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

  /** Whitespace tokens (single-space split, empties removed). One
    * compiled byte-scan ([[graft.plans.Tokens]]) — the declarative
    * split+filter materialized every empty segment and paid an
    * interpreted HOF pass per document on the entry stage of every
    * text operator. Bit-parity with [[tokensReference]] is spec'd. */
  def tokens(text: Column): Column = graft.plans.Kernels.tokens(text)

  /** The declarative split+filter formulation of [[tokens]] — the
    * parity baseline the kernel is spec'd against. */
  private[graft] def tokensReference(text: Column): Column =
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
    markerHits(tokens(text), langMarkers(lang))

  /** Count of tokens belonging to a literal marker set — one compiled
    * pass with a hoisted hash set ([[graft.plans.CountIn]]); the
    * declarative `size(filter(toks, isin(...)))` paid an interpreted
    * HOF pass with an O(|set|) isin chain per token, four times per
    * document in [[langId]]. Parity spec'd against
    * [[markerHitsReference]]. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    graft.plans.Kernels.countIn(toks, typedLit(markers))

  /** The declarative formulation of [[markerHits]] — the parity
    * baseline the kernel is spec'd against. */
  private[graft] def markerHitsReference(toks: Column,
                                         markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(x => x: Any): _*)))

  def langId(text: Column): Column = {
    val en = langHits(text, "en"); val es = langHits(text, "es")
    val de = langHits(text, "de"); val fr = langHits(text, "fr")
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Contiguous word n-grams, order-preserving and NON-distinct — the
    * frequency-carrying variant of [[Dedup.shinglesOfTokens]] (which
    * distincts these for set-similarity). One compiled window walk
    * ([[graft.plans.WindowGrams]]) — the declarative form chained n−1
    * interpreted zip_with passes, each allocating a full intermediate
    * array. Bit-parity with [[ngramsReference]] is spec'd. */
  def ngrams(toks: Column, n: Int): Column = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    graft.plans.Kernels.windowGrams(toks, lit(n))
  }

  /** The declarative zip_with-chain formulation of [[ngrams]] — the
    * parity baseline the kernel is spec'd against. */
  private[graft] def ngramsReference(toks: Column, n: Int): Column = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    var acc = toks
    for (o <- 1 until n)
      acc = zip_with(acc, slice(toks, lit(o + 1), size(toks)),
        (a, b) => concat(a, lit(" "), b))
    filter(acc, x => x.isNotNull)
  }

  // ─────────────── quality signals (Gopher/C4-style filters) ───────────────
  // Public-rule shapes: Rae et al. 2021 (Gopher) §A1.1 and Raffel et al.
  // 2020 (C4) filter documents on stopword density, lexical diversity and
  // symbol load. All pure expressions — a quality gate is a per-row filter,
  // never a shuffle.

  /** Fraction of tokens that are (English) stopword markers; null for
    * empty docs. Low values flag non-prose (tables, code, keyword spam). */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n > 0, langHits(text, "en").cast("double") / n)
  }

  /** Type-token ratio: distinct / total tokens; null for empty docs.
    * Low values flag repetitive machine-generated text. */
  def typeTokenRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n > 0, size(array_distinct(tokens(text))).cast("double") / n)
  }

  /** Fraction of characters that are neither alphanumeric nor space;
    * null for empty strings. High values flag markup/encoding junk. */
  def symbolRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") /
        length(text))

  // Gopher §A1.1 repetition + format signals (Rae et al. 2021): the
  // document-level duplicate-content and list-format rules that run
  // BEFORE any corpus-level dedup. All per-row (no shuffle); the one
  // HOF pass (dupLineCharFraction's distinct-line char sum) is a cold
  // single-pass fold — not worth a kernel at its measured floor.

  /** Fraction of lines that duplicate another line in the SAME
    * document: 1 − distinct/total. Gopher drops docs above 0.30.
    * Null for null text. */
  def dupLineFraction(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) > 0,
      lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))
  }

  /** [[dupLineFraction]] over blank-line-separated paragraphs
    * (Gopher's 0.30 paragraph rule). */
  def dupParagraphFraction(text: Column): Column = {
    val ps = split(text, "\n\n")
    when(size(ps) > 0,
      lit(1.0) - size(array_distinct(ps)).cast("double") / size(ps))
  }

  /** CHARACTER-weighted duplicate-line fraction (Gopher's 0.20 rule):
    * fraction of line characters belonging to repeat occurrences.
    * Total line chars = length(text) − separators (no HOF); unique
    * chars need one fold over the distinct lines. */
  def dupLineCharFraction(text: Column): Column = {
    val ls = lines(text)
    val tot = (length(text) - (size(ls) - 1)).cast("long")
    val uniq = aggregate(array_distinct(ls), lit(0L),
      (a, l) => a + length(l))
    when(size(ls) > 0 && tot > 0,
      lit(1.0) - uniq.cast("double") / tot)
  }

  /** Fraction of lines that start with a bullet marker (-, *, •) after
    * leading whitespace; Gopher drops docs above 0.90. */
  def bulletLineFraction(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) > 0,
      size(filter(ls, l => ltrim(l).rlike("^[-*•]"))).cast("double") /
        size(ls))
  }

  /** Fraction of lines that end with an ellipsis ("..." or …) before
    * trailing whitespace; Gopher drops docs above 0.30. */
  def ellipsisLineFraction(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) > 0,
      size(filter(ls, l => rtrim(l).rlike("(\\.\\.\\.|…)$")))
        .cast("double") / size(ls))
  }

  /** LLM token-count estimate: matches of a GPT-2-style pre-tokenizer
    * pattern (word / number / punctuation runs, each with its leading
    * space). Deliberately restricted to the RE2-safe subset (no
    * lookarounds, no unicode classes) so the same pattern runs on every
    * engine in the lake; on English web text this tracks BPE token
    * counts within ~15% — good enough for the "tokens per document"
    * budgeting a training pipeline does before real tokenization. */
  def tokenEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit(" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"),
      lit(0)))

  // ───────────────────────── PII scrubbing ─────────────────────────

  /** Mask URLs, then emails, then phone-like digit runs (that order —
    * URLs and emails contain digit runs a later phone pass would
    * shred). Regexes stay in the RE2-safe subset (char classes,
    * bounded repeats, no backreferences/lookaround) so the same
    * pattern runs on any engine in the lake. */
  def maskPii(text: Column): Column = {
    val noUrl = regexp_replace(text, "https?://[^ ]+", "<URL>")
    val noEmail = regexp_replace(noUrl,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "\\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>")
  }

  // ─────────────── URL canonicalization (per-domain curation) ───────────────
  // Web-corpus pipelines dedup and quota BY URL/HOST before anything
  // content-based runs (C4 dedups at the URL level; per-domain caps need
  // the registered host). All RE2-safe regex — no lookaround — so the
  // same canonical form computes on any engine in the lake.

  /** Scheme-less, fragment-less, query-less URL with a lowercased,
    * `www.`-stripped host and a trailing-slash-free path. Path CASE IS
    * KEPT (paths are case-sensitive per RFC 3986; hosts are not). */
  def normalizeUrl(url: Column): Column = {
    val noScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noJunk = regexp_replace(regexp_replace(noScheme, "#.*$", ""),
      "\\?.*$", "")
    val host = regexp_replace(lower(regexp_extract(noJunk, "^[^/]*", 0)),
      "^www\\.", "")
    val path = regexp_replace(regexp_replace(noJunk, "^[^/]*", ""), "/$", "")
    concat(host, path)
  }

  /** The registered host of a URL — the per-domain quota/cap key. */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(
        regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", ""),
        "^[^/?#]*", 0)),
      "^www\\.", "")

  /** Unicode NFC normalization via the [[graft.plans.NfcNormalize]]
    * expression (ASCII fast path, codegen'd): run before
    * [[fingerprint]]/shingling so visually-identical strings with
    * different codepoint sequences dedup together. */
  def normalizeNfc(text: Column): Column = graft.plans.Kernels.nfc(text)

  // ───────────── C4 line-level boilerplate filtering ─────────────
  // Raffel et al. 2020 §2.2: C4 cleans Common Crawl LINE by line —
  // keep only lines that look like prose (enough words, terminal
  // punctuation, no "javascript" boilerplate), and flag documents
  // carrying "lorem ipsum" or code braces. Pure per-row array
  // expressions: the line pass never shuffles.

  /** Document lines (newline split; no trailing-empty trimming, so
    * counts agree with any engine's plain split). */
  def lines(text: Column): Column = split(text, "\n")

  /** The C4 line gate: ≥ `minWords` words, ends in terminal
    * punctuation, and no "javascript" boilerplate marker. The per-line
    * word count rides the [[graft.plans.Tokens]] kernel (identical
    * semantics to split-then-drop-empties, one byte scan per line
    * instead of an interpreted split+filter+lambda-per-word chain —
    * the exact pattern the kernel removed at document level). */
  def c4KeptLines(text: Column, minWords: Int = 3): Column =
    filter(lines(text), l =>
      size(tokens(l)) >= minWords &&
        l.rlike("[.!?\"]$") &&
        !lower(l).contains("javascript"))

  /** Cleaned text: the kept lines rejoined. */
  def c4CleanText(text: Column, minWords: Int = 3): Column =
    array_join(c4KeptLines(text, minWords), "\n")

  /** Document-level C4 flags: "lorem ipsum" placeholder text and curly
    * braces (code leakage) each disqualify the whole document. */
  def hasLoremIpsum(text: Column): Column =
    lower(text).contains("lorem ipsum")
  def hasCodeBrace(text: Column): Column = text.contains("{")

  /** Canonical document fingerprint: md5 over lower-cased,
    * whitespace-collapsed text. Equal fingerprints ⇔ same normalized
    * content — the exact-dedup key at any scale. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  /** Rolling polynomial hash over the token stream (base-31 mod 1e9+7,
    * over per-token xxhash64 reduced mod 1e9+7). Order-sensitive — unlike
    * [[fingerprint]] it distinguishes permuted documents. Arithmetic stays
    * below 2^63 so it is overflow-free. */
  /** `hashFn` defaults to xxhash64 (fast path); pass
    * [[Dedup.md5Hash60]] for a basis the DuckDB oracle can replay. */
  def rollingHash(text: Column,
                  hashFn: Column => Column = xxhash64(_)): Column = {
    val p = lit(1000000007L)
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(hashFn(t), p), p))
  }

  /**
   * Corpus-GLOBAL line dedup — the boilerplate-removal step of
   * C4 (Raffel et al. 2020 deduplicate three-sentence spans corpus-wide)
   * and RefinedWeb/CCNet (line-frequency filtering): a line whose exact
   * content appears in more than `maxDocs` distinct documents (nav
   * menus, cookie banners, legal footers) is removed from EVERY
   * document; surviving lines are reassembled in original order.
   * Documents whose every line is boilerplate come back with empty
   * text, not dropped — the caller decides their fate.
   *
   * Unlike [[c4KeptLines]] (per-row heuristics, no shuffle) this needs
   * corpus state: one line-hash-keyed aggregation. The shuffle carries
   * (hash, doc_id) — never the line text — and the boilerplate set
   * after the HAVING filter is tiny relative to the corpus, so the
   * removal join is a broadcast anti-join in practice. Reassembly
   * groups each document's own surviving lines: bounded by document
   * size, no global ordering anywhere.
   */
  def globalLineDedup(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, maxDocs: Int,
                      hashFn: Column => Column = xxhash64(_))
      : org.apache.spark.sql.DataFrame = {
    val others = docs.columns.filter(c => c != idCol && c != textCol).toSeq
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")))
      .select(col(idCol), col("pos"), col("col").as("line"),
        hashFn(col("col")).as("line_hash"))
    val boilerplate = lines.groupBy("line_hash")
      .agg(countDistinct(idCol).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select("line_hash")
    val rebuilt = lines.join(boilerplate, Seq("line_hash"), "left_anti")
      .groupBy(idCol)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        s => s.getField("line")), "\n").as("__clean"))
    docs.join(rebuilt, Seq(idCol), "left")
      .select((col(idCol) +: others.map(col) :+
        coalesce(col("__clean"), lit("")).as(textCol)): _*)
  }
}
