package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines (the
  * beyond-parity extension set — SURVEY.md §7). Everything is composed from
  * `org.apache.spark.sql.functions` (codegen'd / vectorizable builtins or
  * higher-order functions) — no UDFs in the hot path, so column pruning and
  * whole-stage codegen survive around these expressions.
  */
object TextFns {

  /** Lowercased whitespace tokens. Empty/blank input => empty array (Spark's
    * split of "" yields [""], which we filter).
    */
  def tokens(c: Column): Column =
    filter(split(trim(lower(c)), "\\s+"), t => length(t) > 0)

  /** Whitespace token count — the cheap proxy a 100 TB pipeline uses before
    * real tokenization. Native single-pass expression
    * ([[graft.plans.TextExprs.TokenCountExpr]]).
    */
  def tokenCount(c: Column): Column = graft.plans.TextExprs.tokenCount(c)

  /** Unicode normalization (NFC default; NFD/NFKC/NFKD) — run it before
    * any hash-based dedup or tokenization so canonically-equivalent text
    * (precomposed vs combining-mark accents, ligatures under NFKC) is one
    * string, not many ([[graft.plans.TextExprs.NormalizeExpr]]).
    */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    graft.plans.TextExprs.normalizeUnicode(c, form)

  /** BPE-ish subword count: word-pieces + digits + punctuation as separate
    * tokens (a regex approximation of byte-pair tokenizers; deterministic,
    * cheap, codegen'd). Counts matches of: runs of letters (<=4 chars per
    * piece), digit runs, or single non-space symbols.
    */
  def bpeishTokenCount(c: Column): Column =
    size(filter(split(c, "(?<=\\G.{4})(?=\\p{L})|(?<=\\p{L})(?=[^\\p{L}\\s])|(?<=[^\\p{L}\\s])(?=\\p{L})|\\s+"), t => length(t) > 0))

  /** Character n-gram shingles (distinct). `Column.substr(pos, len)` keeps
    * this inside codegen; array size is O(len(text)).
    */
  def charNgrams(c: Column, n: Int): Column = {
    val count = length(c) - (n - 1)
    // Guard: Spark's sequence(1, 0) infers step -1 and yields [1, 0], so a
    // too-short input must short-circuit to an empty array explicitly.
    when(count <= 0, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), count), i => c.substr(i, lit(n)))))
  }

  /** Word n-gram shingles (distinct), the standard unit for document-level
    * near-dup detection (MinHash/Jaccard). For docs shorter than n words the
    * whole doc is the single shingle (so every doc has >=1 shingle).
    *
    * Built with `zip_with` over n shifted slices, NOT
    * `transform(sequence(...), i => slice(toks, i+1, n))`: a lambda that
    * references the computed `toks` subtree re-evaluates it per element
    * under interpreted HOF eval (no subexpression reuse) — an O(m²) regex
    * re-tokenize per document. zip_with's inputs are ARGUMENTS, evaluated
    * once per row; the lambda touches only its elements, so the whole
    * construction is O(m·n).
    */
  def wordNgrams(c: Column, n: Int): Column = {
    val toks = tokens(c)
    val cnt = size(toks) - (n - 1)
    var full = slice(toks, lit(1), cnt)
    for (j <- 1 until n)
      full = zip_with(full, slice(toks, lit(j + 1), cnt),
        (a, b) => concat(a, lit(" "), b))
    array_distinct(
      when(cnt < 1, array(array_join(slice(toks, 1, n), " ")))
        .otherwise(full))
  }

  /** 64-bit shingle hashes: the form every downstream dedup operator
    * consumes (hashing early keeps shuffles narrow — longs, not strings).
    * Native fused tokenize+shingle+hash pass
    * ([[graft.plans.TextExprs.ShingleHashesExpr]]); equivalent to
    * `transform(wordNgrams(c, n), s => xxhash64(s))`.
    */
  def shingleHashes(c: Column, n: Int): Column =
    graft.plans.TextExprs.shingleHashes(c, n)

  /** Count of distinct character n-grams — `size(charNgrams(c, n))` without
    * materializing the array ([[graft.plans.TextExprs.CharNgramCountExpr]]).
    */
  def charNgramCount(c: Column, n: Int): Column =
    graft.plans.TextExprs.charNgramCount(c, n)

  /** Duplicate-line share (Gopher-style repetition signal): 1 - distinct
    * non-blank lines / non-blank lines; 0.0 for documents with no non-blank
    * line. Boilerplate-heavy pages (nav bars, repeated footers) score high.
    * Built from codegen'd builtins — line arrays are tiny, no custom
    * expression needed.
    */
  def dupLineRatio(c: Column): Column = {
    val lines = org.apache.spark.sql.functions.filter(
      split(c, "\n"), l => length(trim(l)) > 0)
    when(size(lines) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines).cast("double"))
  }

  /** Character n-gram repetition (Gopher-style): 1 - distinct n-grams /
    * total n-gram windows; 0.0 when the text is shorter than n. Keyboard
    * mash and template spam repeat windows; fluent prose stays low.
    * Distinct count via the native single-pass [[charNgramCount]].
    */
  def ngramRepetitionRatio(c: Column, n: Int): Column = {
    val total = greatest(length(c) - (n - 1), lit(0))
    when(total === 0, lit(0.0))
      .otherwise(lit(1.0) - charNgramCount(c, n).cast("double") / total.cast("double"))
  }

  /** Redact emails and URLs with placeholder tokens — the PII/link-scrub
    * stage of a corpus-cleaning pipeline. Patterns avoid lookarounds and
    * engine-specific classes so Java regex (Spark) and RE2 (DuckDB oracle)
    * agree byte for byte; URLs first, then emails (an email inside a URL's
    * query string is already covered by the URL match). The URL terminator
    * is an explicit whitespace class, not `\s` — Java's `\s` includes
    * vertical tab (\x0B) while RE2's does not, so `\s` would redact
    * differently across the two engines.
    */
  def redactPii(c: Column): Column = {
    val url = regexp_replace(c, "https?://[^ \\t\\n\\x0B\\f\\r]+", "<URL>")
    regexp_replace(url, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  }

  /** Strip HTML markup down to text: every `<...>` tag replaced by a
    * single space (so `a</p><p>b` keeps its word boundary), then the five
    * core character entities decoded — `&amp;` LAST, so `&amp;lt;`
    * correctly yields the literal `&lt;` rather than double-decoding to
    * `<` (the classic entity-order bug). The first transform of any
    * web-corpus pipeline; patterns sit in the shared Java-regex/RE2
    * subset, so both engines strip byte-identically. Not a sanitizer —
    * malformed markup (unclosed `<`) passes through untouched by design;
    * this is text extraction, not parsing.
    */
  def stripHtml(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val ents = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
    ents.foldLeft(noTags) { case (col0, (e, r)) =>
      replace(col0, lit(e), lit(r))
    }
  }

  /** Count of http(s) URLs in `c` — same Java/RE2-agnostic pattern as
    * [[redactPii]], so the count is reproducible cross-engine. The PII /
    * link-density profile: docs above a link-count threshold are usually
    * navigation or spam, not prose.
    */
  def urlCount(c: Column): Column =
    regexp_count(c, lit("https?://[^ \\t\\n\\x0B\\f\\r]+")).cast("long")

  /** Count of email addresses in `c`, URLs removed first (an address inside
    * a URL's query string is the URL's, not a standalone email — same
    * URL-then-email order as [[redactPii]]).
    */
  def emailCount(c: Column): Column =
    regexp_count(
      regexp_replace(c, "https?://[^ \\t\\n\\x0B\\f\\r]+", " "),
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).cast("long")

  /** Host part of the first http(s) URL in `c` (lowercased; empty string
    * when no URL). Same Java/RE2-agnostic regex discipline as
    * [[redactPii]]: the host ends at `/ : ? #` or whitespace, all spelled
    * as explicit classes. The URL-frequency profile (per-domain doc
    * counts) is how a web corpus decides source quotas and blocklists.
    */
  def urlHost(c: Column): Column =
    lower(regexp_extract(c, "https?://([^/ :?#\\t\\n\\x0B\\f\\r]+)", 1))

  /** Apex ("registrable-ish") domain: the last two dot-labels of a host
    * (`a.b.example.com` -> `example.com`). A heuristic, NOT the Public
    * Suffix List — `foo.co.uk` yields `co.uk`; a production blocklist
    * join should plug a PSL table into the same column shape.
    */
  def apexDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Rotate-XOR rolling-hash document fingerprint over token hashes:
    * fp = fold(h_tok, acc -> rotl(acc, 5) ^ h_tok). Order-sensitive (unlike
    * a set hash), so reordered documents fingerprint differently. Pure
    * bitwise ops — no ANSI overflow (unlike a polynomial `acc*31+h`).
    * `portable = true` swaps xxhash64 token hashes for FNV-1a over code
    * points — reproducible in plain SQL (HUGEINT folds), so the output is
    * exactly verifiable cross-engine.
    */
  def fingerprint(c: Column, portable: Boolean = false): Column =
    graft.plans.TextExprs.fingerprint(c, portable)

  // --- language identification ------------------------------------------

  /** Per-language stopword marker sets for the n-gram/stopword heuristic.
    * Deliberately small and high-precision: these are the near-unambiguous
    * function words of each language.
    */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "was", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für"),
    "es" -> Seq("el", "la", "los", "las", "que", "es", "por", "con", "una", "del"),
    "fr" -> Seq("le", "les", "des", "une", "est", "dans", "pour", "qui", "sur", "avec")
  )

  /** Stopword hit count for one language over a token array. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Language-ID heuristic: CJK codepoint share decides "zh"; otherwise the
    * language whose stopword set scores the most hits wins (ties broken by
    * the fixed order of [[StopwordSets]]); zero hits everywhere => "und"
    * (undetermined, BCP-47 style). A real pipeline swaps in fastText; the
    * shape (pure column expression, no shuffle) is the part that matters at
    * scale.
    */
  /** Delegates to the native single-pass expression — the Column-HOF
    * formulation re-tokenizes per stopword set and evaluates interpreted
    * (~1 ms/doc); see [[graft.plans.TextExprs.LangIdExpr]].
    */
  def langId(c: Column): Column = graft.plans.TextExprs.langId(c)

  // --- quality scoring -----------------------------------------------------

  /** Ratio of non-alphanumeric-non-space chars to total chars (0 for empty). */
  def punctRatio(c: Column): Column = {
    val len = length(c)
    when(len === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[\\p{L}\\p{N}\\s]", "")).cast("double") / len.cast("double"))
  }

  /** Mean token length — short-token text is usually noise/navigation.
    * Native single-pass expression ([[graft.plans.TextExprs.MeanTokenLenExpr]]).
    */
  def meanTokenLen(c: Column): Column = graft.plans.TextExprs.meanTokenLen(c)

  /** English-stopword ratio of tokens — fluent prose sits around 0.3-0.6;
    * keyword-stuffed or tabular junk near 0.
    */
  def stopwordRatio(c: Column): Column = graft.plans.TextExprs.stopwordRatio(c)

  /** Composite heuristic quality score in [0,1] — the C4/Gopher-style rule
    * mix: enough tokens, sane token length, low punctuation noise.
    * Deterministic, pure expression.
    */
  def qualityScore(c: Column): Column = graft.plans.TextExprs.qualityScore(c)

  /** Jaro-Winkler similarity in [0,1] — prefix-weighted fuzzy match for
    * entity names. Native generated expression
    * ([[graft.plans.TextExprs.JaroWinklerExpr]]), DuckDB-bit-compatible.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    graft.plans.TextExprs.jaroWinkler(a, b)

  /** Occurrence counts (overlaps included) of N fixed patterns in one
    * Aho-Corasick pass — `array<long>` aligned with `patterns`. The
    * blocklist/contamination probe at N patterns per scan instead of N
    * scans ([[graft.plans.TextExprs.MultiPatternCountExpr]]).
    */
  def multiPatternCounts(c: Column, patterns: Seq[String]): Column =
    graft.plans.TextExprs.multiPatternCounts(c, patterns)
}
