package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one(s: String) = Seq(s).toDF("t")

  test("tokens: lowercased, whitespace-split, blank-safe") {
    val out = one("  Hello   WORLD\tfoo ").select(TextFns.tokens($"t")).collect()(0).getSeq[String](0)
    assert(out == Seq("hello", "world", "foo"))
    assert(one("").select(TextFns.tokenCount($"t")).collect()(0).getInt(0) == 0)
    assert(one("   ").select(TextFns.tokenCount($"t")).collect()(0).getInt(0) == 0)
  }

  test("wordNgrams: distinct 3-shingles; short docs get one whole-doc shingle") {
    val out = one("a b c d").select(TextFns.wordNgrams($"t", 3)).collect()(0).getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
    val short = one("a b").select(TextFns.wordNgrams($"t", 3)).collect()(0).getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("charNgrams: sliding distinct character shingles") {
    val out = one("abcd").select(TextFns.charNgrams($"t", 3)).collect()(0).getSeq[String](0)
    assert(out == Seq("abc", "bcd"))
    assert(one("ab").select(size(TextFns.charNgrams($"t", 3))).collect()(0).getInt(0) == 0)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fp = (s: String) => one(s).select(TextFns.fingerprint($"t")).collect()(0).getLong(0)
    assert(fp("a b c") == fp("a b c"))
    assert(fp("a b c") != fp("c b a"))
  }

  test("portable fingerprint: pinned FNV-1a/rotl values incl. unicode and empties") {
    // Constants independently computed (Python big-int arithmetic) — the
    // same values the DuckDB oracle's HUGEINT fold produces, so this pins
    // both the Scala kernel and the cross-engine contract.
    val fp = (s: String) => one(s).select(TextFns.fingerprint($"t", portable = true))
      .collect()(0).getLong(0)
    assert(fp("Hello World  foo") == -798116986981931634L)
    assert(fp("") == 0L)
    assert(fp("  ") == 0L)
    assert(fp("Unicode: héllo wörld 中文 test") == 3647495489332112049L)
    assert(fp("a b c a b c") == 5659658050285375438L)
    // order sensitivity survives in portable mode
    assert(fp("a b c") != fp("c b a"))
    // Combining-mark contract: the fold is per CODE POINT, so 'e' + U+0301
    // hashes as two points — and DuckDB's string_split(tok, '') also yields
    // the base char and the combining mark separately (verified: the value
    // below is what the oracle's HUGEINT replay computes for this text).
    // Precomposed 'é' (U+00E9) is a DIFFERENT single point => different
    // hash: the contract is code-point-exact, not normalization-invariant.
    assert(fp("abc e\u0301 x") == -4610857333944482054L)
    assert(fp("abc e\u0301 x") != fp("abc \u00e9 x"))
  }

  test("normalizeUnicode: NFC composes, NFD decomposes, NFKC folds compatibility forms") {
    val df = Seq(
      ("e\u0301",  "decomposed"),   // e + combining acute
      ("\u00e9",   "precomposed"),  // precomposed e-acute
      ("\ufb01le", "ligature"),     // fi-ligature + "le"
      ("\uff11\uff12", "fullwidth") // fullwidth digits 1 2
    ).toDF("s", "kind")
    val out = df.select($"kind", TextFns.normalizeUnicode($"s").as("nfc"),
        TextFns.normalizeUnicode($"s", "NFD").as("nfd"),
        TextFns.normalizeUnicode($"s", "NFKC").as("nfkc"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(out("decomposed")._1 == "\u00e9")       // NFC composes
    assert(out("precomposed")._2 == "e\u0301")     // NFD decomposes
    assert(out("ligature")._1 == "\ufb01le")       // NFC keeps the ligature
    assert(out("ligature")._3 == "file")            // NFKC folds it
    assert(out("fullwidth")._3 == "12")             // NFKC folds width
    // null-safety + invalid form fails at construction
    assert(df.select(TextFns.normalizeUnicode(lit(null).cast("string"))).collect()(0).isNullAt(0))
    intercept[IllegalArgumentException] {
      TextFns.normalizeUnicode($"s", "NOPE"); ()
    }
  }

  test("urlHost/apexDomain: host stops at port/path/query, apex is last two labels") {
    def host(t: String) = one(t).select(TextFns.urlHost($"t")).collect()(0).getString(0)
    assert(host("see https://Docs.Sub.Example.COM:8443/a?b#c end") == "docs.sub.example.com")
    assert(host("http://example.com/path") == "example.com")
    assert(host("plain text, no url") == "")
    val apex = one("x").select(TextFns.apexDomain(lit("a.b.example.com"))).collect()(0).getString(0)
    assert(apex == "example.com")
    assert(one("x").select(TextFns.apexDomain(lit("localhost"))).collect()(0).getString(0) == "")
  }

  test("portable simhash: pinned values and near-dup hamming locality") {
    import graft.operators.Dedup
    val sh = (s: String) => one(s).select(Dedup.simhash($"t", portable = true))
      .collect()(0).getLong(0)
    assert(sh("Hello World foo") == -3733205506852348557L)
    assert(sh("") == 0L)
    assert(sh("Unicode: héllo wörld 中文 test") == 838941152565339567L)
    assert(sh("a b c a b c") == -5808554674130653788L)
    // one-token edit of a 3-token doc moves well under half the bits
    // (unrelated docs differ in ~32 on average)
    assert(java.lang.Long.bitCount(sh("Hello World foo") ^ sh("hello world fooo")) <= 24)
  }

  test("langId picks the right stopword language and CJK") {
    val cases = Seq(
      "the cat and the dog is that it was here for now" -> "en",
      "der hund und die katze ist nicht ein tier mit uns" -> "de",
      "el perro y la casa que es por con una del dia" -> "es",
      "le chien et les chats dans une maison pour qui est sur" -> "fr",
      "中文文本处理很重要" -> "zh",
      "xyzzy plugh qwerty" -> "und")
    cases.foreach { case (text, want) =>
      val got = one(text).select(TextFns.langId($"t")).collect()(0).getString(0)
      assert(got == want, s"for '$text'")
    }
  }

  test("qualityScore rewards prose, penalizes junk") {
    val prose = "the quick brown fox jumps over the lazy dog and then it runs away for fun"
    val junk = ";;;; !!!! @@@@ #### %%%% ^^^^ &&&& **** (((( ))))"
    val pq = one(prose).select(TextFns.qualityScore($"t")).collect()(0).getDouble(0)
    val jq = one(junk).select(TextFns.qualityScore($"t")).collect()(0).getDouble(0)
    assert(pq > jq && pq >= 0.66)
  }

  test("punctRatio and meanTokenLen handle empty input") {
    val r = one("").select(TextFns.punctRatio($"t"), TextFns.meanTokenLen($"t")).collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("repetition signals: duplicate lines and repeated n-gram windows") {
    def one(t: String) = Seq(Tuple1(t)).toDF("t")
    // 4 non-blank lines, 2 distinct -> dup ratio 0.5; blank lines ignored
    val dup = one("a\nb\n\na\nb")
      .select(TextFns.dupLineRatio($"t")).collect()(0).getDouble(0)
    assert(dup == 0.5)
    assert(one("").select(TextFns.dupLineRatio($"t")).collect()(0).getDouble(0) == 0.0)
    // "aaaaaa": 2 windows of length 5, 1 distinct -> repetition 0.5
    val rep = one("aaaaaa")
      .select(TextFns.ngramRepetitionRatio($"t", 5)).collect()(0).getDouble(0)
    assert(rep == 0.5)
    // shorter than n -> 0.0; all-distinct windows -> 0.0
    assert(one("abc").select(TextFns.ngramRepetitionRatio($"t", 5)).collect()(0).getDouble(0) == 0.0)
    assert(one("abcdef").select(TextFns.ngramRepetitionRatio($"t", 5)).collect()(0).getDouble(0) == 0.0)
  }

  test("redactPii replaces URLs and emails, leaves clean text untouched") {
    def red(t: String) = Seq(Tuple1(t)).toDF("t")
      .select(TextFns.redactPii($"t")).collect()(0).getString(0)
    assert(red("see https://ex.com/a?u=b@c.de now") == "see <URL> now")
    assert(red("mail me at bob.smith+x@corp.example.org.") == "mail me at <EMAIL>.")
    assert(red("no pii here") == "no pii here")
    assert(red("http://a.b c@d.ef") == "<URL> <EMAIL>")
  }

  test("bpeishTokenCount splits word pieces, digit runs, and symbols") {
    // "hello" -> hell|o (4-char pieces), "123" one digit run, "," a symbol
    val n = one("hello, world 123").select(TextFns.bpeishTokenCount($"t")).collect()(0).getInt(0)
    assert(n >= 5) // at least: hell, o, ",", worl, d, 123 modulo piece splits
    val empty = one("").select(TextFns.bpeishTokenCount($"t")).collect()(0).getInt(0)
    assert(empty == 0)
    // subword pieces mean counts exceed whitespace tokens on long words
    val long = one("internationalization").select(TextFns.bpeishTokenCount($"t")).collect()(0).getInt(0)
    assert(long > 1)
  }

  test("code-point semantics: astral chars count once in langId/quality") {
    // U+1D400/U+1D401 are astral letters (2 UTF-16 units, 1 code point each).
    // Quality's punct ratio must see 0 punctuation here, same as the regex
    // formulation; a UTF-16 loop would count each surrogate half as punct.
    val astral = "𝐀𝐁 the cat and the dog is that it was here for now"
    val hofPunct = one(astral).select(TextFns.punctRatio($"t")).collect()(0).getDouble(0)
    assert(hofPunct == 0.0)
    val q = one(astral).select(TextFns.qualityScore($"t")).collect()(0).getDouble(0)
    assert(q >= 0.66) // punctOk and mtlOk must not be poisoned by surrogates
    assert(one(astral).select(TextFns.langId($"t")).collect()(0).getString(0) == "en")
    // CJK ratio over code points: 3 CJK + astral pair + space; a UTF-16
    // denominator would tip the 4x rule the other way
    val mixed = "中文字 𝐀"
    assert(one(mixed).select(TextFns.langId($"t")).collect()(0).getString(0) == "zh")
  }

  test("urlCount/emailCount: URL-then-email order keeps query-string emails out") {
    def counts(t: String) = Seq(Tuple1(t)).toDF("t")
      .select(TextFns.urlCount($"t"), TextFns.emailCount($"t")).collect()(0)
    assert(counts("see https://a.b/c and http://d.e/f").getLong(0) == 2L)
    assert(counts("see https://a.b/c and http://d.e/f").getLong(1) == 0L)
    assert(counts("x@y.com and a@b.co here").getLong(1) == 2L)
    // the email inside the URL's query string belongs to the URL
    val r = counts("go https://ex.com/a?u=b@c.de now")
    assert(r.getLong(0) == 1L && r.getLong(1) == 0L)
    assert(counts("no links here").getLong(0) == 0L)
  }

  test("portable fnv1a64 matches the DuckDB HUGEINT replay on combining marks and astral chars") {
    // The cross-engine contract is per-CODE-POINT folding. DuckDB's
    // string_split(s, '') emits each code point separately (a combining
    // mark is its own element; unicode() returns 769 for U+0301), so the
    // oracle replay agrees with fnv1a64 even on decomposed text — these
    // constants were produced by running the exact oracle fold
    // (list_reduce + HUGEINT mod-2^64) in DuckDB 1.x on these strings.
    import graft.plans.TextExprs.fnv1a64
    assert(fnv1a64("e\u0301") == 616794170450450931L)   // decomposed e + combining acute
    assert(fnv1a64("\u00e9") == -5808407339572472924L)  // composed é (different hash — no normalization inside the hash)
    assert(fnv1a64(new String(Character.toChars(0x1F600)) + "x") == -3810520219654909243L) // astral: one fold per code point
  }

  test("native expressions are bit-identical to the HOF formulations on real docs") {
    // The native single-pass expressions replaced HOF compositions; this pins
    // them to the original column-algebra definitions over real corpus text
    // (incl. accents/CJK — code-point vs UTF-16 length differences surface here).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").limit(200)
    val hofTokens = filter(split(trim(lower($"text")), "\\s+"), t => length(t) > 0)
    val hofNgrams = {
      val count = greatest(size(hofTokens) - 2, lit(1))
      array_distinct(transform(sequence(lit(0), count - 1),
        i => array_join(slice(hofTokens, i + 1, lit(3)), " ")))
    }
    val mismatches = docs.select(
      TextFns.tokenCount($"text").alias("nat_tc"),
      size(hofTokens).alias("hof_tc"),
      TextFns.meanTokenLen($"text").alias("nat_mtl"),
      when(size(hofTokens) === 0, lit(0.0))
        .otherwise(aggregate(hofTokens, lit(0L), (a, t) => a + length(t)).cast("double") /
          size(hofTokens).cast("double")).alias("hof_mtl"),
      TextFns.fingerprint($"text").alias("nat_fp"),
      aggregate(transform(hofTokens, t => xxhash64(t)), lit(0L),
        (acc, h) => shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(h)
      ).alias("hof_fp"),
      TextFns.charNgramCount($"text", 5).alias("nat_cn"),
      size(TextFns.charNgrams($"text", 5)).alias("hof_cn"),
      TextFns.shingleHashes($"text", 3).alias("nat_sh"),
      transform(hofNgrams, s => xxhash64(s)).alias("hof_sh")
    ).filter(
      $"nat_tc" =!= $"hof_tc" || abs($"nat_mtl" - $"hof_mtl") > 1e-12 ||
      $"nat_fp" =!= $"hof_fp" || $"nat_cn" =!= $"hof_cn" || $"nat_sh" =!= $"hof_sh"
    ).count()
    assert(mismatches == 0)
  }

  test("stripHtml: tags to spaces, entity decode order, malformed markup untouched") {
    import graft.functions.TextFns
    val df = Seq(
      (1L, "<p>a &amp;lt; b</p>"),          // &amp;lt; -> literal "&lt;", not "<"
      (2L, "&quot;x&#39;s&quot; &gt; &lt;"),
      (3L, "plain text"),
      (4L, "unclosed <tag and < alone")      // malformed: no closing > -> untouched
    ).toDF("id", "t")
    val out = df.select($"id", TextFns.stripHtml($"t").as("c"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == " a &lt; b ")
    assert(out(2L) == "\"x's\" > <")
    assert(out(3L) == "plain text")
    assert(out(4L) == "unclosed <tag and < alone")
  }

  test("jaroWinkler: DuckDB-bit-identical constants, boost gate, empties") {
    import graft.functions.TextFns
    // expected doubles are DuckDB jaro_winkler_similarity outputs, repr'd
    // to full precision (round-6 session probe) — equality is EXACT.
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // transposition + boost
      ("dwayne", "duane", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("CRATE", "TRACE", 0.7333333333333334),     // prefix 0: jw == jaro
      // jaro = 2/3 < 0.7: boost gated OFF despite the 5-char prefix
      ("abcdexxxxx", "abcdeyyyyy", 0.6666666666666666),
      ("ab", "ba", 0.0),                           // window 0, no matches
      ("abc", "abc", 1.0),
      ("", "", 0.0), ("a", "", 0.0), ("", "a", 0.0), // DuckDB's empty rule
      ("abc", "xyz", 0.0))
    val df = cases.zipWithIndex
      .map { case ((a, b, e), i) => (i.toLong, a, b, e) }
      .toDF("id", "a", "b", "expect")
    val bad = df.select($"id", TextFns.jaroWinkler($"a", $"b").as("got"), $"expect")
      .filter($"got" =!= $"expect").collect()
    assert(bad.isEmpty, bad.mkString(", "))
    // symmetric
    val sym = df.filter(
      TextFns.jaroWinkler($"a", $"b") =!= TextFns.jaroWinkler($"b", $"a")).count()
    assert(sym == 0)
  }

  test("multiPatternCounts: overlaps, nesting, fail links (ushers), absents") {
    import graft.functions.TextFns
    def counts(text: String, pats: Seq[String]): Seq[Long] =
      Seq(Tuple1(text)).toDF("t")
        .select(TextFns.multiPatternCounts($"t", pats).as("c"))
        .collect()(0).getSeq[Long](0)
    assert(counts("aaaa", Seq("a", "aa", "aaa")) == Seq(4L, 3L, 2L))
    assert(counts("abab", Seq("ab", "ba", "bab", "zz")) == Seq(2L, 1L, 1L, 0L))
    // the classic automaton case: "hers" shares the trie path of "he",
    // "she" ends mid-path — fail links must surface all three
    assert(counts("ushers", Seq("she", "he", "hers", "us")) == Seq(1L, 1L, 1L, 1L))
    assert(counts("", Seq("x")) == Seq(0L))
    intercept[IllegalArgumentException] {
      counts("x", Seq("a", "a"))  // duplicate patterns rejected
    }
  }
}
