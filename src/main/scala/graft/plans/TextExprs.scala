package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-analysis expressions. The Column-HOF formulations in
  * [[graft.functions.TextFns]] re-tokenize the document for every derived
  * quantity and evaluate lambdas interpreted (no codegen, no subexpression
  * elimination across higher-order functions) — measured ~1 ms/doc for
  * langId+quality. These do one pass over the string in JIT'd Scala.
  *
  * Semantics match the TextFns definitions exactly (same tokenizer, same
  * stopword sets, same tie-breaks) — the specs in TextFnsSpec pin them.
  */
object TextExprs {

  /** Tokenizer shared by the native expressions: lowercase, trim,
    * whitespace-split, drop empties — identical to `TextFns.tokens`.
    * Locale.ROOT: a cluster executor with e.g. a Turkish default locale
    * would otherwise lowercase "IT" to dotless "ıt", silently changing
    * stopword hits and shingle hashes per machine.
    */
  private[plans] def tokenize(s: String): Array[String] =
    s.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  /** Single source of truth for the marker stopword sets is
    * [[graft.functions.TextFns.StopwordSets]] (the public surface);
    * derived here in lookup form.
    */
  private lazy val stopwordSets: Array[(String, Set[String])] =
    graft.functions.TextFns.StopwordSets.map { case (l, ws) => (l, ws.toSet) }.toArray

  /** Language-ID heuristic (CJK share, else stopword argmax, first-wins
    * ties, "und" on zero hits) — `TextFns.langId` semantics, one pass.
    */
  case class LangIdExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      // code-point iteration (not UTF-16 units): `length()`/regex on the
      // HOF side and the DuckDB oracle both count code points, and astral
      // chars must count once, not twice
      var cjk = 0
      var nCp = 0
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
        nCp += 1
        i += Character.charCount(cp)
      }
      if (cjk * 4 > nCp) return UTF8String.fromString("zh")
      val toks = tokenize(s)
      var best = -1
      var bestHits = 0
      var l = 0
      while (l < stopwordSets.length) {
        val set = stopwordSets(l)._2
        var hits = 0
        var t = 0
        while (t < toks.length) { if (set.contains(toks(t))) hits += 1; t += 1 }
        if (hits > bestHits) { bestHits = hits; best = l }
        l += 1
      }
      UTF8String.fromString(if (best >= 0) stopwordSets(best)._1 else "und")
    }
    override protected def withNewChildInternal(c: Expression): LangIdExpr = copy(child = c)
    override def prettyName: String = "lang_id"
  }

  /** Composite quality score — `TextFns.qualityScore` semantics (C4/Gopher
    * rule mix: token count in range, mean token length in range, punctuation
    * ratio bounded; each 0/1, averaged, rounded to 6 decimals), one pass.
    */
  case class QualityScoreExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val toks = tokenize(s)
      val nTok = toks.length
      var tokChars = 0L
      var t = 0
      while (t < toks.length) { tokChars += toks(t).codePointCount(0, toks(t).length); t += 1 }
      val mtl = if (nTok == 0) 0.0 else tokChars.toDouble / nTok
      // punctuation ratio over the raw string: CODE POINTS outside
      // \p{L}\p{N}\s, with the regex classes' exact semantics (\p{N} =
      // Nd|Nl|No, \s = the six ASCII space chars) and a code-point
      // denominator -- agrees with the HOF punctRatio (regexp_replace +
      // length, both code-point based) and the DuckDB oracle, including on
      // astral chars (an astral letter is one letter, not two surrogates)
      var punct = 0
      var nCp = 0
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val ty = Character.getType(cp)
        val isNum = ty == Character.DECIMAL_DIGIT_NUMBER || ty == Character.LETTER_NUMBER ||
          ty == Character.OTHER_NUMBER
        val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
        if (!Character.isLetter(cp) && !isNum && !isWs) punct += 1
        nCp += 1
        i += Character.charCount(cp)
      }
      val pr = if (nCp == 0) 0.0 else punct.toDouble / nCp
      val lenOk = if (nTok >= 10 && nTok <= 100000) 1.0 else 0.0
      val mtlOk = if (mtl >= 2.5 && mtl <= 12.0) 1.0 else 0.0
      val punctOk = if (pr <= 0.2) 1.0 else 0.0
      math.rint((lenOk + mtlOk + punctOk) / 3.0 * 1e6) / 1e6
    }
    override protected def withNewChildInternal(c: Expression): QualityScoreExpr = copy(child = c)
    override def prettyName: String = "quality_score"
  }

  /** xxhash64 of a token's UTF-8 bytes, seed 42 — bit-identical to
    * `functions.xxhash64(stringCol)`, so hashes interoperate with any
    * HOF-produced hash column.
    */
  private[plans] def xxh64(tok: String): Long = {
    val u = UTF8String.fromString(tok)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  /** FNV-1a 64-bit over a token's Unicode CODE POINTS (not UTF-8 bytes or
    * UTF-16 units): h = fold(cp, h -> (h ^ cp) * 0x100000001b3), offset
    * basis 0xcbf29ce484222325, wrapping 64-bit arithmetic. The PORTABLE
    * hash: unlike xxhash64 it is reproducible in plain SQL on any engine
    * with 128-bit integers (the DuckDB oracle replays it via HUGEINT
    * mod-2^64 folds), so fingerprint/simhash outputs built on it are
    * exactly verifiable cross-engine. Code points (not bytes) keep the SQL
    * side trivial (`unicode(ch)`) and astral-char handling identical.
    */
  private[graft] def fnv1a64(tok: String): Long = {
    var h = -3750763034362895579L // 0xcbf29ce484222325
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      h = (h ^ cp) * 1099511628211L
      i += Character.charCount(cp)
    }
    h
  }

  /** Whitespace token count — `size(TextFns.tokens(c))` semantics. */
  case class TokenCountExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any =
      tokenize(input.asInstanceOf[UTF8String].toString).length
    override protected def withNewChildInternal(c: Expression): TokenCountExpr = copy(child = c)
    override def prettyName: String = "token_count"
  }

  /** Mean token length in code points; 0.0 when no tokens — matches the
    * HOF `aggregate(toks, 0L, acc + length(t)) / size(toks)` formulation
    * (Spark's `length` counts code points, so `codePointCount` here, not
    * UTF-16 `String.length`).
    */
  case class MeanTokenLenExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String].toString)
      if (toks.length == 0) 0.0
      else {
        var sum = 0L
        var i = 0
        while (i < toks.length) { sum += toks(i).codePointCount(0, toks(i).length); i += 1 }
        sum.toDouble / toks.length
      }
    }
    override protected def withNewChildInternal(c: Expression): MeanTokenLenExpr = copy(child = c)
    override def prettyName: String = "mean_token_len"
  }

  /** English-stopword share of tokens; 0.0 when no tokens —
    * `TextFns.stopwordRatio` semantics (fluent prose ~0.3-0.6; keyword
    * spam / tabular junk near 0), one pass.
    */
  case class StopwordRatioExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    private val en = stopwordSets(0)._2
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String].toString)
      if (toks.length == 0) 0.0
      else {
        var hits = 0
        var i = 0
        while (i < toks.length) { if (en.contains(toks(i))) hits += 1; i += 1 }
        hits.toDouble / toks.length
      }
    }
    override protected def withNewChildInternal(c: Expression): StopwordRatioExpr = copy(child = c)
    override def prettyName: String = "stopword_ratio"
  }

  /** Rotate-XOR rolling fingerprint over token hashes — `TextFns.fingerprint`
    * semantics: fold(h(tok), acc -> rotl(acc, 5) ^ h), acc0 = 0. The token
    * hash is xxhash64 (seed 42, fastest) or, with `portable = true`,
    * [[fnv1a64]] — bit-identical to the DuckDB oracle's HUGEINT replay, so
    * the portable form is exactly verifiable cross-engine.
    */
  case class FingerprintExpr(child: Expression, portable: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String].toString)
      var acc = 0L
      var i = 0
      while (i < toks.length) {
        val h = if (portable) fnv1a64(toks(i)) else xxh64(toks(i))
        acc = ((acc << 5) | (acc >>> 59)) ^ h
        i += 1
      }
      acc
    }
    override protected def withNewChildInternal(c: Expression): FingerprintExpr = copy(child = c)
    override def prettyName: String = "doc_fingerprint"
  }

  /** Count of DISTINCT character n-grams, windowed over code points (the
    * HOF `size(array_distinct(transform(sequence(...), i -> substr(i, n))))`
    * materializes the whole shingle array per doc just to count it — this
    * slides one window and counts into a hash set).
    */
  case class CharNgramCountExpr(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n > 0, s"ngram size must be positive, got $n")
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      // code-point index -> char offset (substr/length are code-point-based)
      val nCp = s.codePointCount(0, s.length)
      if (nCp < n) return 0
      val off = new Array[Int](nCp + 1)
      var ci = 0
      var cp = 0
      while (cp < nCp) { off(cp) = ci; ci = s.offsetByCodePoints(ci, 1); cp += 1 }
      off(nCp) = s.length
      val seen = new java.util.HashSet[String]((nCp - n + 1) * 2)
      var i = 0
      while (i <= nCp - n) { seen.add(s.substring(off(i), off(i + n))); i += 1 }
      seen.size
    }
    override protected def withNewChildInternal(c: Expression): CharNgramCountExpr = copy(child = c)
    override def prettyName: String = "char_ngram_count"
  }

  /** Distinct word n-gram xxhash64s in first-occurrence order —
    * `TextFns.shingleHashes` semantics, incl. the shorter-than-n whole-doc
    * shingle (so every doc has >= 1 shingle; zero tokens hash ""). This is
    * the minhash/Jaccard input: fusing tokenize+shingle+hash into one pass
    * avoids materializing the O(tokens) string array through three
    * interpreted HOFs per doc.
    *
    * Codegen note: a `doGenCode` static-call form was implemented and A/B
    * measured (6 interleaved runs at sf0.1): no win on q33/q34 — slightly
    * negative by min, a wash by median — because the O(tokens) kernel
    * dwarfs the per-row dispatch this would save. Kept as CodegenFallback;
    * the kernel lives in [[Kernels]] where the generated path (CosineSim,
    * which DID win) shares the same pattern.
    */
  case class ShingleHashesExpr(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n > 0, s"ngram size must be positive, got $n")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.shingleHashes(input.asInstanceOf[UTF8String], n)
    override protected def withNewChildInternal(c: Expression): ShingleHashesExpr = copy(child = c)
    override def prettyName: String = "shingle_hashes"
  }

  /** Per-token hashes, order and multiplicity preserved — the SimHash
    * input (`transform(tokens(c), xxhash64)` semantics; `portable = true`
    * swaps in [[fnv1a64]] for cross-engine verifiability).
    */
  case class TokenHashesExpr(child: Expression, portable: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String].toString)
      val out = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) {
        out(i) = if (portable) fnv1a64(toks(i)) else xxh64(toks(i))
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): TokenHashesExpr = copy(child = c)
    override def prettyName: String = "token_hashes"
  }

  /** Unicode normalization (NFC/NFD/NFKC/NFKD via `java.text.Normalizer`)
    * — the canonical first step of any multilingual corpus pipeline:
    * without it, precomposed "é" (U+00E9) and "e"+combining-acute
    * (U+0065 U+0301) are different strings to every downstream dedup
    * hash, shingle, and token counter. NFC is the interchange default;
    * NFKC additionally folds compatibility forms (ligatures, full-width
    * digits) and is the usual choice before tokenization.
    *
    * Pure per-row narrow transform: no shuffle, pushdown-transparent.
    */
  case class NormalizeExpr(child: Expression, form: String)
      extends UnaryExpression with CodegenFallback {
    private val nf = java.text.Normalizer.Form.valueOf(form.toUpperCase(java.util.Locale.ROOT))
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(
        java.text.Normalizer.normalize(input.asInstanceOf[UTF8String].toString, nf))
    override protected def withNewChildInternal(c: Expression): NormalizeExpr = copy(child = c)
    override def prettyName: String = s"normalize_${form.toLowerCase(java.util.Locale.ROOT)}"
  }

  /** [[fnv1a64]] of the WHOLE string (no tokenization) — the portable
    * value hash for sketch bucketing (HLL registers, hashed features):
    * reproducible in plain SQL via the HUGEINT mod-2^64 fold, unlike
    * xxhash64. Narrow per-row transform.
    */
  case class Fnv64Expr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      fnv1a64(input.asInstanceOf[UTF8String].toString)
    override protected def withNewChildInternal(c: Expression): Fnv64Expr = copy(child = c)
    override def prettyName: String = "fnv64"
  }

  /** Jaro-Winkler similarity of two strings — the fuzzy-match score for
    * entity resolution where edit distance is too coarse (it has no
    * notion of prefix weight or transposition locality). Semantics and
    * IEEE op order pinned to DuckDB's `jaro_winkler_similarity` in
    * [[Kernels.jaroWinkler]]. Generates code (one static kernel call):
    * like [[VectorExprs.CosineSim]] this sits inside blocked-join
    * conditions, the hottest expression position.
    */
  case class JaroWinklerExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler requires string arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    override def nullSafeEval(l: Any, r: Any): Any =
      Kernels.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.plans.Kernels.jaroWinkler($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerExpr =
      copy(left = l, right = r)
    override def prettyName: String = "jaro_winkler"
  }

  /** Aho-Corasick automaton over UTF-16 code units: goto trie + BFS fail
    * links with per-node merged output lists. Built once per expression
    * instance (lazily, on the executor after deserialization) and reused
    * across every row — the point of the algorithm: one pass over the
    * text counts ALL patterns, vs N separate scans for N `instr`-style
    * probes. Occurrence counting includes overlaps and nested matches
    * ("aa" occurs 3x in "aaaa"; "a" and "aa" both count independently),
    * the standard automaton semantics.
    */
  private[plans] final class AhoCorasick(patterns: Array[String])
      extends Serializable {
    private val (gotoArr, fail, out) = {
      val gotoB = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.HashMap.empty[Char, Int])
      val failB = scala.collection.mutable.ArrayBuffer(0)
      val outB = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
      patterns.zipWithIndex.foreach { case (p, pi) =>
        var v = 0
        p.foreach { c =>
          v = gotoB(v).getOrElseUpdate(c, {
            gotoB += scala.collection.mutable.HashMap.empty[Char, Int]
            failB += 0; outB += Nil
            gotoB.size - 1
          })
        }
        outB(v) = pi :: outB(v)
      }
      val queue = scala.collection.mutable.Queue.empty[Int]
      gotoB(0).valuesIterator.foreach { u => failB(u) = 0; queue += u }
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        gotoB(v).foreach { case (c, u) =>
          queue += u
          var f = failB(v)
          while (f != 0 && !gotoB(f).contains(c)) f = failB(f)
          val t = gotoB(f).getOrElse(c, 0)
          failB(u) = if (t != u) t else 0
          // BFS order: failB(u) is shallower, its output list is final
          outB(u) = outB(u) ++ outB(failB(u))
        }
      }
      (gotoB.map(_.toMap).toArray, failB.toArray, outB.map(_.toArray).toArray)
    }

    def countInto(text: String, counts: Array[Long]): Unit = {
      var state = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (state != 0 && !gotoArr(state).contains(c)) state = fail(state)
        state = gotoArr(state).getOrElse(c, 0)
        val o = out(state)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1; j += 1 }
        i += 1
      }
    }
  }

  /** Occurrence counts of N fixed patterns in one text pass
    * (Aho-Corasick): returns `array<long>` aligned with `patterns`.
    * Overlapping and nested occurrences all count — exactly what a
    * per-position substring-equality scan would find, which is what the
    * cross-engine oracle replays. The multi-pattern blocklist/leakage
    * probe: at N patterns this is one automaton walk per document where
    * N `instr` probes would be N scans.
    */
  case class MultiPatternCountExpr(child: Expression, patterns: Seq[String])
      extends UnaryExpression with CodegenFallback {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    require(patterns.distinct.size == patterns.size,
      "patterns must be distinct (counts are per-pattern)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val ac = new AhoCorasick(patterns.toArray)
    override def nullSafeEval(input: Any): Any = {
      val counts = new Array[Long](patterns.size)
      ac.countInto(input.asInstanceOf[UTF8String].toString, counts)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
    }
    override protected def withNewChildInternal(c: Expression): MultiPatternCountExpr =
      copy(child = c)
    override def prettyName: String = "multi_pattern_counts"
  }

  import org.apache.spark.sql.graft.Bridge.{column => asCol, expression => asExpr}

  def langId(c: Column): Column = asCol(LangIdExpr(asExpr(c)))
  def qualityScore(c: Column): Column = asCol(QualityScoreExpr(asExpr(c)))
  def tokenCount(c: Column): Column = asCol(TokenCountExpr(asExpr(c)))
  def stopwordRatio(c: Column): Column = asCol(StopwordRatioExpr(asExpr(c)))
  def meanTokenLen(c: Column): Column = asCol(MeanTokenLenExpr(asExpr(c)))
  def fingerprint(c: Column, portable: Boolean = false): Column =
    asCol(FingerprintExpr(asExpr(c), portable))
  def charNgramCount(c: Column, n: Int): Column = asCol(CharNgramCountExpr(asExpr(c), n))
  def shingleHashes(c: Column, n: Int): Column = asCol(ShingleHashesExpr(asExpr(c), n))
  def tokenHashes(c: Column, portable: Boolean = false): Column =
    asCol(TokenHashesExpr(asExpr(c), portable))
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    asCol(NormalizeExpr(asExpr(c), form))
  def fnv64(c: Column): Column = asCol(Fnv64Expr(asExpr(c)))
  def jaroWinkler(a: Column, b: Column): Column =
    asCol(JaroWinklerExpr(asExpr(a), asExpr(b)))
  def multiPatternCounts(c: Column, patterns: Seq[String]): Column =
    asCol(MultiPatternCountExpr(asExpr(c), patterns))

  /** SQL-name → builder table for the unary text expressions (see
    * [[VectorExprs.sqlFunctions]]; the arity-2 forms stay Column-API-only
    * — their non-expression parameters are constructor Ints/Strings).
    */
  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "lang_id" -> (es => LangIdExpr(es.head)),
    "quality_score" -> (es => QualityScoreExpr(es.head)),
    "token_count" -> (es => TokenCountExpr(es.head)),
    "stopword_ratio" -> (es => StopwordRatioExpr(es.head)),
    "mean_token_len" -> (es => MeanTokenLenExpr(es.head)),
    "fnv64" -> (es => Fnv64Expr(es.head)),
    "jaro_winkler" -> (es => JaroWinklerExpr(es(0), es(1))))

  /** SQL-name registration (same pattern as [[VectorExprs.register]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctions.foreach { case (n, b) =>
      reg.createOrReplaceTempFunction(n, b, "built-in")
    }
  }
}
