package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
    */
  private[plans] def tokenize(s: String): Array[String] =
    s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private val stopwordSets: Array[(String, Set[String])] = Array(
    "en" -> Set("the", "and", "of", "to", "is", "that", "it", "was", "with", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für"),
    "es" -> Set("el", "la", "los", "las", "que", "es", "por", "con", "una", "del"),
    "fr" -> Set("le", "les", "des", "une", "est", "dans", "pour", "qui", "sur", "avec")
  )

  /** Language-ID heuristic (CJK share, else stopword argmax, first-wins
    * ties, "und" on zero hits) — `TextFns.langId` semantics, one pass.
    */
  case class LangIdExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      var cjk = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c >= '一' && c <= '鿿') cjk += 1
        i += 1
      }
      if (cjk * 4 > s.length) return UTF8String.fromString("zh")
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
      while (t < toks.length) { tokChars += toks(t).length; t += 1 }
      val mtl = if (nTok == 0) 0.0 else tokChars.toDouble / nTok
      // punctuation ratio over the raw string: chars outside \p{L}\p{N}\s
      var punct = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (!Character.isLetter(c) && !Character.isDigit(c) && !Character.isWhitespace(c)) punct += 1
        i += 1
      }
      val pr = if (s.isEmpty) 0.0 else punct.toDouble / s.length
      val lenOk = if (nTok >= 10 && nTok <= 100000) 1.0 else 0.0
      val mtlOk = if (mtl >= 2.5 && mtl <= 12.0) 1.0 else 0.0
      val punctOk = if (pr <= 0.2) 1.0 else 0.0
      math.rint((lenOk + mtlOk + punctOk) / 3.0 * 1e6) / 1e6
    }
    override protected def withNewChildInternal(c: Expression): QualityScoreExpr = copy(child = c)
    override def prettyName: String = "quality_score"
  }

  import org.apache.spark.sql.graft.Bridge.{column => asCol, expression => asExpr}

  def langId(c: Column): Column = asCol(LangIdExpr(asExpr(c)))
  def qualityScore(c: Column): Column = asCol(QualityScoreExpr(asExpr(c)))
}
