package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar expression surface (SURVEY.md §2.4), re-expressed
  * over `org.apache.spark.sql.Column`. Each member cites its registration
  * site in `/root/reference/src/main.rs`.
  *
  * All of these build Catalyst expression trees that stay inside
  * whole-stage codegen — no UDFs.
  */
object ColFns {

  /** `col` — `/root/reference/src/main.rs:38-40,497`. */
  def column(name: String): Column = col(name)

  /** `alias` — `/root/reference/src/main.rs:42-44,519`. */
  def alias(c: Column, name: String): Column = c.alias(name)

  /** `lit` — capability superset; the reference exposes NO literal
    * constructor (SURVEY.md §2.4 "Notable absences"), making most real
    * predicates unwritable. Any practical engine needs it.
    */
  def literal(v: Any): Column = lit(v)

  // --- variadic arithmetic: left-folds, arity >= 1 -------------------------
  // `col+ col- col* col/` — /root/reference/src/main.rs:307-377,498-501.
  // The reference `stop!`s on arity 0 (src/main.rs:308-310); we require
  // nonEmpty for the same contract.

  def add(cs: Column*): Column = { require(cs.nonEmpty, "col+ needs >=1 arg"); cs.reduce(_ + _) }
  def sub(cs: Column*): Column = { require(cs.nonEmpty, "col- needs >=1 arg"); cs.reduce(_ - _) }
  def mul(cs: Column*): Column = { require(cs.nonEmpty, "col* needs >=1 arg"); cs.reduce(_ * _) }
  def div(cs: Column*): Column = { require(cs.nonEmpty, "col/ needs >=1 arg"); cs.reduce(_ / _) }

  // --- boolean / comparison ------------------------------------------------

  /** `col/and` — `src/main.rs:46-48,502`. */
  def and(l: Column, r: Column): Column = l && r

  /** `col/or` — `src/main.rs:50-52,503`. */
  def or(l: Column, r: Column): Column = l || r

  /** `col>=` — `src/main.rs:58-60,504`. */
  def geq(l: Column, r: Column): Column = l >= r

  /** `col<=` — `src/main.rs:54-56,505`. */
  def leq(l: Column, r: Column): Column = l <= r

  /** `col>` — `src/main.rs:62-64,506`. */
  def gt(l: Column, r: Column): Column = l > r

  /** `col<` — `src/main.rs:66-68,507`. The reference has a copy-paste bug
    * here: its `lt` delegates to `Expr::gt`, so `col<` computes `>`.
    * We implement the evidently intended `<` (the DataFusion `Expr::lt`
    * the author meant exists); ColFnsSpec documents the divergence.
    */
  def lt(l: Column, r: Column): Column = l < r

  /** `col=` — `src/main.rs:70-72,508`. SQL `=`: null-propagating (NOT the
    * null-safe `<=>`).
    */
  def eq(l: Column, r: Column): Column = l === r

  /** `col!=` — `src/main.rs:74-76,509`. */
  def neq(l: Column, r: Column): Column = l =!= r

  // --- LIKE family ----------------------------------------------------------
  // The reference passes the *pattern as an expression* (no literal ctor
  // exists), so we use the function form `like(str, pattern)` which accepts
  // a Column pattern, rather than `Column.like(String)`.

  /** `col/like` — `src/main.rs:78-80,510` (case-sensitive SQL LIKE). */
  def like(l: Column, pattern: Column): Column = call_function("like", l, pattern)

  /** `col/ilike` — `src/main.rs:82-84,511` (case-insensitive LIKE). */
  def ilike(l: Column, pattern: Column): Column = call_function("ilike", l, pattern)

  /** `col/not-like` — `src/main.rs:86-88,512`. */
  def notLike(l: Column, pattern: Column): Column = !like(l, pattern)

  /** `col/not-ilike` — `src/main.rs:90-92,513`. */
  def notIlike(l: Column, pattern: Column): Column = !ilike(l, pattern)

  // --- CASE builder ----------------------------------------------------------
  // Mirrors the reference's fluent CaseBuilder (`src/main.rs:110-136`):
  // simple CASE (`col/case` on a base expr) and searched CASE (`case/when`),
  // extended with `case/with-when`, closed by `case/otherwise` or `case/end`
  // (END without ELSE => implicit NULL, which Spark's unclosed `when` chain
  // already yields).

  /** Immutable builder; each call returns a new builder (same discipline as
    * the reference's persistent Steel values).
    */
  final case class CaseBuilder private[functions] (
      base: Option[Column],
      branches: Vector[(Column, Column)]
  ) {

    /** `case/with-when` — `src/main.rs:122-124,517`. For a simple CASE the
      * `whenValue` is compared `=` to the base expr (desugared to searched
      * form — Spark's Column API has no simple-case builder).
      */
    def when(whenValue: Column, thenValue: Column): CaseBuilder =
      copy(branches = branches :+ (whenValue, thenValue))

    private def searched: Vector[(Column, Column)] = base match {
      case Some(b) => branches.map { case (w, t) => (b === w, t) }
      case None    => branches
    }

    private def chain: Column = {
      val bs = searched
      require(bs.nonEmpty, "CASE with no WHEN branch")
      bs.tail.foldLeft(org.apache.spark.sql.functions.when(bs.head._1, bs.head._2)) {
        case (acc, (c, t)) => acc.when(c, t)
      }
    }

    /** `case/otherwise` — `src/main.rs:126-131,518`. */
    def otherwise(e: Column): Column = chain.otherwise(e)

    /** `case/end` — `src/main.rs:133-135,516`: close without ELSE => NULL. */
    def end: Column = chain
  }

  /** `col/case` — `src/main.rs:114-116,514`: simple CASE `CASE base WHEN ...`. */
  def caseOf(base: Column): CaseBuilder = CaseBuilder(Some(base), Vector.empty)

  /** `case/when` — `src/main.rs:118-120,515`: searched CASE. */
  def caseWhen(cond: Column, value: Column): CaseBuilder =
    CaseBuilder(None, Vector((cond, value)))

  // --- sort expression constructors -----------------------------------------
  // The reference declares SSortExpr (`src/main.rs:95-97`) but registers no
  // constructor (SURVEY.md §2.4) — we implement the intended surface.
  // DataFusion's default sort is ASC NULLS LAST; Spark's bare `.asc` is
  // nulls-first, so defaults must be explicit.

  def asc(c: Column): Column = c.asc_nulls_last
  def desc(c: Column): Column = c.desc_nulls_first
  def sortExpr(c: Column, ascending: Boolean, nullsFirst: Boolean): Column =
    (ascending, nullsFirst) match {
      case (true, true)   => c.asc_nulls_first
      case (true, false)  => c.asc_nulls_last
      case (false, true)  => c.desc_nulls_first
      case (false, false) => c.desc_nulls_last
    }
}
