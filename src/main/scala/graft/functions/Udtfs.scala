package graft.functions

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.StructType

/** User-facing TABLE functions (UDTFs) — the generator tier of the UDF
  * family, completing it the way [[Udafs]] completed aggregates. The
  * reference's UDF surface registers scalar functions only and its value
  * bridge is a stub (`/root/reference/src/main.rs:598-636`); a table
  * function (one input row → N output rows) has no reference counterpart
  * at all, yet it is the natural packaging for tokenizers, shinglers and
  * span extractors in a data pipeline. Implemented the Spark-native way:
  * a Catalyst [[Generator]] expression, planned by `GenerateExec` exactly
  * like the built-in `explode`/`posexplode` — per-partition streaming, no
  * driver involvement, LATERAL VIEW-able from SQL.
  *
  * Scale shape: a generator is a row-local flatMap — no shuffle, no
  * state; output fan-out lands in the same task, so a UDTF keeps whatever
  * partitioning discipline the surrounding plan already has. The closure
  * runs interpreted (CodegenFallback, like every HOF lambda); the
  * conversion in/out goes through the standard Catalyst converters once
  * per row, not per emitted element.
  */
object Udtfs {

  /** The generator expression: evaluates `children`, hands the Scala
    * values to `fn`, and emits each returned value sequence as one output
    * row of `elementSchema`.
    */
  case class GraftGenerator(
      name: String,
      override val elementSchema: StructType,
      fn: Seq[Any] => Iterator[Seq[Any]],
      children: Seq[Expression],
      declaredArity: Int = -1)
    extends Expression with Generator with CodegenFallback {

    // fail at ANALYSIS time on wrong argument count: without this a SQL
    // call with the wrong arity hands raw values to the user closure and
    // dies mid-execution with a ClassCastException deep in a task
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (declaredArity >= 0 && children.length != declaredArity)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$name expects $declaredArity argument(s), got ${children.length}")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

    @transient private lazy val inConv =
      children.map(c => Bridge.toScalaConverter(c.dataType))
    @transient private lazy val outConv =
      Bridge.toCatalystConverter(elementSchema)

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val args = children.lazyZip(inConv).map((c, conv) => conv(c.eval(input)))
      fn(args).map(vals => outConv(Row.fromSeq(vals)).asInstanceOf[InternalRow])
    }

    override def toString: String = s"$name(${children.mkString(", ")})"

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  /** Handle mirroring [[Udfs.GraftUdf]]: the declared row schema plus a
    * Column-side invocation (`df.select(g(col))` plans a Generate node —
    * Spark's analyzer lifts a generator in a select list the same way it
    * lifts `explode`).
    */
  case class GraftUdtf(name: String, elementSchema: StructType,
      fn: Seq[Any] => Iterator[Seq[Any]], arity: Int = -1) {
    def apply(args: Column*): Column =
      Bridge.column(GraftGenerator(name, elementSchema, fn,
        args.map(Bridge.expression), arity))
  }

  /** `define-udtf`: register a table function under `name` for SQL use
    * (`... LATERAL VIEW name(cols) t AS a, b` or `SELECT name(col) FROM`)
    * and return the handle for Column-side calls. `fn` receives the
    * argument values (Scala-side: String, Long, Seq, …) of ONE input row
    * and returns an iterator of output rows, each a value sequence
    * matching `elementSchema`. Registration is idempotent
    * (createOrReplace), matching [[Udafs.register]]'s contract.
    */
  def defineUdtf(spark: SparkSession, name: String, elementSchema: StructType,
      fn: Seq[Any] => Iterator[Seq[Any]], arity: Int = -1): GraftUdtf = {
    // source must be one of Spark's enumerated kinds; "scala_udf" is the
    // one that describes a JVM-closure-backed function
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, es => GraftGenerator(name, elementSchema, fn, es, arity), "scala_udf")
    GraftUdtf(name, elementSchema, fn, arity)
  }
}
