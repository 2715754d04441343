package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{BinaryExprs, TextExprs, VectorExprs}

/** Spark extensions entry point: registers every graft SQL function
  * (vector similarity, text quality, binary-payload features) into ANY
  * session built with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — `spark-sql` / Thrift / notebook sessions get the functions without a
  * single line of Scala, the idiomatic Spark packaging for a library's SQL
  * surface (the same hook third-party engines like Delta use). The
  * per-session `TextExprs/VectorExprs/BinaryExprs.register(spark)` calls
  * stay for programmatic use; both paths read one shared builder table per
  * expression module, so the SQL and Column APIs cannot drift apart.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {
  /** Every SQL-callable graft function: (name, builder). */
  val all: Seq[(String, Seq[Expression] => Expression)] =
    VectorExprs.sqlFunctions ++ BinaryExprs.sqlFunctions ++ TextExprs.sqlFunctions

  require(all.map(_._1).distinct.size == all.size,
    s"duplicate graft SQL function names: ${all.map(_._1)}")
}
