package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 made `Column` a
  * ColumnNode wrapper and gated the classic converters `private[sql]`;
  * libraries that ship custom Catalyst expressions expose them through a
  * small shim in an `org.apache.spark.sql` subpackage (the established
  * extension pattern). This is the only file that lives outside the
  * `graft` namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
