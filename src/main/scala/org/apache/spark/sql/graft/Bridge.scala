package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Rewrap a (checkpointed) frame so its `LogicalRDD` carries NO
    * origin statistics. `Dataset.checkpoint`/`localCheckpoint`
    * deliberately propagate the source plan's stats through the
    * checkpoint (`originStats`), so in a SELF-JOINING iterative loop the
    * propagated `sizeInBytes` SQUARES every round — after ~20 rounds it
    * is a million-digit BigInt and Catalyst's size estimation spends
    * MINUTES in BigInteger multiplies (observed wedging q349's parity
    * BFS at sf0.1). Rebuilding from the executed RDD resets the estimate
    * to the conservative default each round; AQE re-derives real sizes
    * at runtime, so join strategy is unaffected where it matters.
    */
  def withoutOriginStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    spark.internalCreateDataFrame(
      classic.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** The optimizer-visible sizeInBytes estimate of a frame. */
  def statsSizeInBytes(df: DataFrame): BigInt =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.optimizedPlan.stats.sizeInBytes

  /** Arrow-batch interchange, both directions (the reference's
    * RecordBatch surface made inspectable AND distributed). Spark keeps
    * `toArrowBatchRdd` / `ArrowConverters` private[sql] — they exist for
    * the Python/R bridges — so the shim lives here with the other
    * boundary crossings. Encode/decode share the session's Arrow confs
    * (timezone, large-var-types), which is what makes the round trip
    * lossless; each PARTITION becomes a stream of Arrow IPC record
    * batches, so neither direction ever funnels through the driver.
    */
  def toArrowBatchRdd(df: DataFrame): org.apache.spark.rdd.RDD[Array[Byte]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .toArrowBatchRdd

  def fromArrowBatchRdd(
      spark: org.apache.spark.sql.SparkSession,
      batches: org.apache.spark.rdd.RDD[Array[Byte]],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val tz = s.sessionState.conf.sessionLocalTimeZone
    val largeVar = s.sessionState.conf.arrowUseLargeVarTypes
    val rows = batches.mapPartitions { it =>
      org.apache.spark.sql.execution.arrow.ArrowConverters.fromBatchIterator(
        it, schema, tz, true, largeVar, org.apache.spark.TaskContext.get())
    }
    s.internalCreateDataFrame(rows, schema, isStreaming = false)
  }

  /** Catalyst <-> Scala value converters for custom expressions that
    * surface external values (the UDTF generator hands row values to a
    * user closure) — CatalystTypeConverters sits behind the sql package
    * boundary, hence exposed here like the Column converters above.
    */
  def toScalaConverter(dt: org.apache.spark.sql.types.DataType): Any => Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters.createToScalaConverter(dt)
  def toCatalystConverter(dt: org.apache.spark.sql.types.DataType): Any => Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters.createToCatalystConverter(dt)
}
