package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming extension (the reference has NO streaming surface —
  * SURVEY.md §2.6; this is the beyond-parity path for the `events` table).
  *
  * The same transformations run batch or streaming: [[windowedCounts]]
  * takes either a static or a `readStream` frame. Streaming adds the
  * watermark for state eviction — at scale that bound is what keeps the
  * aggregation state finite.
  */
object EventStreams {

  /** Tumbling-window counts + value sums per event_type. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).alias("n"), sum(col("value")).alias("total_value"))
      .select(
        col("window.start").alias("win_start"),
        col("event_type"),
        col("n"),
        col("total_value")
      )

  /** Gap-based sessionization (batch form): a new session starts when a
    * user's inter-event gap exceeds `gapMinutes`. Window-function
    * composition — one shuffle on user_id.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > gapMinutes * 60L,
          1
        ).otherwise(0)
      )
      .withColumn("session_seq", sum(col("new_session")).over(w))
      .withColumn("session_id", concat_ws("-", col("user_id"), col("session_seq")))
  }

  /** Run the windowed aggregation as an actual streaming query over a
    * parquet directory (FileStreamSource requires a directory or glob, not
    * a single file), draining it synchronously into a memory sink (the
    * local smoke pattern); returns the materialized result.
    */
  def runStreamingSmoke(spark: SparkSession, parquetPath: String, queryName: String): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val raw = spark.readStream.schema(schema).parquet(parquetPath)
    // Under spark.sql.legacy.parquet.nanosAsLong a TIMESTAMP(NANOS) column
    // arrives as int64 nanos; rebuild the microsecond timestamp (integer
    // division — a double div would lose precision on int64 nanos).
    val stream =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val q = windowedCounts(stream).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
