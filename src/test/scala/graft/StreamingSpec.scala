package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Structured Streaming extension: the same windowed aggregation runs batch
  * and streaming and produces identical results on the driver testdata.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val eventsPath = "/root/testdata/sf0.001/events.parquet"

  private def loadBatch = {
    val df = spark.read.parquet(eventsPath)
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  test("windowedCounts batch: one row per (hour, event_type), counts sum to total") {
    val out = EventStreams.windowedCounts(loadBatch)
    val total = out.agg(sum($"n")).collect()(0).getLong(0)
    assert(total == loadBatch.count())
    assert(out.select($"win_start", $"event_type").distinct().count() == out.count())
  }

  test("streaming smoke over parquet matches the batch aggregation") {
    // FileStreamSource needs a directory: stage the single file into one.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(eventsPath),
      java.nio.file.Paths.get(dir, "events.parquet"))
    // Compare on rounded sums: streaming and batch accumulate doubles in
    // different orders, so raw total_value can differ in the last ulp.
    val streamed = EventStreams.runStreamingSmoke(spark, dir, "graft_stream_test")
      .select($"win_start", $"event_type", $"n", round($"total_value", 4).as("tv"))
    val batch = EventStreams.windowedCounts(loadBatch)
      .select($"win_start", $"event_type", $"n", round($"total_value", 4).as("tv"))
    // Append mode emits only watermark-finalized windows: every emitted row
    // must match batch exactly, and the only batch rows allowed to be
    // missing are trailing windows the watermark never passed.
    assert(streamed.exceptAll(batch).count() == 0)
    val maxTs = loadBatch.agg(max($"ts")).collect()(0).getTimestamp(0)
    val withheld = batch.exceptAll(streamed)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 2 * 3600 * 1000)
    assert(withheld.filter($"win_start" < cutoff).count() == 0)
    assert(streamed.count() > 0)
  }

  test("sessionize: gap splits sessions per user") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val df = Seq(
      (1L, at(0)), (1L, at(10)), (1L, at(100)), // gap 90min > 30 => 2 sessions
      (2L, at(0))
    ).toDF("user_id", "ts")
    val out = EventStreams.sessionize(df, gapMinutes = 30)
      .groupBy($"user_id").agg(max($"session_seq").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }
}
