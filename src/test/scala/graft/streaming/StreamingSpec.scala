package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.ParseStage
import graft.sources.Tables

/** Streaming pipeline == batch pipeline on a finite input (memory sink,
  * processAllAvailable).
  */
class StreamingSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-stream").toString
    spark.createDataset(Tables.localTurns(2000)).write.mode("overwrite").parquet(d)
    d
  }

  test("streaming windowed status counts equal the batch aggregation") {
    val stream = StreamingPipeline.readTranscriptStream(spark, dir)
    val q = StreamingPipeline.windowedStatusCounts(stream)
      .writeStream.format("memory").queryName("win_counts").outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("win_counts").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    val batch = ParseStage.parse(spark.read.parquet(dir))
      .groupBy(window(col("log_ts"), "10 minutes"), col("status"))
      .agg(count(lit(1)).as("cnt"), sum(col("bytes_sent")).as("bytes"))
      .select(col("window.start"), col("status"), col("cnt"), col("bytes"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    assert(streamed == batch)
  }

  test("streaming counter ticks: deltas per batch, final snapshot equals the batch counter (A3)") {
    import graft.app.CounterReport
    val stream = spark.readStream.schema(StreamingPipeline.transcriptSchema)
      .option("maxFilesPerTrigger", "1") // force multiple micro-batches = multiple ticks
      .parquet(dir)
    val reports = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = StreamingPipeline.counterTicks(stream, r => reports.synchronized { reports += r })
    try q.processAllAvailable() finally q.stop()
    assert(reports.length > 1, "expected several ticks (one per micro-batch)")
    assert(!reports.head.contains("(+")) // first tick has no previous snapshot
    assert(reports.tail.exists(_.contains("(+"))) // later ticks render deltas
    // the last tick's cumulative totals == the one-shot batch snapshot
    val batchSnap = CounterReport.snapshot(
      ParseStage.parse(spark.read.parquet(dir)))
    val lastNoDelta = CounterReport.format(batchSnap, None)
    val lastTickTotals = reports.last.linesIterator
      .filter(_.startsWith("Total")).map(_.replaceAll("""\s*\(\+?-?\d+\)""", "")).toSeq
    val batchTotals = lastNoDelta.linesIterator.filter(_.startsWith("Total")).toSeq
    assert(lastTickTotals.map(_.trim) == batchTotals.map(_.trim))
  }

  test("stateful conversation progress tracks every conversation") {
    val stream = StreamingPipeline.readTranscriptStream(spark, dir)
    val q = StreamingPipeline.conversationProgress(spark, stream)
      .writeStream.format("memory").queryName("conv_progress").outputMode("update").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("conv_progress").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    val expected = Tables.localTurns(2000).groupBy(_.conv_id)
      .map { case (c, ts) => c -> (ts.size.toLong, ts.map(_.turn_idx).max) }
    assert(got == expected)
  }
}
