package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming-vs-batch semantics on REAL data: drive the streaming tumbling
  * aggregation from the events parquet itself (file-source streaming, one
  * synchronous micro-batch) and require exact agreement with the batch
  * query q35 computes over the same file. */
class StreamFromParquetSpec extends SparkTestBase {
  import spark.implicits._

  test("file-source streaming tumbling counts equal the batch aggregation") {
    val dir = sf0001
    // the file stream source wants a DIRECTORY: stage the single parquet
    // file into a temp dir (testdata itself is read-only). Schema handling
    // (any of the events.ts physical encodings) is Tables.eventsStream's job.
    val stage = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val stream = Tables.eventsStream(spark, stage.toString)
    val q = EventStreams.tumblingCounts(stream, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("stream_vs_batch")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.table("stream_vs_batch")
      .select(col("window.start").cast("string").as("h"), col("event_type"),
        col("cnt"), round(col("sum_value"), 4).as("sv"))
      .as[(String, String, Long, Double)].collect().toSet
    q.stop()
    val batch = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sv"))
      .select(col("w.start").cast("string").as("h"), col("event_type"),
        col("cnt"), col("sv"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("event-time-minimal streaming dedup equals batch q39 under adversarial disorder") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = sf0001
    val rows = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)].collect()
    // worst-case arrival: REVERSE event-time order across two micro-batches,
    // so every key's minimal row arrives last — first-seen dedup would get
    // every key wrong that has >1 event
    val reversed = rows.sortBy(r => (-r._3.getTime, -r._4))
    val (late, early) = reversed.splitAt(reversed.length / 2)
    val maxTs = rows.map(_._3.getTime).max
    val input = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("user_id", "event_type", "ts", "event_id")
    // watermark delay > the data's time span, so nothing is dropped as late
    val q = EventStreams.dedupEventTimeMinimal(df, "365 days")
      .writeStream.format("memory").queryName("etmin_vs_batch")
      .outputMode("append").start()
    input.addData(late.toIndexedSeq)
    q.processAllAvailable()
    input.addData(early.toIndexedSeq)
    q.processAllAvailable()
    // sentinel far in the future flushes every real key (two batches: the
    // watermark advances at batch end, timeouts fire on the next)
    val sentinel = new java.sql.Timestamp(maxTs + 366L * 86400 * 1000)
    input.addData((Long.MaxValue, "sentinel", sentinel, Long.MaxValue))
    q.processAllAvailable()
    input.addData((Long.MaxValue, "sentinel2", sentinel, Long.MaxValue))
    q.processAllAvailable()
    val streamed = spark.table("etmin_vs_batch")
      .filter(col("user_id") =!= Long.MaxValue)
      .select(col("user_id"), col("event_type"), col("event_id"),
        date_format(col("first_ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"))
      .as[(Long, String, Long, String)].collect().toSet
    q.stop()
    val batch = graft.SparkEntry.queries("q39_stream_dedup")(spark, dir)
      .as[(Long, String, Long, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
