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
    // events.parquet carries TIMESTAMP(NANOS): stream it as LONG nanos (the
    // same legacy conf the batch loader scopes around its read) and convert
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      // the file stream source wants a DIRECTORY: stage the single parquet
      // file into a temp dir (testdata itself is read-only)
      val stage = java.nio.file.Files.createTempDirectory("events_stream")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        stage.resolve("events.parquet"))
      val stream = spark.readStream.schema(schema)
        .parquet(stage.toString)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
