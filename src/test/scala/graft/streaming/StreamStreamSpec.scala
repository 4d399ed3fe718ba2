package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000)

  // (user_id, event_id, ts) rows: clicks on the left, purchases on the right
  private val clicks = Seq(
    (1L, 10L, ts(0)), (1L, 11L, ts(500)), (2L, 12L, ts(0)))
  private val purchases = Seq(
    (1L, 20L, ts(100)),   // joins click 10 (gap 100 <= 300)
    (1L, 21L, ts(400)),   // too late for click 10, too early is fine for 11? 400 < 500 -> no
    (1L, 22L, ts(700)),   // joins click 11 (gap 200)
    (2L, 23L, ts(400)),   // beyond click 12's 300s gap
    (3L, 24L, ts(50)))    // no left side

  test("stream-stream interval join equals the batch range join, append mode") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val r = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = EventStreams.intervalJoin(
      l.toDF().toDF("user_id", "event_id", "ts"),
      r.toDF().toDF("user_id", "event_id", "ts"),
      maxGapSeconds = 300, watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    // feed across several micro-batches to exercise buffered state
    l.addData(clicks.take(2): _*)
    r.addData(purchases.take(2): _*)
    q.processAllAvailable()
    l.addData(clicks.drop(2): _*)
    r.addData(purchases.drop(2): _*)
    q.processAllAvailable()
    val got = spark.table("ssj_test")
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    q.stop()

    // batch twin: identical range predicate on the same static data
    val lb = clicks.toDF("user_id", "left_id", "left_ts")
    val rb = purchases.toDF("r_user_id", "right_id", "right_ts")
    val expected = lb.join(rb,
        col("user_id") === col("r_user_id") &&
          col("right_ts") >= col("left_ts") &&
          col("right_ts") <= col("left_ts") + expr("INTERVAL 300 SECONDS"))
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet

    assert(got == expected)
    assert(got == Set((10L, 20L), (11L, 22L)))
  }
}
