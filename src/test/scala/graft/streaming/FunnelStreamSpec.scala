package graft.streaming

import graft.SparkTestBase
import graft.ops.Behavior
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class FunnelStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) =
    new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000)

  // (user_id, event_id, event_type, ts)
  private val feed = Seq(
    // user 1 completes across micro-batches
    (1L, 10L, "view", ts(0)), (1L, 11L, "click", ts(60)),
    (1L, 12L, "purchase", ts(120)),
    // user 2: click precedes first view -> stays at stage 1
    (2L, 20L, "click", ts(0)), (2L, 21L, "view", ts(60)),
    // user 3: purchase without click never advances past 1
    (3L, 30L, "view", ts(0)), (3L, 31L, "purchase", ts(60)),
    // user 4: simultaneous view+click does not advance (strict >)
    (4L, 40L, "view", ts(0)), (4L, 41L, "click", ts(0)),
    // user 5: never views -> never enters
    (5L, 50L, "purchase", ts(0)))

  private val stages = Seq("view", "click", "purchase")

  test("streaming funnel advances match the batch orderedFunnel") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val q = EventStreams.funnelProgress(
        in.toDF().toDF("user_id", "event_id", "event_type", "ts"), stages)
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode("append").start()
    // split mid-funnel to exercise state across micro-batches
    in.addData(feed.take(4): _*)
    q.processAllAvailable()
    in.addData(feed.drop(4): _*)
    q.processAllAvailable()
    val advances = spark.table("funnel_test")
      .select($"user_id", $"stage").as[(Long, Int)].collect().toSet
    q.stop()

    assert(advances == Set(
      (1L, 1), (1L, 2), (1L, 3),
      (2L, 1), (3L, 1), (4L, 1)))

    // max(stage) per user == the batch stage_reached on the same data
    val batch = Behavior.orderedFunnel(
        feed.toDF("user_id", "event_id", "event_type", "ts"),
        "user_id", "event_type", "ts", stages)
      .select($"user_id", $"stage_reached").as[(Long, Int)].collect().toMap
    val streamed = advances.groupBy(_._1).map { case (u, s) => u -> s.map(_._2).max }
    assert(streamed == batch)
  }

  test("each advance fires exactly once even when later events repeat stages") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val q = EventStreams.funnelProgress(
        in.toDF().toDF("user_id", "event_id", "event_type", "ts"), stages)
      .writeStream.format("memory").queryName("funnel_once")
      .outputMode("append").start()
    in.addData((1L, 1L, "view", ts(0)), (1L, 2L, "click", ts(10)))
    q.processAllAvailable()
    in.addData((1L, 3L, "view", ts(20)), (1L, 4L, "click", ts(30)))
    q.processAllAvailable()
    val rows = spark.table("funnel_once")
      .select($"user_id", $"stage", $"ts").as[(Long, Int, java.sql.Timestamp)]
      .collect().toSeq
    q.stop()
    assert(rows.size == 2)
    assert(rows.toSet == Set((1L, 1, ts(0)), (1L, 2, ts(10))))
  }
}
