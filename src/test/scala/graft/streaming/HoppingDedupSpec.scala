package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class HoppingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000)

  test("streaming hopping counts place each event in duration/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hoppingCounts(df, "30 minutes", "15 minutes", "2 hours")
      .writeStream.format("memory").queryName("hopping_test")
      .outputMode("complete").start()
    // one event at t=16min: hops [00:00, 00:30) and [00:15, 00:45)
    input.addData((ts(16 * 60), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("hopping_test")
      .select(col("window.start").cast("string"), col("cnt"))
      .as[(String, Long)].collect().toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 00:00:00", 1L),
      ("2024-01-01 00:15:00", 1L)))
  }

  test("streaming first-seen dedup keeps one row per key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("user_id", "event_type", "ts", "event_id")
    val q = EventStreams.dedupFirstSeen(df, "2 hours")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    input.addData((1L, "click", ts(0), 1L), (1L, "click", ts(60), 2L),
      (1L, "view", ts(30), 3L), (2L, "click", ts(10), 4L))
    q.processAllAvailable()
    val keys = spark.table("dedup_test")
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)].collect().toSeq
    q.stop()
    assert(keys.length == 3) // (1,click) deduped; (1,view) and (2,click) kept
    assert(keys.toSet == Set((1L, "click"), (1L, "view"), (2L, "click")))
  }

  test("enrichLatest equals the batch as-of join for in-order feeds") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.TimeJoins
    val rows = Seq(
      (1L, "click", ts(10), 1L, 5.0),
      (1L, "purchase", ts(20), 2L, 9.0),
      (1L, "click", ts(25), 3L, 7.0),
      (1L, "click", ts(50), 4L, 8.0),   // equal-ts click+purchase: inclusive
      (1L, "purchase", ts(50), 5L, 1.0),
      (2L, "purchase", ts(30), 6L, 2.0)) // user with no clicks at all
    val input = MemoryStream[(Long, String, java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("user_id", "event_type", "ts", "event_id", "value")
    val q = EventStreams.enrichLatest(df, "purchase", "click")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    val got = spark.table("enrich_test")
      .select(col("event_id"), col("r_id"), col("r_value"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    q.stop()
    val batchDf = rows.toDF("user_id", "event_type", "ts", "event_id", "value")
    val want = TimeJoins.asofJoin(
        batchDf.filter(col("event_type") === "purchase"),
        batchDf.filter(col("event_type") === "click"),
        Seq("user_id"), "ts", "event_id", Seq("value"))
      .select(col("event_id"), col("r_id"), col("value"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == want)
    assert(got(5L) == ((Some(4L), Some(8.0)))) // at-or-before is inclusive
    assert(got(6L) == ((None, None)))
  }

  test("enrichLatest carries state across micro-batches; stale rights are ignored") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("user_id", "event_type", "ts", "event_id", "value")
    val q = EventStreams.enrichLatest(df, "purchase", "click")
      .writeStream.format("memory").queryName("enrich_state_test")
      .outputMode("append").start()
    input.addData((1L, "click", ts(10), 1L, 5.0))
    q.processAllAvailable()
    input.addData((1L, "purchase", ts(20), 2L, 0.0))
    q.processAllAvailable()
    // a LATE click older than the current state must not displace it
    input.addData((1L, "click", ts(5), 3L, 9.0),
      (1L, "purchase", ts(30), 4L, 0.0))
    q.processAllAvailable()
    val got = spark.table("enrich_state_test")
      .select(col("event_id"), col("r_id")).as[(Long, Option[Long])]
      .collect().toMap
    q.stop()
    assert(got == Map(2L -> Some(1L), 4L -> Some(1L)))
  }

  test("event-time-minimal dedup: a late smaller-ts row displaces the candidate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("user_id", "event_type", "ts", "event_id")
    val q = EventStreams.dedupEventTimeMinimal(df, "1 hour")
      .writeStream.format("memory").queryName("etmin_test")
      .outputMode("append").start()
    // batch 1: the LATER event of the key arrives first (the row
    // dropDuplicatesWithinWatermark would wrongly keep)
    input.addData((1L, "click", ts(600), 2L))
    q.processAllAvailable()
    // batch 2: the event-time-minimal row arrives LATE but inside the
    // 1-hour watermark horizon — it must displace event 2
    input.addData((1L, "click", ts(60), 1L))
    q.processAllAvailable()
    // advance the watermark far past the key (two batches: the sentinel
    // raises the watermark at its batch's END; timeouts fire on the NEXT)
    input.addData((9L, "other", ts(2 * 86400), 90L))
    q.processAllAvailable()
    input.addData((9L, "other", ts(2 * 86400 + 1), 91L))
    q.processAllAvailable()
    val rows = spark.table("etmin_test")
      .select(col("user_id"), col("event_type"), col("event_id"))
      .as[(Long, String, Long)].collect().toSet
    q.stop()
    assert(rows == Set((1L, "click", 1L)))
  }
}
