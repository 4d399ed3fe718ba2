package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TimeJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L)) // key 2 has no right rows at all
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10L, 1.5),
      (1L, ts("2024-01-01 10:00:00"), 11L, 2.5), // equal ts: inclusive match
      (1L, ts("2024-01-01 11:00:00"), 12L, 3.5))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeJoins.asofJoin(left, right, Seq("user_id"), "ts", "event_id",
        Seq("value"))
      .select(col("event_id"), col("r_id"), col("value"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

    // 10:00 left row matches the 10:00 right row (at-or-before is inclusive)
    assert(out(100L) == ((Some(11L), Some(2.5))))
    // 12:00 left row matches the latest earlier right row (11:00)
    assert(out(101L) == ((Some(12L), Some(3.5))))
    // no right rows for key 2: left-outer NULLs
    assert(out(200L) == ((None, None)))
  }

  test("asofJoin picks the matched row atomically: a NULL payload is not torn") {
    // latest click carries a NULL value: the match must return THAT row's
    // id with its NULL value — not skip back to an older click's value
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, Some(1.5)),
      (1L, ts("2024-01-01 11:00:00"), 11L, None))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeJoins.asofJoin(left, right, Seq("user_id"), "ts", "event_id",
        Seq("value"))
      .select(col("r_id"), col("value"))
      .as[(Option[Long], Option[Double])].collect().toSeq
    assert(out == Seq((Some(11L), None)))
  }

  test("asofJoin rejects payload names colliding with its outputs") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("user_id", "ts", "event_id")
    val e = intercept[IllegalArgumentException] {
      TimeJoins.asofJoin(df, df, Seq("user_id"), "ts", "event_id", Seq("ts"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asofJoin breaks right-side time ties by largest id") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, 1.0),
      (1L, ts("2024-01-01 09:00:00"), 11L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeJoins.asofJoin(left, right, Seq("user_id"), "ts", "event_id",
        Seq("value"))
      .select(col("r_id"), col("value")).as[(Long, Double)].collect().toSeq
    assert(out == Seq((11L, 2.0)))
  }

  test("asofJoin plans one shuffle and no join operator") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 10L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val plan = TimeJoins.asofJoin(left, right, Seq("user_id"), "ts", "event_id",
      Seq("value")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin must not plan a join:\n$plan")
    // exactly one exchange: the union shuffles once on the key for the window
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("intervalPairs equals the naive inequality self-join") {
    // deterministic pseudo-random events: 3 keys, 40 events each, times
    // spread so pairs fall on, inside, and across bin boundaries
    val rng = new scala.util.Random(7)
    val rows = for {
      k <- 1L to 3L
      i <- 1 to 40
    } yield (k, ts("2024-01-01 00:00:00").getTime + rng.nextInt(7200) * 1000L,
      k * 1000L + i)
    val df = rows.toDF("user_id", "t_ms", "event_id")
      .select(col("user_id"), timestamp_millis(col("t_ms")).as("ts"), col("event_id"))
    val gapSec = 600L
    val got = TimeJoins.intervalPairs(df, Seq("user_id"), "ts", "event_id", gapSec)
      .select(col("id_a"), col("id_b"), col("gap_us"))
      .as[(Long, Long, Long)].collect().toSet
    // naive reference: all ordered pairs within the gap
    val byKey = rows.groupBy(_._1)
    val want = byKey.values.flatMap { es =>
      for {
        a <- es; b <- es
        if (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)) &&
          (b._2 - a._2) * 1000L <= gapSec * 1000000L
      } yield (a._3, b._3, (b._2 - a._2) * 1000L)
    }.toSet
    assert(got == want)
    assert(got.nonEmpty) // the fixture must actually exercise pairs
    // boundary: gap exactly == maxGap is included
    val edge = Seq((9L, ts("2024-01-01 00:00:00"), 1L),
      (9L, ts("2024-01-01 00:10:00"), 2L)).toDF("user_id", "ts", "event_id")
    val e = TimeJoins.intervalPairs(edge, Seq("user_id"), "ts", "event_id", 600L)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSeq
    assert(e == Seq((1L, 2L)))
  }

  test("intervalPairs emits each qualifying pair exactly once") {
    // both events in the SAME bin (the double-count hazard of the
    // bin/bin+1 explode) and a pair straddling a bin boundary
    val df = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1L),
      (1L, ts("2024-01-01 00:02:00"), 2L), // same bin as id 1 (gap 600s bins)
      (1L, ts("2024-01-01 00:11:00"), 3L)) // next bin, within gap of both
      .toDF("user_id", "ts", "event_id")
    val out = TimeJoins.intervalPairs(df, Seq("user_id"), "ts", "event_id", 600L)
      .groupBy(col("id_a"), col("id_b")).count()
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L)))
  }
}
