package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class BehaviorSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ------------------------------------------------------ preferencePairs

  test("preferencePairs: extremal pair with deterministic tie-breaks") {
    val ev = Seq(
      // user 1: clean max 9.0 (id 12), min 1.0 (id 10), gap 8
      (1L, 10L, 1.0), (1L, 11L, 5.0), (1L, 12L, 9.0),
      // user 2: max value tied at 7.0 between ids 21 and 22 -> smallest id
      //         min value tied at 2.0 between ids 23 and 24 -> smallest id
      (2L, 21L, 7.0), (2L, 22L, 7.0), (2L, 23L, 2.0), (2L, 24L, 2.0),
      // user 3: gap 3.0 below minGap 4.0 -> filtered
      (3L, 30L, 1.0), (3L, 31L, 4.0),
      // user 4: single event, gap 0 -> filtered
      (4L, 40L, 6.0))
      .toDF("user_id", "event_id", "value")
    val got = Behavior.preferencePairs(ev, "user_id", "event_id",
        col("value"), minGap = 4.0)
      .select($"user_id", $"chosen_id", $"rejected_id", $"gap", $"n_events")
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(got == Set(
      (1L, 12L, 10L, 8.0, 3L),
      (2L, 21L, 23L, 5.0, 4L)))
  }

  test("preferencePairs: gap exactly at minGap is kept") {
    val ev = Seq((1L, 1L, 2.0), (1L, 2L, 6.0)).toDF("user_id", "event_id", "value")
    assert(Behavior.preferencePairs(ev, "user_id", "event_id", col("value"), 4.0)
      .count() == 1L)
  }

  test("preferencePairs plan: single exchange, no window") {
    val ev = Seq((1L, 1L, 2.0), (1L, 2L, 6.0)).toDF("user_id", "event_id", "value")
    val plan = Behavior.preferencePairs(ev, "user_id", "event_id", col("value"), 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert("Exchange".r.findAllIn(plan).size <= 2, s"too many exchanges:\n$plan")
  }

  // -------------------------------------------------------- orderedFunnel

  private val funnelEv = Seq(
    // user 1 completes in order
    (1L, "view", ts("2024-01-01 10:00:00")),
    (1L, "click", ts("2024-01-01 10:05:00")),
    (1L, "purchase", ts("2024-01-01 10:10:00")),
    // user 2: click BEFORE first view never counts; none after -> stage 1
    (2L, "click", ts("2024-01-01 09:00:00")),
    (2L, "view", ts("2024-01-01 10:00:00")),
    // user 3: purchase without click does not skip the funnel -> stage 1
    (3L, "view", ts("2024-01-01 08:00:00")),
    (3L, "purchase", ts("2024-01-01 09:00:00")),
    // user 4: click simultaneous with view does NOT advance (strict >)
    (4L, "view", ts("2024-01-01 07:00:00")),
    (4L, "click", ts("2024-01-01 07:00:00")),
    // user 5: never viewed -> not in the funnel population
    (5L, "purchase", ts("2024-01-01 06:00:00")),
    // user 6: second click after view counts even though first was before
    (6L, "click", ts("2024-01-01 05:00:00")),
    (6L, "view", ts("2024-01-01 05:30:00")),
    (6L, "click", ts("2024-01-01 06:30:00")))
    .toDF("user_id", "event_type", "ts")

  test("orderedFunnel: strict ordering, no stage skips, entry population") {
    val got = Behavior.orderedFunnel(funnelEv, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .select($"user_id", $"stage_reached")
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 1, 6L -> 2))
  }

  test("orderedFunnel: stage timestamps are the earliest valid ones") {
    val row = Behavior.orderedFunnel(funnelEv, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .filter($"user_id" === 6L)
      .select($"t_1", $"t_2", $"t_3").head()
    assert(row.getTimestamp(0) == ts("2024-01-01 05:30:00"))
    assert(row.getTimestamp(1) == ts("2024-01-01 06:30:00"))
    assert(row.isNullAt(2))
  }

  // -------------------------------------------------------- sessionDigest

  test("sessionDigest: ordered fingerprint is partitioning-proof") {
    val ev = Seq(
      // user 1, session 0: view(10:00) -> click(10:05); session 1 after
      // the 30-min gap: purchase(11:00)
      (1L, 100L, "view", ts("2024-01-01 10:00:00")),
      (1L, 101L, "click", ts("2024-01-01 10:05:00")),
      (1L, 102L, "purchase", ts("2024-01-01 11:00:00")),
      // user 2: same path shape as user 1 session 0 -> same fingerprint
      (2L, 200L, "view", ts("2024-01-02 09:00:00")),
      (2L, 201L, "click", ts("2024-01-02 09:20:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    def digest(df: org.apache.spark.sql.DataFrame) =
      Behavior.sessionDigest(df, "user_id", "ts", "event_id", "event_type", 1800.0)
        .select($"user_id", $"session_id", $"n_events", $"duration_us", $"fp")
        .as[(Long, Long, Long, Long, String)].collect().toSet
    val got = digest(ev)
    val u1s0 = got.find(r => r._1 == 1L && r._2 == 0L).get
    val u2s0 = got.find(r => r._1 == 2L && r._2 == 0L).get
    assert(u1s0._3 == 2L && u1s0._4 == 300000000L)
    assert(got.find(r => r._1 == 1L && r._2 == 1L).get._3 == 1L)
    // same ordered path => same fingerprint, regardless of duration
    assert(u1s0._5 == u2s0._5)
    // fingerprint must be order-sensitive and partitioning-invariant
    assert(digest(ev.repartition(7)) == got)
    val swapped = Seq(
      (1L, 100L, "click", ts("2024-01-01 10:00:00")),
      (1L, 101L, "view", ts("2024-01-01 10:05:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    assert(digest(swapped).head._5 != u1s0._5)
  }

  // --------------------------------------------------------- decayedCounts

  test("decayedCounts: exact power-of-two weights, order-free") {
    val ev = Seq(
      ("a", ts("2024-01-10 12:00:00")), // age 0 -> 2^30
      ("a", ts("2024-01-09 12:00:00")), // age 1 -> 2^29
      ("a", ts("2024-01-08 11:00:00")), // age 2 (2d1h) -> 2^28
      ("b", ts("2024-01-10 12:00:00"))) // age 0
      .toDF("k", "ts")
    val got = Behavior.decayedCounts(ev, Seq(col("k")), "ts", windowDays = 30)
      .select($"k", $"n", $"decayed_scaled", $"decayed")
      .as[(String, Long, Long, Double)].collect().toSet
    val s30 = 1L << 30; val s29 = 1L << 29; val s28 = 1L << 28
    assert(got == Set(
      ("a", 3L, s30 + s29 + s28, 1.75),
      ("b", 1L, s30, 1.0)))
    // partitioning-proof: integer sums commute
    val re = Behavior.decayedCounts(ev.repartition(5), Seq(col("k")), "ts", 30)
      .select($"k", $"n", $"decayed_scaled", $"decayed")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(re == got)
  }

  test("decayedCounts: beyond-window events truncate to zero weight") {
    val ev = Seq(
      ("a", ts("2024-02-01 00:00:00")),  // age 0
      ("a", ts("2023-12-01 00:00:00")))  // age 62 > window 30 -> weight 0
      .toDF("k", "ts")
    val got = Behavior.decayedCounts(ev, Seq(col("k")), "ts", windowDays = 30)
      .select($"n", $"decayed_scaled").as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L << 30)))
  }

  // ---------------------------------------------------------- kFoldAssign

  test("kFoldAssign: exact per-stratum balance and replayable hash fold") {
    val df = (0L until 23L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val got = Relational.kFoldAssign(df, Seq(col("lang")), col("doc_id"),
      col("doc_id"), k = 4)
    // exact balance: fold sizes within each stratum differ by <= 1
    val sizes = got.groupBy($"lang", $"fold").count()
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3))
    sizes.foreach { case (_, ns) => assert(ns.max - ns.min <= 1) }
    // round-robin is order-deterministic: doc 0 is en fold 0, doc 3 en fold 1
    val folds = got.select($"doc_id", $"fold").as[(Long, Long)].collect().toMap
    assert(folds(0L) == 0L && folds(3L) == 1L && folds(6L) == 2L &&
      folds(9L) == 3L && folds(12L) == 0L)
    // hash fold replays the shared LCG draw exactly
    val hash = got.select($"doc_id", $"fold_hash").as[(Long, Long)].collect().toMap
    def lcg(id: Long): Long = ((id % 2147483648L) * 1103515245L + 12345L) %
      2147483648L >> 16
    (0L until 23L).foreach(i => assert(hash(i) == lcg(i) % 4))
  }

  // ------------------------------------------------------ cohortRetention

  test("cohortRetention: first-period cohorts, distinct per-period activity") {
    val ev = Seq(
      // user 1: first day 0; active days 0, 0 (dup), 2
      (1L, ts("2024-01-01 05:00:00")), (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-03 01:00:00")),
      // user 2: first day 2; active days 2 and 3
      (2L, ts("2024-01-03 10:00:00")), (2L, ts("2024-01-04 10:00:00")),
      // user 3: first day 0 only
      (3L, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "ts")
    val got = Behavior.cohortRetention(ev, "user_id", "ts", 86400L)
      .as[(Long, Long, Long)].collect().toSet
    val day0 = 19723L // 2024-01-01 in days since epoch
    assert(got == Set(
      (day0, 0L, 2L),      // users 1 and 3 on their cohort day
      (day0, 2L, 1L),      // user 1 back on day 2
      (day0 + 2, 0L, 1L),  // user 2 cohort
      (day0 + 2, 1L, 1L))) // user 2 retained next day
  }

  test("cohortRetention: midnight-exact timestamps land in the right period") {
    val ev = Seq((1L, ts("2024-01-02 00:00:00"))).toDF("user_id", "ts")
    val got = Behavior.cohortRetention(ev, "user_id", "ts", 86400L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((19724L, 0L, 1L)))
  }
}
