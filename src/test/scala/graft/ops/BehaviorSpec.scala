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

  test("decayedCounts: windowDays=60 boundary stays exact long arithmetic") {
    // the documented overflow budget's edge: weights up to 2^60 must sum
    // exactly (2 age-0 events -> 2^61, still inside a long), and a
    // 60-day-old event keeps weight exactly 1 (2^0), not 0
    val ev = Seq(
      ("a", ts("2024-03-01 00:00:00")), ("a", ts("2024-03-01 00:00:00")),
      ("a", ts("2024-01-01 00:00:00"))) // age exactly 60 -> weight 2^0
      .toDF("k", "ts")
    val got = Behavior.decayedCounts(ev, Seq(col("k")), "ts", windowDays = 60)
      .select($"n", $"decayed_scaled").as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, (1L << 61) + 1L)))
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

  // ------------------------------------------------------- nextEventTopK

  test("nextEventTopK: last event by (ts, id), next ranked by transition count") {
    val ev = Seq(
      // user 1: view -> click -> view -> click -> buy   (last = buy)
      (10L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (11L, ts("2024-01-01 00:01:00"), 1L, "click"),
      (12L, ts("2024-01-01 00:02:00"), 1L, "view"),
      (13L, ts("2024-01-01 00:03:00"), 1L, "click"),
      (14L, ts("2024-01-01 00:04:00"), 1L, "buy"),
      // user 2: view -> view (last = view; equal ts -> larger id wins)
      (20L, ts("2024-01-01 00:00:00"), 2L, "view"),
      (21L, ts("2024-01-01 00:00:00"), 2L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    // transitions: view->click x3 (u1 twice + u2's equal-ts pair ordered
    // by id: view(20) then click(21)), click->view x1, click->buy x1.
    // user 1's last event is 'buy' (latest ts) — terminal, no outgoing
    // edge, so u1 joins away; user 2's last is 'click' (equal ts ->
    // LARGER id 21 wins). From 'click': buy/view tie at n=1 -> 'buy'
    // first lexically.
    val got = Behavior.nextEventTopK(ev, "user_id", "event_type", "ts",
        "event_id", k = 2)
      .as[(Long, String, String, Long, Long)].collect().toSet
    assert(got == Set(
      (2L, "click", "buy", 1L, 1L),
      (2L, "click", "view", 1L, 2L)))
  }

  test("nextEventTopK: entities whose last type has no outgoing edge drop") {
    // single user ending in a terminal type: 'buy' never transitions out
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:01:00"), 1L, "buy"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Behavior.nextEventTopK(ev, "user_id", "event_type", "ts",
      "event_id", k = 3)
    assert(got.count() == 0L)
  }

  // ------------------------------------------------------ rollingActives

  test("rollingActives: dau, trailing wau, stickiness on a hand-traced log") {
    val ev = Seq(
      (1L, ts("2024-01-01 01:00:00")), (1L, ts("2024-01-01 02:00:00")),
      (2L, ts("2024-01-01 03:00:00")),
      (1L, ts("2024-01-02 01:00:00")),
      (3L, ts("2024-01-05 01:00:00")), (1L, ts("2024-01-05 02:00:00")))
      .toDF("user_id", "ts")
    val got = Behavior.rollingActives(ev, "user_id", "ts", windowDays = 3)
      .select($"day".cast("string"), $"dau", $"wau", $"stickiness")
      .as[(String, Long, Long, Double)].collect().toSet
    // day1: dau {1,2}=2, wau(day -2..day) = {1,2} = 2
    // day2: dau {1}=1,   wau days {0? no} 2024-12-31..01-02 -> {1,2} = 2
    // day5: dau {1,3}=2, wau 01-03..01-05 -> {1,3} = 2 (day2 outside)
    assert(got == Set(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-02", 1L, 2L, 0.5),
      ("2024-01-05", 2L, 2L, 1.0)))
    // rollingActives persists the distinct (day, entity) frame — the
    // documented cache contract: clear between corpora
    spark.catalog.clearCache()
  }

  // --------------------------------------------------------- trendSlopes

  test("trendSlopes: exact fit on a perfect line, NULLs for single-day groups") {
    // type A: counts 3, 5, 7 on consecutive days -> slope 2 exactly
    val a = (1 to 3).flatMap(d => Seq.fill(1 + 2 * d)(
      ("A", ts(f"2024-01-0$d 12:00:00"))))
    // type B: one day only -> undefined fit
    val b = Seq(("B", ts("2024-01-01 00:00:00")))
    val ev = (a ++ b).toDF("event_type", "ts")
    val got = Behavior.trendSlopes(ev, Seq(col("event_type")), "ts")
      .select($"event_type", $"n_days", $"slope", $"intercept")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    // x = epoch days 19723,19724,19725 ; y = 3,5,7 ; y = 2x + (3 - 2*19723)
    assert(got == Set(
      ("A", 3L, Some(2.0), Some(3.0 - 2.0 * 19723)),
      ("B", 1L, None, None)))
  }

  // --------------------------------------------------- trailingAnomalies

  test("trailingAnomalies: z from exact window moments, full windows only") {
    // one type, counts by day: 4, 6, 10 with window=2
    val ev = (Seq.fill(4)(ts("2024-01-01 01:00:00")) ++
      Seq.fill(6)(ts("2024-01-02 01:00:00")) ++
      Seq.fill(10)(ts("2024-01-03 01:00:00")))
      .map(("A", _)).toDF("event_type", "ts")
    val got = Behavior.trailingAnomalies(ev, Seq(col("event_type")), "ts",
        window = 2, zThreshold = 2.0)
      .select($"event_type", $"day".cast("string"), $"y", $"mean", $"z",
        $"is_anomaly")
      .as[(String, String, Long, Double, Option[Double], Boolean)]
      .collect().toSet
    // only day3 has a full 2-obs window {4,6}: mean 5, popstd 1,
    // z = (10-5)/1 = 5 -> anomaly
    assert(got == Set(("A", "2024-01-03", 10L, 5.0, Some(5.0), true)))
  }

  test("trailingAnomalies: zero-variance window flags iff the value deviates") {
    // counts 5, 5, 5, 9: day3 window {5,5} var 0, y=5 == mean -> quiet;
    // day4 window {5,5} var 0, y=9 != mean -> anomaly with NULL z
    val counts = Seq(1 -> 5, 2 -> 5, 3 -> 5, 4 -> 9)
    val ev = counts.flatMap { case (d, n) =>
      Seq.fill(n)(("A", ts(f"2024-01-0$d 01:00:00"))) }
      .toDF("event_type", "ts")
    val got = Behavior.trailingAnomalies(ev, Seq(col("event_type")), "ts",
        window = 2, zThreshold = 2.0)
      .select($"day".cast("string"), $"y", $"z", $"is_anomaly")
      .as[(String, Long, Option[Double], Boolean)].collect().toSet
    assert(got == Set(
      ("2024-01-03", 5L, None, false),
      ("2024-01-04", 9L, None, true)))
  }
}
