package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event analytics over an interaction log — the query family
  * a recommender's upstream event pipeline runs before any model sees the
  * data: preference-pair mining (the DPO/BPR training-pair construction),
  * ordered conversion funnels, and cohort retention. The reference works
  * from an already-flattened ratings table (`explicit_ratings/main.py`
  * load step) and mines implicit preference pairs inside the BPR sampler
  * (`implicit_bpr/functions.py`); these operators produce those inputs
  * FROM the raw event log, distributedly.
  *
  * Scale shapes (shared by all three): everything keys on the entity
  * column — one hash exchange each, partial aggregation map-side, no
  * windows, no driver state. Per-entity state is O(1) (min/max structs,
  * stage timestamps), so a hot entity cannot skew a partition the way a
  * collect_list-based sessionizer would. */
object Behavior {

  /** Training preference pairs from an interaction log: per entity, the
    * argmax-value interaction (chosen) against the argmin (rejected),
    * kept when the preference gap is decisive (`minGap`). Deterministic
    * tie-breaks — equal values resolve to the SMALLEST interaction id on
    * both sides — make the draw replayable on any engine. One hash
    * exchange on `entityCol`; the argmax/argmin fold is a pair of struct
    * min/max aggregates with map-side combine, so per-group state is two
    * structs regardless of entity fan-in.
    *
    * Output: (entity, chosen_id, rejected_id, gap, n_events), gap rounded
    * 6dp — the (u, i⁺, i⁻) triple feeding a BPR/DPO-style trainer
    * (reference: implicit_bpr/functions.py's per-user positive/negative
    * draw, here value-extremal and exact instead of sampled). */
  def preferencePairs(events: DataFrame, entityCol: String, idCol: String,
                      valueCol: Column, minGap: Double): DataFrame = {
    require(minGap > 0.0, "minGap must be > 0 (a zero gap pairs a row with itself)")
    events
      .groupBy(col(entityCol))
      .agg(
        // argmax by (value, then smallest id): -id inverts the id order
        max(struct(valueCol.as("v"), (-col(idCol)).as("ni"))).as("hi"),
        min(struct(valueCol.as("v"), col(idCol).as("i"))).as("lo"),
        count(lit(1)).as("n_events"))
      .filter(col("hi.v") - col("lo.v") >= minGap)
      .select(col(entityCol), (-col("hi.ni")).as("chosen_id"),
        col("lo.i").as("rejected_id"),
        round(col("hi.v") - col("lo.v"), 6).as("gap"), col("n_events"))
  }

  /** Strictly-ordered conversion funnel: for every entity that entered
    * stage 1, the earliest timestamp of each stage REACHED IN ORDER —
    * stage i+1 counts only strictly after the entity's stage-i time (the
    * standard ordered-funnel semantics; simultaneous timestamps do not
    * advance the funnel). Returns
    * (entity, stage_reached, t_1 … t_k) with unreached stages NULL.
    *
    * Distinct from [[Relational.funnelSteps]], which is SESSION-scoped
    * and requires the FIRST occurrences of every step to be monotone
    * (an early stray click permanently fails that session's funnel);
    * this operator finds the earliest VALID chain per entity across its
    * whole history — a later re-click after the first view still
    * advances. Both are standard funnel definitions; use funnelSteps
    * for per-session rollups, this for per-entity progression (its
    * streaming twin is [[graft.streaming.EventStreams.funnelProgress]]).
    *
    * Shape: one filtered min-aggregate plus one entity-keyed join per
    * stage — k−1 co-keyed shuffles over (entity, timestamp) rows only,
    * never the event payload; funnels are 3–5 stages, so the chain is
    * short and every exchange hashes the same key (AQE coalesces the
    * tiny tails). Per-entity state is one timestamp per stage — hot
    * users cost nothing extra. */
  def orderedFunnel(events: DataFrame, entityCol: String, typeCol: String,
                    tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    val ent = col(entityCol)
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(ent).agg(min(col(tsCol)).as("t_1"))
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      val hit = events.filter(col(typeCol) === stage)
        .select(ent, col(tsCol))
        .join(acc.select(ent, col(s"t_$i")), Seq(entityCol))
        .filter(col(tsCol) > col(s"t_$i"))
        .groupBy(ent).agg(min(col(tsCol)).as(s"t_${i + 1}"))
      acc = acc.join(hit, Seq(entityCol), "left")
    }
    val reached = stages.indices.map(i => when(col(s"t_${i + 1}").isNotNull, 1)
      .otherwise(0)).reduce(_ + _)
    acc.select(ent +: reached.as("stage_reached") +:
      stages.indices.map(i => col(s"t_${i + 1}")): _*)
  }

  /** Per-session behavioral digest: gap-sessionize the log
    * ([[Relational.sessionize]]), then reduce each session to scalars —
    * event count, exact duration in integer microseconds, and an ORDERED
    * path fingerprint (md5 of the '|'-joined event types in (ts, id)
    * order). The fingerprint makes session-shape analytics (top
    * conversion paths, anomalous-path detection) a plain groupBy over a
    * 32-char key instead of an array-valued column.
    *
    * Determinism: the in-group order is pinned by sorting the collected
    * (ts, id, type) structs — never by collect_list's arrival order,
    * which is partitioning-dependent. Per-session state is the session's
    * own events (sessions are gap-bounded and human-scale; this is NOT
    * for unbounded keys — the contract every collect-based reducer in
    * the engine documents). One window pass for session ids (the
    * sessionize exchange) and one hash aggregation. */
  def sessionDigest(events: DataFrame, entityCol: String, tsCol: String,
                    idCol: String, typeCol: String,
                    gapSeconds: Double): DataFrame = {
    val sess = Relational.sessionize(events, entityCol, tsCol, idCol, gapSeconds)
    sess.groupBy(col(entityCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("duration_us"),
        md5(concat_ws("|",
          transform(
            array_sort(collect_list(struct(col(tsCol).as("t"),
              col(idCol).as("i"), col(typeCol).as("y")))),
            x => x.getField("y")))).as("fp"))
  }

  /** Recency-weighted ("decayed") popularity with EXACT integer
    * arithmetic: each event weighs 2^(−age_days) with a 1-day half-life,
    * scaled by 2^`windowDays` so every weight is a whole power of two —
    * the scaled sum is order-free long arithmetic, bit-identical under
    * any partitioning and in SQL (no floating accumulation at all; the
    * engine's quantize idiom applied to time decay). Events older than
    * the window get weight 0 (explicit truncation; widen `windowDays` to
    * keep more history — the scaled weights stay exact up to ~60).
    * Reference anchor: the recency weighting a production popularity
    * ranker applies before the damped-popularity floor
    * (serve/Recommend's 0.05 damping). Age is measured from the frame's
    * own max timestamp (self-contained and replayable); one narrow map +
    * one hash aggregate. Returns (keys…, n, decayed_scaled,
    * decayed = scaled/2^windowDays rounded 6dp).
    *
    * Overflow budget (the GraphCF-style explicit contract): each weight
    * is ≤ 2^windowDays, so a key's scaled sum is ≤ n·2^windowDays and
    * stays an exact long while its event count n < 2^(63−windowDays) —
    * ~2^33 ≈ 8.6 B events/key at the default 30, ~2^3 at the max 60
    * (widen the window only with correspondingly lighter keys; the
    * boundary is pinned by BehaviorSpec). */
  def decayedCounts(events: DataFrame, keyCols: Seq[Column], tsCol: String,
                    windowDays: Int = 30): DataFrame = {
    require(windowDays >= 1 && windowDays <= 60,
      "windowDays in [1, 60] keeps 2^windowDays-scaled weights exact longs")
    // bounded driver read: ONE row (the engine's guarded-collect contract)
    val ref = events.agg(max(col(tsCol))).head().getTimestamp(0)
    val age = floor((unix_micros(lit(ref)) - unix_micros(col(tsCol))) /
      lit(86400000000.0))
    // 2^(windowDays - age) is exact in IEEE for |exponent| <= 60; the cast
    // floors sub-1 weights (beyond-window events) to 0 on both engines
    val w = pow(lit(2.0), lit(windowDays.toDouble) - age).cast("long")
    events
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"), sum(w).as("decayed_scaled"))
      .withColumn("decayed",
        round(col("decayed_scaled") / lit(math.pow(2.0, windowDays)), 6))
  }

  /** Cohort retention: entities bucketed by the period of their first
    * event (integer periods of `periodSeconds` since the epoch — exact
    * long arithmetic, engine-replayable); for every (cohort, k) the
    * number of entities active k periods after their cohort period.
    * k = 0 is the cohort size itself.
    *
    * Shape: a first-seen min-aggregate, a distinct over (entity, period)
    * — both one exchange on the entity — then an entity-keyed join and a
    * final tiny (cohort, k) count. The distinct collapses within-period
    * activity BEFORE the join, so the joined frame is bounded by
    * entities × active periods, not by raw events. */
  def cohortRetention(events: DataFrame, entityCol: String, tsCol: String,
                      periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be > 0")
    val period = (floor(unix_micros(col(tsCol)) /
      lit(periodSeconds * 1000000.0))).cast("long").as("period")
    val first = events.groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("first_ts"))
      .select(col(entityCol),
        floor(unix_micros(col("first_ts")) / lit(periodSeconds * 1000000.0))
          .cast("long").as("cohort"))
    val active = events.select(col(entityCol), period).distinct()
    active.join(first, Seq(entityCol))
      .select(col("cohort"), (col("period") - col("cohort")).as("k"))
      .groupBy(col("cohort"), col("k"))
      // (entity, period) is distinct and cohort is a function of the
      // entity, so plain count == distinct entities
      .agg(count(lit(1)).as("n_active"))
  }

  /** Markov next-event serving: each entity's LAST event type joined to
    * the top-`k` most likely next types from the first-order transition
    * matrix (the q159 semantics — per-entity consecutive pairs in
    * (ts, id) order). The prediction a session simulator or a prefetch
    * layer reads per user (reference analogue: the A/B simulator's
    * behavior draws, explicit_ratings/ab_test.py — here the argmax-k
    * read side of that chain).
    *
    * Plan shape — the serving trick: top-k is computed on the TINY
    * (from, to) transition aggregate BEFORE any per-entity work, then
    * broadcast; the per-entity leg is one lag-window exchange (the
    * transition counts) and one struct-max aggregate (last event — no
    * second window), so no per-entity ranking ever happens. Ties:
    * last event = latest ts then largest id; next-type ranking by
    * (count desc, type asc). Returns
    * (entity, last_type, next_type, n, rnk). */
  def nextEventTopK(events: DataFrame, entityCol: String, typeCol: String,
                    tsCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol)).orderBy(col(tsCol), col(idCol))
    val trans = events
      .withColumn("from_type", lag(col(typeCol), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val top = Relational.topKPerGroup(trans, Seq(col("from_type")),
      Seq(col("n").desc, col("next_type")), k, rankName = "rnk")
    val last = events
      .groupBy(col(entityCol))
      .agg(max(struct(col(tsCol).as("t"), col(idCol).as("i"),
        col(typeCol).as("y"))).as("m"))
      .select(col(entityCol), col("m.y").as("last_type"))
    last.join(broadcast(top),
        col("last_type") === col("from_type"))
      .select(col(entityCol), col("last_type"), col("next_type"),
        col("n"), col("rnk"))
  }

  /** Rolling active-entity counts — the DAU/WAU engagement series: for
    * every calendar day present in the log, the distinct entities active
    * that day (dau) and within the trailing `windowDays`-day window
    * ending that day (wau), plus stickiness = dau/wau (rounded 6dp).
    *
    * Scale shape: raw events collapse to the DISTINCT (day, entity)
    * frame first (one exchange — bounded by active pairs, not events);
    * the report-day dimension (a few thousand rows for a decade) then
    * broadcasts into a range join that fans each active pair out at most
    * `windowDays` times, and the rolling distinct is a second hash
    * aggregate. No window function over entities, no collect_set of
    * users — a hot day costs its own distinct count, nothing global.
    *
    * The distinct (day, entity) frame is PERSISTED (three legs of the
    * lazy plan reuse it: the day dimension, dau, wau) — the engine's
    * documented cache contract applies, same as GraphCF: call
    * `spark.catalog.clearCache()` between corpora; unpersisting here
    * would silently recompute the distinct once per leg at action
    * time. */
  def rollingActives(events: DataFrame, entityCol: String, tsCol: String,
                     windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val pairs = events
      .select(to_date(col(tsCol)).as("d"), col(entityCol).as("e"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = pairs.select(col("d").as("day")).distinct()
    val dau = pairs.groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("dau")) // pairs are distinct already
    val wau = pairs
      .join(broadcast(days),
        col("d") <= col("day") &&
          col("d") > date_sub(col("day"), windowDays))
      .groupBy(col("day"))
      .agg(countDistinct(col("e")).as("wau"))
    dau.join(wau, "day")
      .withColumn("stickiness", round(col("dau") / col("wau").cast("double"), 6))
  }

  /** Per-group linear trend of DAILY event counts — the monitoring
    * regression (is this event type growing or decaying?): ordinary
    * least squares of count-per-day against the epoch-day index, fit
    * from EXACT integer moment sums (n, Σx, Σy, Σxy, Σx² — all
    * order-free long arithmetic), so the slope/intercept are single
    * correctly-rounded IEEE expressions any engine replays bit-exactly.
    * The engine's quantize idiom applied to regression — no
    * regr_slope() black box, no floating accumulation.
    *
    * Days with zero events contribute NO observation (the series is the
    * days that occur in the log — document gaps upstream if they should
    * count as zeros). Groups with a single day get NULL slope/intercept
    * (the fit is undefined). Two narrow aggregates: (keys, day) counts,
    * then the per-key moment fold. Returns
    * (keys…, n_days, slope, intercept) rounded 6dp. */
  def trendSlopes(events: DataFrame, keyCols: Seq[Column],
                  tsCol: String): DataFrame = {
    // internal columns carry collision-resistant names: the key columns
    // are recovered positionally (dropRight), so a user key named like an
    // internal alias would silently corrupt the grouping — guarded loudly
    val daily = events
      .groupBy(keyCols :+ datediff(to_date(col(tsCol)),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long")
        .as("__graft_x"): _*)
      .agg(count(lit(1)).as("__graft_y"))
    val rawKeys = daily.columns.dropRight(2)
    val reserved = Set("n", "sx", "sy", "sxy", "sxx",
      "n_days", "slope", "intercept")
    require(!rawKeys.exists(k => k.startsWith("__graft_") || reserved(k)),
      s"trendSlopes: key columns ${rawKeys.mkString(", ")} collide with " +
        "the operator's internal/output aliases " +
        s"(${reserved.mkString(", ")}, __graft_*) — rename them")
    val keyNames = rawKeys.map(col)
    val d = daily
      .groupBy(keyNames: _*)
      .agg(count(lit(1)).as("n"), sum(col("__graft_x")).as("sx"),
        sum(col("__graft_y")).as("sy"),
        sum(col("__graft_x") * col("__graft_y")).as("sxy"),
        sum(col("__graft_x") * col("__graft_x")).as("sxx"))
    // det = n·Σx² − (Σx)² — exact long; 0 iff a single distinct day.
    // NULL-ed when 0 so the divisions yield NULL, not ±Inf
    val det = col("n") * col("sxx") - col("sx") * col("sx")
    val detD = when(det =!= 0L, det.cast("double"))
    d.select(keyNames :+ col("n").as("n_days") :+
      round((col("n") * col("sxy") - col("sx") * col("sy")) / detD, 6)
        .as("slope") :+
      round((col("sy") * col("sxx") - col("sx") * col("sxy")) / detD, 6)
        .as("intercept"): _*)
  }

  /** Trailing-window z-score anomalies on the daily count series — the
    * ops alert: each (group, day) observation scored against the mean
    * and population std-dev of the PRECEDING `window` observations
    * (ROWS frame on the per-group daily series, current row excluded —
    * the detector never conditions on the value it is judging). Emits
    * only days with a FULL trailing window.
    *
    * Exactness: window sums (Σy, Σy²) are order-free longs; variance is
    * formed from the exact integer numerator w·Σy² − (Σy)² (never the
    * catastrophic float subtraction), and mean/z are single
    * correctly-rounded IEEE expressions — bit-replayable in SQL. A
    * zero-variance window with y ≠ mean is an anomaly by definition
    * (infinite z; z itself is NULL there). One exchange for the daily
    * aggregate; the window runs on the tiny per-group day series.
    * Returns (keys…, day, y, mean, z, is_anomaly). */
  def trailingAnomalies(events: DataFrame, keyCols: Seq[Column],
                        tsCol: String, window: Int = 7,
                        zThreshold: Double = 2.0): DataFrame = {
    require(window >= 2, "window must be >= 2 (std of one point is 0/0)")
    val daily = events
      .groupBy(keyCols :+ to_date(col(tsCol)).as("day"): _*)
      .agg(count(lit(1)).as("y"))
    // keys recovered positionally — collision-resistant internal aliases
    // plus a loud guard on the output names (same contract as trendSlopes)
    val rawKeys = daily.columns.dropRight(2)
    val reserved = Set("day", "y", "mean", "z", "is_anomaly")
    require(!rawKeys.exists(k => k.startsWith("__graft_") || reserved(k)),
      s"trailingAnomalies: key columns ${rawKeys.mkString(", ")} collide " +
        "with the operator's internal/output aliases " +
        s"(${reserved.mkString(", ")}, __graft_*) — rename them")
    val keyNames = rawKeys.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyNames: _*).orderBy(col("day"))
      .rowsBetween(-window, -1)
    val wl = lit(window.toLong)
    val scored = daily
      .withColumn("__graft_m", count(lit(1)).over(w))
      .withColumn("__graft_s", sum(col("y")).over(w))
      .withColumn("__graft_q", sum(col("y") * col("y")).over(w))
      .filter(col("__graft_m") === wl)
    // varNum = w·Σy² − (Σy)² ≥ 0, exact long
    val varNum = wl * col("__graft_q") - col("__graft_s") * col("__graft_s")
    val mean = col("__graft_s") / wl.cast("double")
    val z = (col("y") - mean) / sqrt(varNum / lit(window.toDouble * window))
    scored.select(keyNames :+ col("day") :+ col("y") :+
      round(mean, 6).as("mean") :+
      when(varNum > 0L, round(z, 6)).as("z") :+
      (when(varNum > 0L, abs(z) >= lit(zThreshold))
        .otherwise(col("y") * wl =!= col("__graft_s"))).as("is_anomaly"): _*)
  }
}
