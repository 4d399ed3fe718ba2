package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators mirroring the reference's pandas surface
  * (SURVEY.md §2.2-§2.7), re-expressed as declarative Spark plans so Catalyst
  * keeps pushdown / pruning / partial aggregation.
  *
  * Scale notes are attached per operator: every helper here is
  * shuffle-conscious — the target is a 1000-executor cluster over ~100 TB,
  * even though tests run on local[32].
  */
object Relational {

  /** Dense 0..N-1 re-index of a sparse id column, rank-by-sorted-distinct-id.
    * Mirrors the reference's `unique → sort → reset_index` idiom
    * (/root/reference/explicit_ratings/functions.py:37-45).
    *
    * Scale: the global `row_number` window funnels through one partition, but
    * only AFTER `distinct()` has shuffled-down to the id cardinality (dims are
    * ~10^4..10^6 ids, not the 10^11-row fact table), so the single-partition
    * stage is tiny. For dimension cardinalities beyond ~10^8 switch to
    * `zipWithIndex` on a sorted RDD.
    */
  def denseReindex(df: DataFrame, idCol: String, orderedIdxCol: String): DataFrame = {
    val w = Window.orderBy(col(idCol))
    df.select(col(idCol)).distinct()
      .withColumn(orderedIdxCol, (row_number().over(w) - 1).cast("long"))
  }

  /** [[denseReindex]] for dimension cardinalities beyond ~10^8, where the
    * window form's single-partition `row_number` stage stops being "tiny":
    * `sortWithinPartitions` after a range repartition gives a globally
    * sorted RDD whose `zipWithIndex` assigns 0..N-1 WITHOUT funneling the
    * ids through one task — Spark computes per-partition counts (one cheap
    * count job) and each partition offsets locally, fully parallel.
    * Identical output to the window form on any input (property-spec'd);
    * costs one extra job, so keep the window form below the crossover. */
  def denseReindexHuge(df: DataFrame, idCol: String, orderedIdxCol: String,
                       numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val ids = df.select(col(idCol)).distinct()
    val ranged = if (numPartitions > 0) ids.repartitionByRange(numPartitions, col(idCol))
                 else ids.repartitionByRange(col(idCol))
    val schema = org.apache.spark.sql.types.StructType(
      ids.schema.fields :+
        org.apache.spark.sql.types.StructField(orderedIdxCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = ranged.sortWithinPartitions(col(idCol)).rdd.zipWithIndex()
      .map { case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(indexed, schema)
  }

  /** Per-group top-k by an explicit total order (ties MUST be broken by the
    * caller's orderCols to stay deterministic). Reference: per-user top-k
    * recommendations (/root/reference/implicit_feedback/functions.py:233-238).
    *
    * Scale: `row_number` over partitionBy(group) is a single hash shuffle on
    * the group key; skewed groups are bounded because only k rows per group
    * survive the filter (Spark 3.4+ pushes rank-limit into the window exec).
    */
  def topKPerGroup(df: DataFrame, partCols: Seq[Column], orderCols: Seq[Column],
                   k: Int, rankName: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankName, row_number().over(w).cast("long"))
      .filter(col(rankName) <= k)
  }

  /** value_counts(normalize=True): relative frequency of each key.
    * Reference: popularity distribution for negative sampling
    * (/root/reference/implicit_feedback/prac_2.py:17-25).
    *
    * Scale: the empty-frame window runs on the AGGREGATED frame (cardinality =
    * #groups, small); the expensive part is the partial+final hash count which
    * Spark map-side combines for free.
    */
  def relativeFreq(df: DataFrame, key: String, cntName: String = "cnt",
                   freqName: String = "freq", scale: Int = 6): DataFrame = {
    val counted = df.groupBy(col(key)).agg(count(lit(1)).as(cntName))
    counted.withColumn(
      freqName,
      round(col(cntName).cast("double") / sum(col(cntName)).over(Window.partitionBy()), scale))
  }

  /** Frequency-of-frequencies (degree distribution), two-level count.
    * Reference: power-law plot prep (/root/reference/explicit_ratings/prac_1_plotting.py:89-121). */
  def freqOfFreq(df: DataFrame, key: String,
                 lvl1Name: String, lvl2Name: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as(lvl1Name))
      .groupBy(col(lvl1Name)).agg(count(lit(1)).as(lvl2Name))

  /** Running total over an explicit ROWS frame (reference: CSR offset cumsum,
    * /root/reference/explicit_ratings/functions.py:238-242). Partitioned: one
    * shuffle on partCol; within-partition sort only. */
  def runningSum(df: DataFrame, partCol: String, orderCol: String,
                 valueCol: String, outName: String): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outName, sum(col(valueCol)).over(w))
  }

  /** Exact GLOBAL strictly-below prefix sum — Σ of `weightCol` over all
    * rows whose `keyCol` sorts strictly before this row's — WITHOUT a
    * single-partition window: range-repartition on the key (contiguous,
    * ordered buckets), a per-bucket ROWS-frame prefix window, and a
    * ≤`buckets`-row bucket-offset frame broadcast back. The textbook
    * distributed prefix scan; the result is bucket-boundary-INDEPENDENT
    * (any contiguous ordered bucketing yields the same prefix), so the
    * range sampler's boundaries never leak into the output and the op is
    * exactly replayable. This is what a global rank/CDF computation looks
    * like at 10^11 rows — `denseReindex`'s single-partition window is the
    * small-dimension shortcut, this is the scale path.
    *
    * `keyCol` values must be DISTINCT (pre-aggregate duplicates into
    * `weightCol` first): the range partitioner may split equal keys
    * across two buckets, which would leak part of a key's own weight
    * into its "below" sum. Keys must be non-null. */
  def globalCumBelow(df: DataFrame, keyCol: String, weightCol: String,
                     outName: String, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val b = df.repartitionByRange(buckets, col(keyCol))
      .withColumn("__gcb_bucket", spark_partition_id())
    // bucket totals: <= buckets rows — the ONLY global window runs here
    val off = b.groupBy(col("__gcb_bucket"))
      .agg(sum(col(weightCol)).as("__gcb_tot"))
      .withColumn("__gcb_off",
        coalesce(sum(col("__gcb_tot")).over(Window.orderBy(col("__gcb_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__gcb_tot")
    val w = Window.partitionBy(col("__gcb_bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(off), "__gcb_bucket")
      .withColumn(outName, col("__gcb_off") + sum(col(weightCol)).over(w)
        - col(weightCol))
      .drop("__gcb_bucket", "__gcb_off")
  }

  /** Deterministic group-size equalization: keep the first `minCount` rows of
    * each group, ordered by orderCol. Deterministic re-expression of the
    * reference's random surplus-drop (/root/reference/explicit_ratings/ab_test.py:240-265);
    * the seeded-random variant is `equalizeGroupsRandom`. */
  def equalizeGroups(df: DataFrame, groupCol: String, orderCol: String): DataFrame = {
    val minCnt = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
      .agg(min(col("__cnt")).as("__min_cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(minCnt))
      .filter(col("__rn") <= col("__min_cnt"))
      .drop("__rn", "__min_cnt")
  }

  /** Seeded-random variant of the reference's A/B group equalization
    * (shuffle rows within each group, keep minCount of each), deterministic
    * under ANY partitioning
    * or cluster size: surplus rows are chosen by a hash-derived uniform over
    * the row's key columns (`rand(seed)` is per-partition-sequence and would
    * make the dropped set depend on the physical layout). `keyCols` must
    * identify rows within a group for the order to be total. */
  def equalizeGroupsRandom(df: DataFrame, groupCol: String, seed: Long,
                           keyCols: Seq[String]): DataFrame = {
    val minCnt = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
      .agg(min(col("__cnt")).as("__min_cnt"))
    val hashed = xxhash64(keyCols.map(col) :+ lit(seed): _*)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashed +: keyCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(minCnt))
      .filter(col("__rn") <= col("__min_cnt"))
      .drop("__rn", "__min_cnt")
  }

  /** Gap-based sessionization: a new session starts when the time since the
    * previous event for the same user exceeds `gapSeconds`. Batch analogue of
    * the streaming session-window operator (graft.streaming).
    *
    * Scale: one shuffle on userCol; lag + running sum share the same window
    * sort, so Spark plans a single WindowExec.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, idCol: String,
                 gapSeconds: Double, outName: String = "session_id"): DataFrame = {
    val order = Seq(col(tsCol), col(idCol))
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    // exact integer-microsecond gap compare (a double-seconds cast is
    // fp-fragile for sub-second thresholds at large epochs, and the oracle
    // compares epoch_us integers)
    val gapUs = unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w)
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__new_session",
        when(gapUs > math.round(gapSeconds * 1e6), 1).otherwise(0))
      .withColumn(outName, sum(col("__new_session")).over(frame).cast("long"))
      .drop("__new_session")
  }

  /** Fixed-width histogram: rows bucketed by floor(value / binWidth) per
    * group — the distribution profile a pipeline collects before choosing
    * quality/filter thresholds. floor of an IEEE division is exact and
    * engine-agnostic (no round() knife edges); one map-side-partial hash
    * aggregation, output is one row per non-empty bin. */
  def histogram(df: DataFrame, keyCols: Seq[Column], valueCol: Column,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    df.groupBy(keyCols :+ floor(valueCol / binWidth).cast("long").as("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Trailing moving average over the last `n` rows per key (current row
    * included), as an EXPLICIT lag chain rather than a sliding window
    * frame: Spark re-aggregates sliding frames in row order while other
    * engines (DuckDB) use a segment tree, so a frame-based avg(DOUBLE) is
    * not bit-reproducible across engines — the lag chain fixes the
    * association order `((v + lag1) + lag2) / k` in the expression itself.
    * Intended for small fixed n (the common smoothing case); for wide
    * windows use a frame-based avg and accept engine-local rounding.
    * One shuffle on the keys; all lags share one window sort. */
  def movingAvg(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
                valueCol: Column, n: Int, outName: String = "moving_avg"): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    val lags = (1 until n).map(i => lag(valueCol, i).over(w))
    val total = lags.foldLeft(valueCol)((acc, l) => acc + coalesce(l, lit(0.0)))
    val cnt = least(row_number().over(w), lit(n)).cast("double")
    df.withColumn(outName, total / cnt)
  }

  /** Long-to-wide pivot with count aggregation: one output row per key,
    * one BIGINT count column per `values` entry (absent combinations are
    * 0, not null). Formulated as conditional aggregation — one
    * `count(when(pivot = v, 1))` per declared category — NOT the built-in
    * `.pivot()`: values-less pivot runs a distinct-collect pre-job over
    * the pivot column, and even values-declared pivot plans TWO exchanges
    * (pre-aggregate on (key, pivot), re-aggregate on key). Conditional
    * aggregation is ONE map-side-partial hash aggregation with a single
    * exchange on the key. An undeclared category is dropped rather than
    * silently growing the schema. */
  def pivotCounts(df: DataFrame, keyCol: Column, keyName: String,
                  pivotCol: String, values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "values must be non-empty")
    // a duplicated category would emit two identically-named columns and
    // make every downstream col(name) reference ambiguous
    require(values.distinct.size == values.size, "values must be distinct")
    val aggs = values.map(v => count(when(col(pivotCol) === v, 1)).as(v))
    df.groupBy(keyCol.as(keyName))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fixed-interval time-series resampling with gap-fill and forward
    * fill — the event-log → regular-grid step a feature/monitoring
    * pipeline runs before windowed models. Per key: bucket events into
    * `intervalSec` bins, keep the LAST observed value per bin (picked by
    * (ts, id) order — picking, not summing, so the result is exact and
    * engine-reproducible even for DOUBLE values), densify to the key's
    * full [min_bin, max_bin] range via `sequence` + `explode`, and
    * forward-fill empty bins with the last observed value
    * (`last(ignoreNulls)`); `n_events` is 0 for gap bins.
    *
    * Scale: the expensive input shuffles ONCE on (key, bin) for the
    * per-bin aggregate; the grid explode runs on the per-key extent
    * frame (cardinality = #keys) and the final join + forward-fill
    * window shuffle only grid-sized data (#keys × #bins, tiny vs the
    * event log). Gap bins never materialize per-event data. The bin
    * compare is exact integer microseconds (no fp epoch casts). */
  def resample(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
               valueCol: String, intervalSec: Long): DataFrame = {
    require(intervalSec > 0, "intervalSec must be positive")
    val usPerBin = intervalSec * 1000000L
    // floor-division in exact long arithmetic: subtract the (always
    // non-negative) pmod remainder first, so the double division divides
    // evenly and rounds to the exact integer — no floor(fp-quotient)
    // knife edges at bin boundaries
    val us = unix_micros(col(tsCol))
    val binned = df.withColumn("bin",
      ((us - pmod(us, lit(usPerBin))) / usPerBin).cast("long"))
    // persisted: the per-key extent (grid) and the gap-fill join both
    // consume this frame, and column pruning specializes the two subtrees
    // enough that exchange reuse cannot deduplicate them — without the
    // persist the EVENT LOG is scanned twice. Cardinality is (keys ×
    // active bins), far below the log. Cache lifecycle: same contract as
    // the pair generators — `spark.catalog.clearCache()` between runs.
    val perBin = binned.groupBy(col(keyCol), col("bin"))
      .agg(max_by(col(valueCol), struct(col(tsCol), col(idCol))).as("__last_v"),
        count(lit(1)).as("n_events"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = perBin.groupBy(col(keyCol))
      .agg(min(col("bin")).as("__lo"), max(col("bin")).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as("bin"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBin, Seq(keyCol, "bin"), "left")
      .select(col(keyCol), col("bin"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("__last_v"), ignoreNulls = true).over(w).as("filled_value"))
  }

  /** Keyed upsert (MERGE): rows from `updates` replace same-key rows in
    * `base`; unmatched rows from both sides survive. The file-layout
    * MERGE primitive for dimension refresh where no transaction-log
    * format is available: full-outer join on the key, update side wins
    * per column. Schemas must match (enforced) — the operator is a
    * row-level merge, not a schema migration. At scale the updates side
    * is typically a trickle against a large dim: Spark broadcasts it
    * automatically under the threshold, and the output overwrites the dim
    * via [[Layout.writePartitioned]] / a plain parquet rewrite.
    *
    * PRECONDITION: `updates` must be key-unique — a duplicated update key
    * fans the matched base row out into contradictory output rows (SQL
    * MERGE raises here; this primitive cannot without an extra pass).
    * Run [[Checks.duplicateKeys]] on an untrusted source first. Null keys
    * are handled null-SAFELY: a null-keyed update row matches a
    * null-keyed base row (and wins), not silently dropped. */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(base.columns.toSeq == updates.columns.toSeq,
      s"schemas must match: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val valueCols = base.columns.filterNot(keyCols.contains)
    // explicit presence marker: "did an update row match" must not be
    // inferred from key nullness (a legitimately-null key would read as
    // absent and lose its update values)
    val u = updates.select(updates.columns.map(c => col(c).as(s"__u_$c")) :+
      lit(true).as("__u_present"): _*)
    val joinCond = keyCols.map(k => col(k) <=> col(s"__u_$k")).reduce(_ && _)
    base.join(u, joinCond, "full_outer")
      .select(
        keyCols.map(k =>
          when(col("__u_present"), col(s"__u_$k")).otherwise(col(k)).as(k)) ++
          valueCols.map { c =>
            // the UPDATE ROW wins wholesale: an update may legitimately
            // set a value column to null
            when(col("__u_present"), col(s"__u_$c")).otherwise(col(c)).as(c)
          }: _*)
  }

  /** Session funnel analysis: how many sessions reach each step of an
    * ordered event-type funnel (view → click → purchase...). A session
    * reaches step i when every step j <= i occurred and their FIRST
    * occurrences are strictly increasing in event time (ties in exact
    * microseconds do not advance the funnel — documented, and what the
    * SQL oracle replays). Composes [[sessionize]] with one per-session
    * aggregate and one global rollup: two exchanges total (user hash for
    * the session window, then (user, session) hash — the second is
    * near-free since sessions nest inside users), output is ONE row. */
  def funnelSteps(df: DataFrame, userCol: String, tsCol: String, idCol: String,
                  typeCol: String, gapSeconds: Double,
                  steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(!steps.contains("sessions"),
      "step name 'sessions' collides with the built-in n_sessions column")
    val sessions = sessionize(df, userCol, tsCol, idCol, gapSeconds)
    val us = unix_micros(col(tsCol))
    val firstTs = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(typeCol) === s, us)).as(s"__t$i")
    }
    val perSession = sessions
      .groupBy(col(userCol), col("session_id"))
      .agg(firstTs.head, firstTs.tail: _*)
    val reached = steps.indices.map { i =>
      (0 to i).map(j => col(s"__t$j").isNotNull)
        .reduce(_ && _) &&
        (1 to i).map(j => col(s"__t${j - 1}") < col(s"__t$j"))
          .foldLeft(lit(true))(_ && _)
    }
    perSession.agg(
      count(lit(1)).as("n_sessions"),
      reached.zip(steps).map { case (r, s) =>
        count(when(r, 1)).as(s"n_$s")
      }: _*)
  }

  /** Deterministic k-fold assignment for cross-validation, stratified:
    * within each stratum, rows ordered by `orderCol` get folds
    * round-robin — EXACT balance (fold sizes differ by ≤ 1 per stratum)
    * and replayable on any engine (`(row_number − 1) mod k`). The
    * returned frame also carries `fold_hash`, the order-free scale path:
    * the engine's standard LCG over the id (the [[graft.ops.TextOps]]
    * sampling generator), which needs NO window — approximate balance,
    * one narrow map. Use `fold` when exact balance matters and the
    * strata are window-sized; `fold_hash` for corpus-scale assignment
    * where a per-stratum sort is not worth it.
    *
    * Shape: one window partitioned by the strata (the exact path's
    * honest cost — a hash exchange + in-partition sort); the hash path
    * adds zero exchanges. Leakage caveat: k-fold assigns IDs, not
    * near-duplicate groups — on a deduplicated corpus compose with
    * [[graft.ops.Dedup.clusterSafeSplit]] semantics first. */
  def kFoldAssign(df: DataFrame, strataCols: Seq[Column], orderCol: Column,
                  idCol: Column, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val w = Window.partitionBy(strataCols: _*).orderBy(orderCol)
    df.withColumn("fold", ((row_number().over(w) - 1) % k).cast("long"))
      // the shared replayable LCG draw (TextOps.lcgState — the SQL
      // oracles replay these exact constants)
      .withColumn("fold_hash",
        pmod(shiftright(TextOps.lcgState(idCol), 16), lit(k.toLong)))
  }

  /** Per-group winsorization: clamp a value column to its group's
    * [pLo, pHi] exact percentiles — the outlier-capping step run on
    * quality scores / feature columns before thresholding, where dropping
    * outlier rows (the filter alternative) would lose the documents.
    * Same two-pass shape as [[groupZScore]]: a tiny per-group bounds
    * aggregate (exact `percentile`, one shuffle of the fact rows for the
    * sort-based agg) broadcast-joined back onto the rows; the clamp
    * itself is a narrow `greatest`/`least` map. Bounds are rounded to
    * `scale` decimals so downstream engines replay the clamp decision
    * bit-for-bit (the raw interpolated percentile differs in final-ulp
    * association across engines). The bounds join is NULL-SAFE (`<=>`):
    * `groupBy` puts null-key rows in their own group, so the join must
    * match them back to that group's bounds rather than silently dropping
    * them (the plain equi-join behavior). */
  def winsorize(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                pLo: Double, pHi: Double, outName: String = "winsorized",
                scale: Int = 6): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val bounds = df.groupBy(keyCols.map(col): _*)
      .agg(round(percentile(valueCol, lit(pLo)), scale).as("__lo"),
        round(percentile(valueCol, lit(pHi)), scale).as("__hi"))
    nullSafeBroadcastJoin(df, bounds, keyCols)
      // least/greatest SKIP null inputs, which would silently clamp a
      // null value to the upper bound — nulls must stay null
      .withColumn(outName, when(valueCol.isNull, lit(null))
        .otherwise(greatest(least(valueCol, col("__hi")), col("__lo"))))
      .drop("__lo", "__hi")
  }

  /** Per-group z-score standardization — the feature/quality-score
    * normalization step run before thresholding or model input. TWO-PASS:
    * a tiny per-group (mean, stddev) aggregate is broadcast-joined back
    * onto the rows. A whole-partition window would compute the same thing
    * but caps parallelism at the number of groups (5 event types = 5
    * tasks, the product-shuffle trap [[Similarity]]'s TopK also avoids);
    * the two-pass shape aggregates map-side and never re-partitions the
    * fact rows. A degenerate group (n = 1 or zero variance) yields null z
    * (nullif guard), not a division error. The stats join is NULL-SAFE
    * (`<=>`) for the same reason as [[winsorize]]: null-key rows belong to
    * `groupBy`'s null group and must not be dropped by the join-back. */
  def groupZScore(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                  outName: String = "z"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(avg(valueCol).as("__mean"), stddev_samp(valueCol).as("__sd"))
    nullSafeBroadcastJoin(df, stats, keyCols)
      .withColumn(outName, (valueCol - col("__mean")) / nullif(col("__sd"), lit(0.0)))
      .drop("__mean", "__sd")
  }

  /** Broadcast-join `small` (a per-group aggregate of `df`) back onto `df`
    * with NULL-SAFE key equality, keeping a single copy of the key
    * columns. `<=>` has no `usingColumns` form, so the small side's keys
    * are renamed, matched with null-safe conditions, and dropped. */
  private def nullSafeBroadcastJoin(df: DataFrame, small: DataFrame,
                                    keyCols: Seq[String]): DataFrame = {
    val renamed = keyCols.foldLeft(small)((d, k) => d.withColumnRenamed(k, s"__k_$k"))
    val cond = keyCols.map(k => df(k) <=> renamed(s"__k_$k")).reduce(_ && _)
    keyCols.foldLeft(df.join(broadcast(renamed), cond))((d, k) => d.drop(s"__k_$k"))
  }
}
