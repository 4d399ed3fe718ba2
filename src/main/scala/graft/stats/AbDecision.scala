package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The reference's A/B DECISION pipeline as one distributed plan
  * (/root/reference/explicit_ratings/ab_test.py:268-391, SURVEY.md §2.10
  * X3/X5/X6): group sufficient statistics → Levene equal-variance gate →
  * the gated Student-or-Welch two-sample t — plus the rank-sum robustness
  * row the reference falls back to — emitted as
  * (test_name, statistic, p_band, reject_null) decision rows.
  *
  * Replayability contract (what makes this ORACLE-checkable, unlike the
  * driver-side [[Tests]] which owns the exact finite-df p-values):
  *
  *  - Every statistic is a fixed arithmetic expression over group
  *    aggregates (n, mean, var_samp, Σ|x−med|, Σ(x−med)², exact-long rank
  *    sums), written with the SAME operation order in Spark and the
  *    oracle SQL, rounded to 6dp like every moment query (q33 contract).
  *  - Banding and decisions use the LARGE-SAMPLE (normal / χ²₁) critical
  *    values as fixed 6dp literals — 1.959964 / 2.575829 / 3.290527 for
  *    two-sided z|t, 3.841459 / 6.634897 / 10.827566 for Levene's W —
  *    applied to the ROUNDED statistic, so both engines branch on
  *    identical values. At the gate scales df > 10⁴, where the exact-df
  *    thresholds agree with these to 4+ decimals; the exact finite-df
  *    p-values remain available via [[Tests.tTestFromMoments]] on the
  *    same moments (TestsSpec cross-checks band consistency).
  *  - The rank-sum statistic's rank sum is EXACT integer arithmetic:
  *    2·Σ ranks = Σ_v ca(v)·(2·below(v) + c(v) + 1) in longs, with the
  *    strictly-below counts from [[graft.ops.Relational.globalCumBelow]]
  *    — the bucketed distributed prefix, no single-partition window over
  *    the value domain. Long budget: n² < 2⁶³ ⇒ n < 3·10⁹ combined rows
  *    (document-scale corpora; beyond that pre-bucket the metric).
  *
  * Scale shape: two passes over the metric frame (one for medians — the
  * exact-percentile contract shared with q34 — one for moments + the
  * distinct-value rank frame); everything downstream is group-cardinality
  * or 1-row. The metric frame is persisted across its three consuming
  * legs, and the 1-row statistic frame is persisted so the three decision
  * rows don't re-execute the aggregation subtree (the documented cache
  * contract — clear between corpora). */
object AbDecision {

  private def zBand(absStat: Column): Column =
    when(absStat > 3.290527, "<0.001")
      .when(absStat > 2.575829, "<0.01")
      .when(absStat > 1.959964, "<0.05")
      .otherwise(">=0.05")

  /** Run the pipeline over `df` with a two-level `grpCol` (the A/B arms)
    * and a numeric `valueCol`. Returns exactly three rows ordered by
    * test_name: 'levene' (reject = variances differ), the GATED
    * 'student_t' or 'welch_t' (reject = means differ), and 'rank_sum'
    * (reject = distributions shifted). Group labels are compared as
    * strings; the arm sorting FIRST is "group 1" (sign convention of the
    * t and z statistics). Requires exactly two non-empty arms. */
  def decide(df: DataFrame, grpCol: Column, valueCol: Column,
             buckets: Int = 64): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val ev = df.select(grpCol.cast("string").as("grp"),
      valueCol.cast("double").as("value")).persist(lvl)
    // bounded 2-row driver read (guarded-collect contract): the arm
    // labels, needed to pivot group aggregates into one stats row
    val arms = ev.select(col("grp")).distinct().limit(3)
      .collect().map(_.getString(0)).sorted
    require(arms.length == 2,
      s"AbDecision.decide needs exactly two arms, got ${arms.mkString(", ")}")
    val (g1, g2) = (arms(0), arms(1))
    // Levene centers: exact per-arm medians (the q34 exact-percentile
    // contract) — a 2-row frame broadcast back into the metric scan
    val med = ev.groupBy(col("grp"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val gm = ev.join(broadcast(med), "grp")
      .select(col("grp"), col("value"),
        abs(col("value") - col("med")).as("z"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("m"),
        var_samp(col("value")).as("v"),
        sum(col("z")).as("sz"), sum(col("z") * col("z")).as("szz"))
    def arm(g: String, sfx: String) = gm.filter(col("grp") === g)
      .select(col("n").as("n" + sfx), col("m").as("m" + sfx),
        col("v").as("v" + sfx), col("sz").as("sz" + sfx),
        col("szz").as("szz" + sfx))
    // rank-sum sufficient statistic, EXACT longs: group by value (makes
    // keys distinct for the prefix op), strictly-below counts via the
    // bucketed global prefix, then 2·Σ ranks(arm1) in one long sum
    val byVal = ev.groupBy(col("value"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("grp") === g1, 1L).otherwise(0L)).as("ca"))
    val rs = graft.ops.Relational
      .globalCumBelow(byVal, "value", "c", "below", buckets)
      .agg(sum(col("ca") * (lit(2L) * col("below") + col("c") + lit(1L)))
        .as("sra2"))
    // one persisted 1-row frame carries every statistic; the three
    // decision rows below are cheap selects over it
    val cc = arm(g1, "1").crossJoin(arm(g2, "2")).crossJoin(rs)
      .withColumn("nT", col("n1") + col("n2"))
      .withColumn("d1", col("sz1") / col("n1")
        - (col("sz1") + col("sz2")) / col("nT"))
      .withColumn("d2", col("sz2") / col("n2")
        - (col("sz1") + col("sz2")) / col("nT"))
      .withColumn("w_stat", round((col("nT") - 2)
        * (col("n1") * col("d1") * col("d1")
          + col("n2") * col("d2") * col("d2"))
        / ((col("szz1") - col("sz1") * col("sz1") / col("n1"))
          + (col("szz2") - col("sz2") * col("sz2") / col("n2"))), 6))
      .withColumn("equal_var", col("w_stat") <= 3.841459)
      .withColumn("sp2", ((col("n1") - 1) * col("v1")
        + (col("n2") - 1) * col("v2")) / (col("nT") - 2))
      .withColumn("t_stat", round(
        when(col("equal_var"), (col("m1") - col("m2"))
          / sqrt(col("sp2") * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))))
          .otherwise((col("m1") - col("m2"))
            / sqrt(col("v1") / col("n1") + col("v2") / col("n2"))), 6))
      .withColumn("z_stat", round(
        (col("sra2") / lit(2.0) - col("n1") * (col("nT") + lit(1L)) / lit(2.0))
          / sqrt(col("n1").cast("double") * col("n2") * (col("nT") + lit(1L))
            / lit(12.0)), 6))
      .persist(lvl)
    cc.select(lit("levene").as("test_name"), col("w_stat").as("statistic"),
        when(col("w_stat") > 10.827566, "<0.001")
          .when(col("w_stat") > 6.634897, "<0.01")
          .when(col("w_stat") > 3.841459, "<0.05")
          .otherwise(">=0.05").as("p_band"),
        (col("w_stat") > 3.841459).as("reject_null"))
      .unionByName(cc.select(
        when(col("equal_var"), "student_t").otherwise("welch_t")
          .as("test_name"),
        col("t_stat").as("statistic"), zBand(abs(col("t_stat"))).as("p_band"),
        (abs(col("t_stat")) > 1.959964).as("reject_null")))
      .unionByName(cc.select(lit("rank_sum").as("test_name"),
        col("z_stat").as("statistic"), zBand(abs(col("z_stat"))).as("p_band"),
        (abs(col("z_stat")) > 1.959964).as("reject_null")))
      .orderBy(col("test_name"))
  }

  /** Exact Shapiro-Wilk normality check of a one-arm metric frame,
    * DISTRIBUTED: the driver never materializes the arm — it reads only
    * the ≤ 5000 evenly-spaced order statistics [[graft.stats.Tests
    * .shapiroWilk]] itself reduces to (Royston's AS R94 validity range),
    * recovered EXACTLY via the bucketed global prefix
    * ([[graft.ops.Relational.globalCumBelow]]): order statistic at index
    * k is the value whose cumulative range [below, below + c) contains
    * k, and the target indices replicate shapiroWilk's own
    * `i·(n−1) div 4999` grid, so this equals `shapiroWilk(arm.collect)`
    * BIT-EXACTLY at every n (AbGateSpec pins both branches) while the
    * driver read stays bounded (the guarded-collect contract). Returns
    * (n, TestResult). */
  def shapiroWilkD(df: DataFrame, valueCol: Column,
                   buckets: Int = 64): (Long, Tests.TestResult) =
    armShapiro(df.select(valueCol.cast("double").as("value")), buckets)

  private def armShapiro(arm: DataFrame, buckets: Int): (Long, Tests.TestResult) = {
    val vc = arm.groupBy(col("value")).agg(count(lit(1)).as("c"))
    val below = graft.ops.Relational
      .globalCumBelow(vc, "value", "c", "below", buckets)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = below.agg(sum(col("c"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    require(n >= 3, s"armShapiro needs n >= 3, got $n")
    val maxN = 5000
    val ks: Array[Long] =
      if (n <= maxN) Array.tabulate(n.toInt)(_.toLong)
      else Array.tabulate(maxN)(i => i.toLong * (n - 1) / (maxN - 1))
    val spark = arm.sparkSession
    import spark.implicits._
    val sample = below
      .join(broadcast(ks.toSeq.toDF("k")),
        col("k") >= col("below") && col("k") < col("below") + col("c"))
      .select(col("k"), col("value")).orderBy(col("k"))
      .collect().map(_.getDouble(1))
    below.unpersist()
    (n, Tests.shapiroWilk(sample))
  }

  /** The NORMALITY-GATED decision — the reference's actual test-selection
    * flow (ab_test.py:288-302): Shapiro-Wilk on each arm decides whether
    * the parametric t (itself Levene-gated, [[decide]]'s row) or the
    * rank-sum test carries the experiment readout. Emits three
    * (test_name, statistic, p_band, reject_null) rows: 'normality_a' /
    * 'normality_b' (statistic = the SAMPLE SIZE the AS R94 approximation
    * ran at, ≤ 5000 — oracle-replayable as least(n, 5000); reject_null =
    * normality rejected) and the ONE gated test row.
    *
    * Oracle contract (the q174 replayability discipline, adapted for a
    * driver-side statistic): the W value itself is not SQL-expressible,
    * so the DECISION is what the oracle checks — the normality rows emit
    * the COARSE verdict ('reject'/'accept', the same predicate as
    * reject_null — no finer band than the gate itself needs, so the
    * oracle tolerates p drift WITHIN a verdict while still catching
    * every gate flip), and the gated row's statistic is the fully
    * replayable [[decide]] algebra: a wrong W, a wrong p transform, or
    * a wrong gate flips test_name or reject_null and the hash catches
    * it. A KNIFE-EDGE corpus — either arm's Shapiro p within `pinEps`
    * of `alpha` — fails LOUDLY instead of silently hash-matching stale
    * pinned literals (the q198 oracle asserts the verdicts; near the
    * edge that assertion needs a human, not a hash). W's numeric
    * correctness is pinned by TestsSpec (published worked examples) and
    * AbGateSpec (distributed == driver-side bit-equality).
    *
    * Scale shape: per-arm value-count aggregation + the bucketed global
    * prefix (the rank-sum machinery reused), a ≤ 5000-row driver read
    * per arm, then [[decide]]'s two-pass plan for the gated row. */
  def decideNormalityGated(df: DataFrame, grpCol: Column, valueCol: Column,
                           alpha: Double = 0.05,
                           buckets: Int = 64,
                           pinEps: Double = 1e-3): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val ev = df.select(grpCol.cast("string").as("grp"),
      valueCol.cast("double").as("value")).persist(lvl)
    // the knife-edge tripwire and the two-arms require are DESIGNED throw
    // paths: release the persisted (grp, value) projection before
    // propagating, or a tripped gate strands a full-corpus cache entry
    // until an external clearCache. The SUCCESS path keeps ev cached — the
    // returned gated rows still read it (the decide() cache contract:
    // clear between corpora).
    try {
    val arms = ev.select(col("grp")).distinct().limit(3)
      .collect().map(_.getString(0)).sorted
    require(arms.length == 2,
      s"decideNormalityGated needs exactly two arms, got ${arms.mkString(", ")}")
    val (nA, swA) = armShapiro(ev.filter(col("grp") === arms(0)), buckets)
    val (nB, swB) = armShapiro(ev.filter(col("grp") === arms(1)), buckets)
    // knife-edge tripwire: the oracle pins the normality verdicts as
    // literals, so a corpus whose p drifts to the alpha boundary must
    // fail loudly here — never silently hash-match a stale verdict
    for ((tag, sw) <- Seq(arms(0) -> swA, arms(1) -> swB))
      require(math.abs(sw.pValue - alpha) > pinEps,
        s"decideNormalityGated: arm '$tag' Shapiro p=${sw.pValue} is within " +
          s"$pinEps of alpha=$alpha — the pinned-verdict oracle cannot " +
          "certify a knife-edge gate; re-pin the oracle from a human read " +
          "or widen alpha")
    // reject normality iff p < alpha (the scipy convention); the gate and
    // the emitted verdict rows share the SAME predicate by construction
    val rejA = swA.pValue < alpha
    val rejB = swB.pValue < alpha
    val normal = !rejA && !rejB
    val gated =
      if (normal) decide(ev, col("grp"), col("value"), buckets)
        .filter(col("test_name").isin("student_t", "welch_t"))
      else decide(ev, col("grp"), col("value"), buckets)
        .filter(col("test_name") === "rank_sum")
    // the coarse verdict IS the p_band for the normality rows: no finer
    // band than the gate needs, so the oracle's pin survives p drift
    // within a verdict while any gate flip still flips the hash
    def verdict(rej: Boolean) = if (rej) "reject" else "accept"
    val spark = df.sparkSession
    import spark.implicits._
    val normRows = Seq(
      ("normality_a", math.min(nA, 5000L).toDouble, verdict(rejA), rejA),
      ("normality_b", math.min(nB, 5000L).toDouble, verdict(rejB), rejB))
      .toDF("test_name", "statistic", "p_band", "reject_null")
    normRows.unionByName(gated).orderBy(col("test_name"))
    } catch {
      case t: Throwable =>
        ev.unpersist(blocking = false)
        throw t
    }
  }

  /** The two-proportion z statistic over the pivoted (n1, s1, n2, s2)
    * counts — ONE expression string used verbatim by both the Spark plan
    * and the oracle SQL, so the IEEE operation order is identical by
    * construction (the [[decide]] replayability contract). */
  val propZSql: String = {
    val phat = "(CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    "round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) " +
      "- CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) " +
      s"/ sqrt($phat * (1.0 - $phat) " +
      "* (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))), 6)"
  }

  /** Pearson chi-square for the 2×2 table, shared like [[propZSql]]. The
    * cross-product difference s1·(n2−s2) − s2·(n1−s1) is EXACT long
    * arithmetic before the one cast (budget: n ≤ 3·10⁹ keeps it in
    * range — the same combined-rows budget as the rank sum). */
  val propChiSql: String = {
    val d = "CAST(s1 * (n2 - s2) - s2 * (n1 - s1) AS DOUBLE)"
    s"round(CAST(n1 + n2 AS DOUBLE) * $d * $d " +
      "/ (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) " +
      "* CAST(s1 + s2 AS DOUBLE) " +
      "* CAST((n1 - s1) + (n2 - s2) AS DOUBLE)), 6)"
  }

  /** The BINARY-metric A/B decision — two-proportion z and the 2×2
    * chi-square over per-unit success flags: the conversion-rate sibling
    * of [[decide]] (the reference tests continuous user scores,
    * ab_test.py:268-391; a conversion experiment tests proportions).
    * `df` carries one row per experimental UNIT (the q176 lesson: test
    * users, not raw events) with a 0/1 `successCol`.
    *
    * Same replayability contract as [[decide]]: the pivoted counts
    * (n1, s1, n2, s2) are exact longs; both statistics evaluate ONE
    * shared expression string ([[propZSql]]/[[propChiSql]]) so either
    * engine produces bit-identical doubles; bands and decisions branch
    * on the ROUNDED statistic against the same fixed large-sample
    * critical literals (χ²₁ = z² for the pooled two-sided test, so the
    * two rows must agree — a built-in consistency check the spec pins).
    * Scale shape: one pass over the unit frame into a 1-row pivot;
    * everything downstream is constant-size. Refuses degenerate tables
    * (an all-success or all-fail experiment has no variance to test)
    * via the bounded 1-row read that also enforces the long budget. */
  /** Per-batch additive partial for the standing CONVERSION-COUNTER
    * store — the experiment-family sibling of
    * [[graft.ops.GraphCF.writeEdgeBatch]]: one (unit, cnt) row per unit
    * ACTIVE in the batch, cnt = its success events there (zero-success
    * active units keep their row, so the fold sees every experimental
    * unit, not just converters). Batch-id-keyed overwrite = replay
    * idempotent. A deployment's event stream lands here; the readout
    * ([[unitCounts]] → [[decideProportions]]) never replays the raw
    * log. */
  def writeUnitCountBatch(batch: DataFrame, unitCol: Column,
                          successEvent: Column, path: String,
                          batchId: Long): Unit =
    batch.groupBy(unitCol.as("unit"))
      .agg(sum(when(successEvent, 1L).otherwise(0L)).as("cnt"))
      .write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** The standing per-unit success totals folded from the
    * [[writeUnitCountBatch]] partials: long sums are order-free, so the
    * fold is bit-equal to counting over the concatenated batches — the
    * store-equals-one-shot contract every standing store here carries
    * (q173/q175 pattern; q182's oracle replays the one-shot build). */
  def unitCounts(spark: org.apache.spark.sql.SparkSession,
                 path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("unit")).agg(sum(col("cnt")).as("cnt"))

  /** The CUPED per-unit adjustment expression over the quantized columns
    * (__pre_q, __post_q) and the 1-row exact moments (__n, __sp, __num,
    * __den) — ONE string shared verbatim by the Spark plan and the
    * oracle SQL, so the IEEE operation order is identical by
    * construction. θ = __num/__den and mean(pre) = __sp/__n are each ONE
    * cast-then-divide of exact integers both engines hold bit-equal. */
  val cupedAdjSql: String =
    "round((CAST(__post_q AS DOUBLE) " +
      "- (CAST(__num AS DOUBLE) / CAST(__den AS DOUBLE)) " +
      "* (CAST(__pre_q AS DOUBLE) - CAST(__sp AS DOUBLE) / CAST(__n AS DOUBLE))) " +
      "/ 1000.0, 6)"

  /** CUPED variance reduction (Deng, Xu, Kohavi, Walker — WSDM 2013,
    * the industry-standard pre-experiment covariate adjustment):
    *   adjusted(u) = post(u) − θ·(pre(u) − mean(pre)),
    *   θ = cov(pre, post) / var(pre)
    * — same expected treatment effect, variance shrunk by the pre/post
    * correlation², so experiments decide earlier at the same power.
    *
    * Replayability (the [[decide]] contract, extended): per-unit metrics
    * quantize to milli-unit longs through one shared expression; θ's
    * sufficient statistics are EXACT integer sums — Spark sums them as
    * DECIMAL(38,0) (values cast from DECIMAL(19,0) so products stay
    * exact), the oracle as HUGEINT, and n·Σpo − Σp·Σo is the same exact
    * integer on both, so the one cast-to-double each side performs
    * rounds identically; the final adjustment is [[cupedAdjSql]], one
    * shared expression over bit-equal inputs. No cross-unit float sum
    * exists anywhere in θ's derivation. Budgets (bounded 1-row reads):
    * |metric| ≤ 3·10⁶ milli-units and n ≤ 10⁹ keep n²·maxq² < 10³⁸;
    * zero pre-period variance is refused (θ undefined).
    *
    * Input: one row per unit with `preCol`/`postCol` (doubles, caller
    * rounds 6dp — the q176 bit-identical-samples contract). Output: the
    * input plus `outCol`, ready for [[decide]]. Scale shape: one pass to
    * quantize, one 1-row moment aggregate broadcast back — nothing
    * unit-squared. */
  def cupedAdjusted(df: DataFrame, preCol: String, postCol: String,
                    outCol: String = "cuped"): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val q = df
      .withColumn("__pre_q",
        expr(s"CAST(round(round($preCol, 6) * 1000, 0) AS BIGINT)"))
      .withColumn("__post_q",
        expr(s"CAST(round(round($postCol, 6) * 1000, 0) AS BIGINT)"))
      .persist(lvl)
    val g = q.agg(count(lit(1)).as("n"), max(abs(col("__pre_q"))).as("mxp"),
      max(abs(col("__post_q"))).as("mxo")).head()
    val n = g.getLong(0)
    require(n >= 2L, "cupedAdjusted: needs at least 2 units")
    require(n <= 1000000000L,
      "cupedAdjusted: n > 1e9 breaks the decimal(38) moment budget")
    require(math.max(g.getLong(1), g.getLong(2)) <= 3000000L,
      "cupedAdjusted: |metric| > 3000 breaks the milli-unit long budget; " +
        "rescale the metric first")
    val m = q.selectExpr("CAST(__pre_q AS DECIMAL(19, 0)) AS p",
        "CAST(__post_q AS DECIMAL(19, 0)) AS o")
      .agg(count(lit(1)).cast("decimal(19, 0)").as("cn"),
        sum(col("p")).as("sp"), sum(col("o")).as("so"),
        sum(col("p") * col("p")).as("spp"),
        sum(col("p") * col("o")).as("spo"))
      .selectExpr("cn AS __n", "sp AS __sp",
        "cn * spo - sp * so AS __num",
        "cn * spp - sp * sp AS __den")
      .persist(lvl)
    require(m.head().getDecimal(3).signum != 0,
      "cupedAdjusted: zero pre-period variance (theta undefined)")
    q.crossJoin(broadcast(m))
      .withColumn(outCol, expr(cupedAdjSql))
      .drop("__pre_q", "__post_q", "__n", "__sp", "__num", "__den")
  }

  def decideProportions(df: DataFrame, grpCol: Column,
                        successCol: Column): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val ev = df.select(grpCol.cast("string").as("grp"),
      successCol.cast("long").as("s")).persist(lvl)
    val arms = ev.select(col("grp")).distinct().limit(3)
      .collect().map(_.getString(0)).sorted
    require(arms.length == 2,
      s"decideProportions needs exactly two arms, got ${arms.mkString(", ")}")
    val (g1, g2) = (arms(0), arms(1))
    val row = ev.agg(
      sum(when(col("grp") === g1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("grp") === g2, 1L).otherwise(0L)).as("n2"),
      sum(when(col("grp") === g1, col("s")).otherwise(0L)).as("s1"),
      sum(when(col("grp") === g2, col("s")).otherwise(0L)).as("s2"))
      .persist(lvl)
    val h = row.head() // bounded 1-row read: budget + degeneracy guard
    val (n1, n2, s1, s2) =
      (h.getLong(0), h.getLong(1), h.getLong(2), h.getLong(3))
    require(n1 > 0 && n2 > 0, "decideProportions: an arm is empty")
    require(s1 + s2 > 0L && s1 + s2 < n1 + n2,
      "decideProportions: degenerate 2x2 table (all units share one outcome)")
    require(n1 + n2 <= 3000000000L,
      "decideProportions: combined n > 3e9 breaks the cross-product long " +
        "budget; pre-aggregate per-arm counts instead")
    row.selectExpr(s"$propZSql AS z_stat", s"$propChiSql AS chi_stat")
      .selectExpr(
        "stack(2, 'chi_sq', chi_stat, 'two_prop_z', z_stat) " +
          "AS (test_name, statistic)")
      .select(col("test_name"), col("statistic"),
        when(col("test_name") === "two_prop_z", zBand(abs(col("statistic"))))
          .otherwise(
            when(col("statistic") > 10.827566, "<0.001")
              .when(col("statistic") > 6.634897, "<0.01")
              .when(col("statistic") > 3.841459, "<0.05")
              .otherwise(">=0.05")).as("p_band"),
        when(col("test_name") === "two_prop_z",
          abs(col("statistic")) > 1.959964)
          .otherwise(col("statistic") > 3.841459).as("reject_null"))
      .orderBy(col("test_name"))
  }
}
