package graft.stats

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Cross-checks the distributed A/B decision pipeline ([[AbDecision]],
  * declared query q174) against the driver-side reference tests
  * ([[Tests]] — SciPy-equivalent semantics): the 6dp-rounded statistics
  * must agree, the Levene gate must pick the test [[Tests]] would, and
  * bands/decisions must be the documented function of the rounded
  * statistic. */
class AbDecisionSpec extends SparkTestBase {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def run(a: Array[Double], b: Array[Double], buckets: Int = 4) = {
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toSeq.toDF("grp", "value")
    AbDecision.decide(df, col("grp"), col("value"), buckets)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getString(2),
        r.getBoolean(3)))).toMap
  }

  private def checkAgainstTests(a: Array[Double], b: Array[Double]): Unit = {
    val got = run(a, b)
    spark.catalog.clearCache()
    assert(got.size == 3)
    // Levene statistic (Brown-Forsythe, median center) matches Tests
    val lev = Tests.levene(a, b)
    assert(got("levene")._1 == round6(lev.statistic))
    // the gate picks the same branch Tests' caller would, and the chosen
    // t statistic matches the matching Tests variant
    val equalVar = got("levene")._1 <= 3.841459
    val tName = if (equalVar) "student_t" else "welch_t"
    assert(got.contains(tName), s"expected $tName in ${got.keySet}")
    val t = Tests.tTest(a, b, equalVar = equalVar)
    assert(got(tName)._1 == round6(t.statistic))
    // rank-sum z (no tie correction, average ranks) matches Tests
    val rs = Tests.rankSum(a, b)
    assert(got("rank_sum")._1 == round6(rs.statistic))
    // bands/decisions are exactly the documented function of the ROUNDED
    // statistic (normal / chi2_1 large-sample critical values)
    def zBand(s: Double) =
      if (s > 3.290527) "<0.001" else if (s > 2.575829) "<0.01"
      else if (s > 1.959964) "<0.05" else ">=0.05"
    val w = got("levene")._1
    val wBand =
      if (w > 10.827566) "<0.001" else if (w > 6.634897) "<0.01"
      else if (w > 3.841459) "<0.05" else ">=0.05"
    assert(got("levene")._2 == wBand)
    assert(got("levene")._3 == (w > 3.841459))
    assert(got(tName)._2 == zBand(math.abs(got(tName)._1)))
    assert(got(tName)._3 == (math.abs(got(tName)._1) > 1.959964))
    assert(got("rank_sum")._2 == zBand(math.abs(got("rank_sum")._1)))
    assert(got("rank_sum")._3 == (math.abs(got("rank_sum")._1) > 1.959964))
  }

  test("equal-variance arms take the Student branch and match Tests") {
    // similar spreads, clearly shifted means: Levene accepts, t rejects
    val a = Array(1.0, 2.0, 2.5, 3.0, 4.0, 1.5, 2.2, 3.5, 2.8, 1.8,
      2.1, 3.3, 2.6, 1.2, 3.9)
    val b = Array(5.0, 6.0, 6.5, 7.0, 8.0, 5.5, 6.2, 7.5, 6.8, 5.8,
      6.1, 7.3, 6.6, 5.2, 7.9)
    checkAgainstTests(a, b)
    val got = run(a, b); spark.catalog.clearCache()
    assert(got.contains("student_t"))
    assert(got("student_t")._3 && got("rank_sum")._3) // strong shift
    assert(!got("levene")._3)                          // equal spreads
  }

  test("unequal-variance arms take the Welch branch and match Tests") {
    // same-ish centers, wildly different spreads: Levene rejects -> Welch
    val a = Array(10.0, 10.01, 9.99, 10.02, 9.98, 10.0, 10.01, 9.99,
      10.02, 9.98, 10.0, 10.01)
    val b = Array(-40.0, 60.0, -30.0, 55.0, 5.0, -20.0, 45.0, -35.0,
      50.0, 10.0, -25.0, 48.0)
    checkAgainstTests(a, b)
    val got = run(a, b); spark.catalog.clearCache()
    assert(got.contains("welch_t"))
    assert(got("levene")._3)
  }

  test("ties get average ranks (exact long rank sum)") {
    // heavy ties across arms exercise the (2*below + c + 1) averaging
    val a = Array(1.0, 2.0, 2.0, 3.0, 3.0, 3.0)
    val b = Array(2.0, 3.0, 3.0, 4.0, 4.0, 5.0)
    checkAgainstTests(a, b)
  }

  test("refuses anything but exactly two arms") {
    val df = Seq(("A", 1.0), ("B", 2.0), ("C", 3.0)).toDF("grp", "value")
    val e = intercept[IllegalArgumentException] {
      AbDecision.decide(df, col("grp"), col("value"))
    }
    assert(e.getMessage.contains("two arms"))
    spark.catalog.clearCache()
  }

  private def runProp(n1: Int, s1: Int, n2: Int, s2: Int) = {
    val units = (0 until n1).map(i => ("A", if (i < s1) 1L else 0L)) ++
      (0 until n2).map(i => ("B", if (i < s2) 1L else 0L))
    val df = units.toDF("grp", "conv")
    val got = AbDecision.decideProportions(df, col("grp"), col("conv"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getString(2),
        r.getBoolean(3)))).toMap
    spark.catalog.clearCache()
    got
  }

  test("decideProportions matches hand-computed z and chi-square (7/10 vs 3/10)") {
    val got = runProp(10, 7, 10, 3)
    // p1=0.7, p2=0.3, phat=0.5: z = 0.4/sqrt(0.25*0.2) = 1.788854,
    // chi = 20*(7*7-3*3)^2/(10*10*10*10) = 3.2 (= z^2)
    assert(got("two_prop_z")._1 == round6(0.4 / math.sqrt(0.25 * 0.2)))
    assert(got("chi_sq")._1 == 3.2)
    assert(got("two_prop_z")._2 == ">=0.05" && !got("two_prop_z")._3)
    assert(got("chi_sq")._2 == ">=0.05" && !got("chi_sq")._3)
  }

  test("decideProportions: strong effect rejects on both rows, chi = z^2") {
    val got = runProp(100, 90, 100, 10)
    // phat=0.5: z = 0.8/sqrt(0.25*0.02) = 11.313708; chi = 128 exactly
    assert(got("chi_sq")._1 == 128.0)
    assert(got("two_prop_z")._2 == "<0.001" && got("two_prop_z")._3)
    assert(got("chi_sq")._2 == "<0.001" && got("chi_sq")._3)
    // chi2(1) = z^2 for the pooled two-sided test (rounding-level check)
    assert(math.abs(got("chi_sq")._1
      - got("two_prop_z")._1 * got("two_prop_z")._1) < 1e-4)
  }

  test("decideProportions: arm swap flips z sign, chi-square invariant") {
    val ab = runProp(50, 20, 40, 25)
    // swap labels by swapping the fixture arms
    val units = (0 until 40).map(i => ("A", if (i < 25) 1L else 0L)) ++
      (0 until 50).map(i => ("B", if (i < 20) 1L else 0L))
    val ba = AbDecision.decideProportions(units.toDF("grp", "conv"),
        col("grp"), col("conv"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    spark.catalog.clearCache()
    assert(ab("chi_sq")._1 == ba("chi_sq"))
    assert(ab("two_prop_z")._1 == -ba("two_prop_z"))
  }

  test("conversion-counter store fold equals the one-shot count (split batches)") {
    // user 10 crosses the threshold ONLY on the cross-batch total (2+2);
    // user 11 never converts but must still be a unit in every readout;
    // users 20/21 fill the B arm
    val events = Seq(
      (0L, 10L, "purchase"), (1L, 10L, "purchase"),
      (2L, 10L, "purchase"), (3L, 10L, "purchase"),
      (4L, 11L, "view"), (5L, 11L, "click"),
      (6L, 20L, "view"), (7L, 21L, "purchase"), (8L, 21L, "view"))
      .toDF("event_id", "user_id", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("convstore").toString
    (0L until 4L).foreach { b =>
      AbDecision.writeUnitCountBatch(
        events.filter(pmod(col("event_id"), lit(4L)) === b),
        col("user_id"), col("event_type") === "purchase", dir, b)
    }
    val folded = AbDecision.unitCounts(spark, dir)
      .orderBy("unit").collect().map(r => (r.getLong(0), r.getLong(1)))
    val oneShot = events.groupBy(col("user_id").as("unit"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("cnt"))
      .orderBy("unit").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(folded.toSeq == oneShot.toSeq)
    // user 10's 4 purchases arrive 1 per batch — only the fold sees >= 3
    assert(folded.toMap.apply(10L) == 4L)
    // zero-success active units keep their rows (11 and 20 present)
    assert(folded.toMap.contains(11L) && folded.toMap.apply(20L) == 0L)
    // the readout off the store matches decideProportions on the one-shot
    val fromStore = AbDecision.decideProportions(
      AbDecision.unitCounts(spark, dir),
      when(pmod(col("unit"), lit(2L)) === 0L, lit("A")).otherwise(lit("B")),
      when(col("cnt") >= 3L, 1L).otherwise(0L))
      .collect().map(_.toSeq).toSeq
    val direct = AbDecision.decideProportions(
      events.groupBy(col("user_id").as("unit"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("cnt")),
      when(pmod(col("unit"), lit(2L)) === 0L, lit("A")).otherwise(lit("B")),
      when(col("cnt") >= 3L, 1L).otherwise(0L))
      .collect().map(_.toSeq).toSeq
    assert(fromStore == direct)
    spark.catalog.clearCache()
  }

  test("writeUnitCountBatch replays idempotently (batch-keyed overwrite)") {
    val events = Seq((0L, 1L, "purchase"), (1L, 2L, "view"))
      .toDF("event_id", "user_id", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("convstore2").toString
    AbDecision.writeUnitCountBatch(events, col("user_id"),
      col("event_type") === "purchase", dir, 0L)
    // a replayed batch lands on the same key — totals must not double
    AbDecision.writeUnitCountBatch(events, col("user_id"),
      col("event_type") === "purchase", dir, 0L)
    val got = AbDecision.unitCounts(spark, dir)
      .orderBy("unit").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 0L)))
    spark.catalog.clearCache()
  }

  test("cupedAdjusted: perfectly correlated covariate collapses variance (theta = 2)") {
    // post = 2*pre exactly: theta = cov/var = 2, every adjusted value
    // equals mean(post) = 5.0 — hand-traceable in exact milli-units
    // (num = 4*60e6 - 1e4*2e4 = 40e6, den = 4*30e6 - 1e8 = 20e6)
    val df = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0),
      (4L, 4.0, 8.0)).toDF("unit", "pre", "post")
    val got = AbDecision.cupedAdjusted(df, "pre", "post")
      .orderBy("unit").select("cuped").collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(5.0, 5.0, 5.0, 5.0))
    spark.catalog.clearCache()
  }

  test("cupedAdjusted reduces variance and preserves the mean") {
    // post = pre + noise: adjustment strips the pre-period component
    val rng = new java.util.Random(7)
    val rows = (1L to 200L).map { u =>
      val pre = 10.0 + rng.nextGaussian() * 3
      val post = pre + 1.0 + rng.nextGaussian() * 0.5
      (u, math.rint(pre * 1e6) / 1e6, math.rint(post * 1e6) / 1e6)
    }
    val df = rows.toDF("unit", "pre", "post")
    val adj = AbDecision.cupedAdjusted(df, "pre", "post")
      .select("post", "cuped").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    def stats(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (mPost, vPost) = stats(adj.map(_._1))
    val (mAdj, vAdj) = stats(adj.map(_._2))
    assert(vAdj < vPost * 0.2, s"variance $vPost -> $vAdj (want < 20%)")
    assert(math.abs(mAdj - mPost) < 1e-3, s"mean drifted $mPost -> $mAdj")
    spark.catalog.clearCache()
  }

  test("cupedAdjusted refuses a zero-variance pre-period") {
    val df = Seq((1L, 2.0, 1.0), (2L, 2.0, 3.0)).toDF("unit", "pre", "post")
    val e = intercept[IllegalArgumentException] {
      AbDecision.cupedAdjusted(df, "pre", "post")
    }
    assert(e.getMessage.contains("variance"))
    spark.catalog.clearCache()
  }

  test("decideProportions refuses degenerate all-one-outcome tables") {
    val df = Seq(("A", 1L), ("A", 1L), ("B", 1L)).toDF("grp", "conv")
    val e = intercept[IllegalArgumentException] {
      AbDecision.decideProportions(df, col("grp"), col("conv"))
    }
    assert(e.getMessage.contains("degenerate"))
    spark.catalog.clearCache()
  }
}
