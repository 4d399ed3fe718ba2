package graft.stats

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the normality-gated decision ([[AbDecision.decideNormalityGated]],
  * declared query q198): the distributed Shapiro-Wilk reduction must
  * equal the driver-side [[Tests.shapiroWilk]] BIT-EXACTLY on both the
  * n ≤ 5000 (full multiset) and n > 5000 (evenly-spaced order
  * statistics) branches, and the gate must route a skewed metric to the
  * rank-sum row and a normal-shaped one to the t row. */
class AbGateSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic right-skewed sample: squared LCG uniforms (the fixture
  // idiom — no Random, replayable)
  private def skewed(n: Int, seed: Long): Array[Double] =
    Array.iterate(seed, n)(s => (s * 6364136223846793005L + 1442695040888963407L))
      .map { s => val u = ((s >>> 11).toDouble / (1L << 53).toDouble); u * u * 100.0 }

  // normal-shaped sample: standard normal quantiles at plotting positions
  private def normalShaped(n: Int, shift: Double): Array[Double] = {
    val nd = new org.apache.commons.math3.distribution.NormalDistribution(0.0, 1.0)
    Array.tabulate(n)(i => nd.inverseCumulativeProbability((i + 0.5) / n) + shift)
  }

  test("shapiroWilkD == driver shapiroWilk bit-exactly (n <= 5000 branch)") {
    val x = skewed(400, 7L)
    val (n, got) = AbDecision.shapiroWilkD(x.toSeq.toDF("v"), col("v"), buckets = 4)
    val want = Tests.shapiroWilk(x)
    assert(n == 400L)
    assert(got.statistic == want.statistic && got.pValue == want.pValue)
    spark.catalog.clearCache()
  }

  test("shapiroWilkD == driver shapiroWilk bit-exactly (n > 5000 subsample branch)") {
    val x = skewed(6500, 13L)
    val (n, got) = AbDecision.shapiroWilkD(x.toSeq.toDF("v"), col("v"), buckets = 8)
    val want = Tests.shapiroWilk(x) // reduces to the same 5000-point grid
    assert(n == 6500L)
    assert(got.statistic == want.statistic && got.pValue == want.pValue)
    spark.catalog.clearCache()
  }

  test("shapiroWilkD is partitioning-invariant (exact order statistics)") {
    val x = skewed(6500, 13L)
    val df = x.toSeq.toDF("v")
    val a = AbDecision.shapiroWilkD(df, col("v"), buckets = 3)
    val b = AbDecision.shapiroWilkD(df.repartition(17), col("v"), buckets = 11)
    assert(a == b)
    spark.catalog.clearCache()
  }

  test("skewed metric routes to rank_sum with normality rejected in both arms") {
    val df = (skewed(300, 3L).map(("A", _)) ++ skewed(300, 5L).map(("B", _)))
      .toSeq.toDF("grp", "value")
    val rows = AbDecision.decideNormalityGated(df, col("grp"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2),
        r.getBoolean(3)))
    assert(rows.map(_._1).toSeq == Seq("normality_a", "normality_b", "rank_sum"))
    val na = rows(0); val nb = rows(1)
    assert(na._2 == 300.0 && nb._2 == 300.0) // statistic = sample size used
    // p_band carries the COARSE pinned verdict (the oracle's literal):
    // same predicate as reject_null, no finer band than the gate needs
    assert(na._3 == "reject" && na._4 && nb._4) // decisively non-normal
    spark.catalog.clearCache()
  }

  test("knife-edge tripwire: a Shapiro p within pinEps of alpha fails loudly") {
    val df = (skewed(300, 3L).map(("A", _)) ++ skewed(300, 5L).map(("B", _)))
      .toSeq.toDF("grp", "value")
    // the default eps does NOT trip on a decisive corpus (pinned above);
    // widening eps past |p - alpha| proves the wire is live — the pinned-
    // verdict oracle refuses to certify a gate this close to the edge
    val e = intercept[IllegalArgumentException] {
      AbDecision.decideNormalityGated(df, col("grp"), col("value"),
        pinEps = 0.5)
    }
    assert(e.getMessage.contains("knife-edge") ||
      e.getMessage.contains("alpha"), e.getMessage)
    spark.catalog.clearCache()
  }

  test("normal-shaped metric routes to the Levene-gated t row") {
    val df = (normalShaped(200, 0.0).map(("A", _))
        ++ normalShaped(200, 0.1).map(("B", _)))
      .toSeq.toDF("grp", "value")
    val rows = AbDecision.decideNormalityGated(df, col("grp"), col("value"))
      .collect().map(r => (r.getString(0), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq.take(2) == Seq("normality_a", "normality_b"))
    assert(!rows(0)._2 && !rows(1)._2) // normality NOT rejected
    assert(Set("student_t", "welch_t").contains(rows(2)._1))
    spark.catalog.clearCache()
  }
}
