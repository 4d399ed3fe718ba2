package graft.stats

import org.scalatest.funsuite.AnyFunSuite
import Tests._

/** Stat-test goldens: hand-computed examples (classic textbook cases) plus
  * structural properties. Tolerances are 1e-6 on statistics, 1e-4 on
  * p-values (distribution CDF implementations differ in the last ulps). */
class TestsSpec extends AnyFunSuite {

  private val a = Array(10.0, 11.0, 12.0, 13.0, 14.0)
  private val b = Array(12.0, 13.0, 14.0, 15.0, 16.0)

  test("student t-test on shifted samples: t = -2, df = 8") {
    // means 12 vs 14, pooled var 2.5 -> t = -2/sqrt(2.5*(2/5)) = -2
    val r = tTest(a, b, equalVar = true)
    assert(math.abs(r.statistic - (-2.0)) < 1e-12)
    // two-sided p for t=2, df=8 is 0.0805 (classic table value)
    assert(math.abs(r.pValue - 0.0805) < 5e-4)
  }

  test("welch equals student for equal variances and sizes") {
    val s = tTest(a, b, equalVar = true)
    val w = tTest(a, b, equalVar = false)
    assert(math.abs(s.statistic - w.statistic) < 1e-12)
    assert(math.abs(s.pValue - w.pValue) < 1e-9)
  }

  test("t-test one-sided halves the symmetric two-sided p") {
    val two = tTest(a, b, equalVar = true, TwoSided)
    val less = tTest(a, b, equalVar = true, Less)
    val greater = tTest(a, b, equalVar = true, Greater)
    assert(math.abs(less.pValue - two.pValue / 2) < 1e-9)
    assert(math.abs(less.pValue + greater.pValue - 1.0) < 1e-9)
  }

  test("tTestFromMoments matches tTest") {
    def m(x: Array[Double]) = x.sum / x.length
    def v(x: Array[Double]) = { val mu = m(x); x.map(d => (d - mu) * (d - mu)).sum / (x.length - 1) }
    val direct = tTest(a, b, equalVar = false)
    val fromM = tTestFromMoments(a.length, m(a), v(a), b.length, m(b), v(b), equalVar = false)
    assert(math.abs(direct.statistic - fromM.statistic) < 1e-12)
    assert(math.abs(direct.pValue - fromM.pValue) < 1e-12)
  }

  test("identical samples: t = 0, p = 1") {
    val r = tTest(a, a, equalVar = true)
    assert(r.statistic == 0.0 && math.abs(r.pValue - 1.0) < 1e-12)
  }

  test("rank-sum on disjoint samples: all ranks separate") {
    val x = Array(1.0, 2.0, 3.0)
    val y = Array(10.0, 11.0, 12.0)
    val r = rankSum(x, y)
    // R1 = 6, expected = 3*7/2 = 10.5, sd = sqrt(3*3*7/12)
    val z = (6.0 - 10.5) / math.sqrt(9.0 * 7 / 12)
    assert(math.abs(r.statistic - z) < 1e-12)
    assert(math.abs(rankSum(x, y, Less).pValue - (1 - rankSum(x, y, Greater).pValue)) < 1e-12)
  }

  test("rank-sum averages tied ranks") {
    val x = Array(1.0, 2.0)
    val y = Array(2.0, 3.0)
    // ranks: 1, (2,3)->2.5 each, 4 ; R1 = 3.5
    val z = (3.5 - 2 * 5 / 2.0) / math.sqrt(2.0 * 2 * 5 / 12)
    assert(math.abs(rankSum(x, y).statistic - z) < 1e-12)
  }

  test("levene: equal-spread groups give W near 0, unequal spread large W") {
    val g1 = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    val g2 = Array(11.0, 12.0, 13.0, 14.0, 15.0)
    val same = levene(g1, g2)
    assert(same.statistic < 1e-12 && same.pValue > 0.99)
    val wide = Array(-20.0, -10.0, 13.0, 36.0, 46.0)
    val diff = levene(g1, wide)
    assert(diff.statistic > 4.0 && diff.pValue < 0.1)
  }

  test("shapiro-wilk: W near 1 for normal-ish data, low for extreme outlier") {
    val rng = new scala.util.Random(5)
    val normal = Array.fill(50)(rng.nextGaussian())
    val rNorm = shapiroWilk(normal)
    assert(rNorm.statistic > 0.95 && rNorm.pValue > 0.05)
    val outliers = Array.fill(49)(0.0).map(_ => rng.nextGaussian() * 0.01) :+ 100.0
    val rOut = shapiroWilk(outliers)
    assert(rOut.statistic < 0.5 && rOut.pValue < 1e-6)
  }

  test("shapiro-wilk golden: Shapiro & Wilk (1965) weights data") {
    // the classic n=11 example from the original paper; R's shapiro.test
    // reports W = 0.78881, p-value = 0.006704 (AS R94 / Royston 1995 —
    // the same approximation this implementation follows)
    val x = Array(148.0, 154, 158, 160, 161, 162, 166, 170, 182, 195, 236)
    val r = shapiroWilk(x)
    assert(math.abs(r.statistic - 0.78881) < 1e-4, s"W=${r.statistic}")
    assert(math.abs(r.pValue - 0.006704) < 1e-5, s"p=${r.pValue}")
  }

  test("shapiro-wilk above the n=5000 bound reduces to order statistics") {
    // > 5000 samples: deterministic in the multiset (input order irrelevant)
    // and close to the direct statistic of the underlying distribution
    val big = Array.tabulate(12000)(i => math.sin(i * 12.9898) * 43758.5453 % 1.0)
    val r1 = shapiroWilk(big)
    val r2 = shapiroWilk(big.reverse)
    assert(r1.statistic == r2.statistic && r1.pValue == r2.pValue)
  }

  test("shapiro-wilk W is scale/shift invariant") {
    val rng = new scala.util.Random(11)
    val x = Array.fill(30)(rng.nextGaussian())
    val y = x.map(v => v * 7.3 + 100)
    assert(math.abs(shapiroWilk(x).statistic - shapiroWilk(y).statistic) < 1e-10)
  }
}
