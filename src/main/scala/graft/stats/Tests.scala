package graft.stats

import org.apache.commons.math3.distribution.{FDistribution, NormalDistribution, TDistribution}

/** Statistical hypothesis tests for the A/B evaluation path
  * (/root/reference/explicit_ratings/ab_test.py:236-391, SURVEY.md §2.10).
  *
  * All tests run driver-side on collected score vectors (reference scale:
  * ≤ 10,000 log rows); the sufficient statistics (moments, ranks) are
  * computable distributed first — see Queries q33 and AbTest — so only the
  * final scalar math happens here. Distributions via commons-math3 (shipped
  * with Spark). Semantics match SciPy's `levene` (center='median'),
  * `ttest_ind`, `ranksums` (no tie correction), `shapiro` (AS R94).
  */
object Tests {

  final case class TestResult(statistic: Double, pValue: Double)

  sealed trait Alternative
  case object TwoSided extends Alternative
  case object Less extends Alternative
  case object Greater extends Alternative

  private val stdNormal = new NormalDistribution(0.0, 1.0)

  private def mean(x: Array[Double]): Double = x.sum / x.length

  private def varSamp(x: Array[Double]): Double = {
    val m = mean(x)
    x.map(v => (v - m) * (v - m)).sum / (x.length - 1)
  }

  private def median(x: Array[Double]): Double = {
    val s = x.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Levene's test for equal variances, center = median (Brown-Forsythe
    * flavor — SciPy's default used by the reference, ab_test.py:273-285). */
  def levene(groups: Array[Double]*): TestResult = {
    val k = groups.length
    val n = groups.map(_.length).sum
    val z = groups.map { g => val md = median(g); g.map(v => math.abs(v - md)) }
    val zBarI = z.map(mean)
    val zBar = z.flatten.sum / n
    val num = (n - k).toDouble * z.indices.map(i => z(i).length * math.pow(zBarI(i) - zBar, 2)).sum
    val den = (k - 1).toDouble * z.indices.map(i => z(i).map(v => math.pow(v - zBarI(i), 2)).sum).sum
    val w = num / den
    val p = 1.0 - new FDistribution((k - 1).toDouble, (n - k).toDouble).cumulativeProbability(w)
    TestResult(w, p)
  }

  /** Two-sample t-test; `equalVar = true` = Student (pooled), false = Welch
    * (ab_test.py:305-347). */
  def tTest(a: Array[Double], b: Array[Double], equalVar: Boolean,
            alternative: Alternative = TwoSided): TestResult =
    tTestFromMoments(a.length, mean(a), varSamp(a),
      b.length, mean(b), varSamp(b), equalVar, alternative)

  /** From group sufficient statistics (n, mean, sample variance) — the
    * distributed-aggregation form (moment stats are query q33). */
  def tTestFromMoments(n1: Long, m1: Double, v1: Double,
                       n2: Long, m2: Double, v2: Double,
                       equalVar: Boolean, alternative: Alternative = TwoSided): TestResult = {
    val (d1, d2) = (n1.toDouble, n2.toDouble)
    val (t, df) =
      if (equalVar) {
        val sp2 = ((d1 - 1) * v1 + (d2 - 1) * v2) / (d1 + d2 - 2)
        ((m1 - m2) / math.sqrt(sp2 * (1 / d1 + 1 / d2)), d1 + d2 - 2)
      } else {
        val se2 = v1 / d1 + v2 / d2
        val df = se2 * se2 / (math.pow(v1 / d1, 2) / (d1 - 1) + math.pow(v2 / d2, 2) / (d2 - 1))
        ((m1 - m2) / math.sqrt(se2), df)
      }
    TestResult(t, pFromDist(x => new TDistribution(df).cumulativeProbability(x), t, alternative))
  }

  /** Wilcoxon rank-sum (SciPy `ranksums`: normal approximation, average
    * ranks for ties, NO tie correction — ab_test.py:349-391). */
  def rankSum(a: Array[Double], b: Array[Double],
              alternative: Alternative = TwoSided): TestResult = {
    val n1 = a.length; val n2 = b.length; val n = n1 + n2
    val combined = (a.map((_, 0)) ++ b.map((_, 1))).sortBy(_._1)
    val ranks = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && combined(j + 1)._1 == combined(i)._1) j += 1
      val avgRank = (i + j + 2) / 2.0 // ranks are 1-based
      for (k <- i to j) ranks(k) = avgRank
      i = j + 1
    }
    val s = combined.indices.filter(combined(_)._2 == 0).map(ranks).sum
    val expected = n1.toDouble * (n + 1) / 2.0 // Int product overflows at ~33k/group
    val z = (s - expected) / math.sqrt(n1.toDouble * n2 * (n + 1) / 12.0)
    TestResult(z, pFromDist(stdNormal.cumulativeProbability, z, alternative))
  }

  /** Shapiro-Wilk normality test, Royston's AS R94 approximation (the
    * algorithm behind SciPy's `shapiro`; ab_test.py:288-302).
    * The approximation is validated for 3 <= n <= 5000 (Royston 1995);
    * beyond that the p-value transform is outside its fitted range, so larger
    * samples are reduced to 5000 evenly-spaced order statistics of the sorted
    * data (deterministic in the multiset — independent of input order or
    * partitioning) before applying the test, mirroring the common
    * subsample-at-5000 practice rather than failing or silently
    * extrapolating. */
  def shapiroWilk(x: Array[Double]): TestResult = {
    val n0 = x.length
    require(n0 >= 3, "shapiroWilk needs n >= 3")
    val maxN = 5000
    val sorted0 = x.sorted
    val sorted =
      if (n0 <= maxN) sorted0
      else Array.tabulate(maxN)(i => sorted0(((i.toLong * (n0 - 1)) / (maxN - 1)).toInt))
    val n = sorted.length
    // Blom-like scores m_i
    val m = Array.tabulate(n)(i => stdNormal.inverseCumulativeProbability((i + 1 - 0.375) / (n + 0.25)))
    val mm = m.map(v => v * v).sum
    val c = m.map(_ / math.sqrt(mm))
    val a = new Array[Double](n)
    val u = 1.0 / math.sqrt(n)
    if (n == 3) {
      a(0) = math.sqrt(0.5); a(2) = -a(0); a(1) = 0.0
    } else {
      val an = -2.706056 * math.pow(u, 5) + 4.434685 * math.pow(u, 4) -
        2.071190 * math.pow(u, 3) - 0.147981 * u * u + 0.221157 * u + c(n - 1)
      a(n - 1) = an; a(0) = -an
      if (n <= 5) {
        val phi = (mm - 2 * m(n - 1) * m(n - 1)) / (1 - 2 * an * an)
        for (i <- 1 until n - 1) a(i) = m(i) / math.sqrt(phi)
      } else {
        val an1 = -3.582633 * math.pow(u, 5) + 5.682633 * math.pow(u, 4) -
          1.752461 * math.pow(u, 3) - 0.293762 * u * u + 0.042981 * u + c(n - 2)
        a(n - 2) = an1; a(1) = -an1
        val phi = (mm - 2 * m(n - 1) * m(n - 1) - 2 * m(n - 2) * m(n - 2)) /
          (1 - 2 * an * an - 2 * an1 * an1)
        for (i <- 2 until n - 2) a(i) = m(i) / math.sqrt(phi)
      }
    }
    val xBar = mean(sorted)
    val num = sorted.indices.map(i => a(i) * sorted(i)).sum
    val den = sorted.map(v => (v - xBar) * (v - xBar)).sum
    val w = num * num / den
    // p-value transform (Royston 1995)
    val p =
      if (n == 3) {
        val pi6 = 6.0 / math.Pi
        val stqr = math.asin(math.sqrt(0.75))
        math.max(0.0, math.min(1.0, pi6 * (math.asin(math.sqrt(w)) - stqr)))
      } else if (n <= 11) {
        val g = -2.273 + 0.459 * n
        val mu = 0.5440 - 0.39978 * n + 0.025054 * n * n - 0.0006714 * n * n * n
        val sigma = math.exp(1.3822 - 0.77857 * n + 0.062767 * n * n - 0.0020322 * n * n * n)
        val z = (-math.log(g - math.log1p(-w)) - mu) / sigma
        1.0 - stdNormal.cumulativeProbability(z)
      } else {
        val ln = math.log(n.toDouble)
        val mu = 0.0038915 * ln * ln * ln - 0.083751 * ln * ln - 0.31082 * ln - 1.5861
        val sigma = math.exp(0.0030302 * ln * ln - 0.082676 * ln - 0.4803)
        val z = (math.log1p(-w) - mu) / sigma
        1.0 - stdNormal.cumulativeProbability(z)
      }
    TestResult(w, p)
  }

  /** One/two-tailed p from a CDF for an observed statistic. */
  private def pFromDist(cdf: Double => Double, stat: Double,
                        alternative: Alternative): Double = alternative match {
    case TwoSided => 2.0 * math.min(cdf(stat), 1.0 - cdf(stat))
    case Less => cdf(stat)
    case Greater => 1.0 - cdf(stat)
  }
}
