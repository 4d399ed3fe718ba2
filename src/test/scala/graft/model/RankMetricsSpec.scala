package graft.model

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Metrics.rankingMetricsQ]] (NDCG/MRR/MAP micro-unit quantization) and
  * [[Metrics.recConcentrationQ]] (exact Gini/HHI/top-decile). Goldens are
  * re-derived in the spec with BigInt arithmetic straight from the metric
  * definitions — independent of the operator's column expressions. */
class RankMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def gain(r: Int): Long =
    (1e8 / (math.log(r + 1.0) / math.log(2.0))).toLong

  test("ndcg gain tables: literal values and prefix sums") {
    val g = Metrics.ndcgGains(10).toMap
    assert(g(1L) == 100000000L)
    assert(g(2L) == (1e8 / (math.log(3.0) / math.log(2.0))).toLong)
    assert(g(3L) == 50000000L)
    val ig = Metrics.ndcgIdcg(10).toMap
    assert(ig(1L) == 100000000L)
    assert(ig(3L) == g(1L) + g(2L) + g(3L))
  }

  test("rankingMetricsQ matches BigInt-derived goldens on a 3-user fixture") {
    // u1: hits at ranks 1 and 3 of 3 test items; u2: no hits of 2 test
    // items; u3: perfect single hit at rank 1 of 1 test item.
    val recs = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 10L, 1L), (2L, 11L, 2L),
      (3L, 20L, 1L), (3L, 21L, 2L)).toDF("u", "i", "rnk")
    val test = Seq(
      (1L, 10L), (1L, 12L), (1L, 99L),
      (2L, 98L), (2L, 97L),
      (3L, 20L)).toDF("u", "i")
    val out = Metrics.rankingMetricsQ(recs, test, "u", "i", "rnk", 3)
      .orderBy("metric").collect()

    // u1: dcg = g(1)+g(3); idcg = g(1)+g(2)+g(3) (ntest=3, k=3)
    val ndcg1 = (BigInt(gain(1) + gain(3)) * 1000000 /
      BigInt(gain(1) + gain(2) + gain(3))).toLong
    // u3: dcg = g(1); idcg = g(1) (ntest=1) -> exactly 1000000
    val sNdcg = ndcg1 + 0L + 1000000L
    // mrr: u1 -> 1e6/1, u2 -> 0, u3 -> 1e6/1
    val sRr = 1000000L + 0L + 1000000L
    // ap: u1 hits (h=1,r=1),(h=2,r=3): (1e6*1/1 + 1e6*2/3) div min(3,3)
    val ap1 = (1000000L + 2000000L / 3L) / 3L
    val sAp = ap1 + 0L + 1000000L

    val byMetric = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val meanNdcg = BigDecimal(sNdcg) / BigDecimal(3000000)
    assert(byMetric("ndcg_at_3") == ((3L, sNdcg,
      meanNdcg.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(byMetric("mrr_at_3")._2 == sRr)
    assert(byMetric("map_at_3")._2 == sAp)
  }

  test("rankingMetricsQ: perfect ranking scores exactly 1.0 in micro-units") {
    val recs = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("u", "i", "rnk")
    val test = Seq((1L, 10L), (1L, 11L)).toDF("u", "i")
    val out = Metrics.rankingMetricsQ(recs, test, "u", "i", "rnk", 5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("ndcg_at_5") == 1000000L)
    assert(out("mrr_at_5") == 1000000L)
    assert(out("map_at_5") == 1000000L)
  }

  test("rankingMetricsQ: users with recs but no test activity are excluded") {
    val recs = Seq((1L, 10L, 1L), (9L, 10L, 1L)).toDF("u", "i", "rnk")
    val test = Seq((1L, 10L)).toDF("u", "i")
    val out = Metrics.rankingMetricsQ(recs, test, "u", "i", "rnk", 5)
      .collect()
    assert(out.forall(_.getLong(1) == 1L)) // n_users excludes u=9
  }

  test("recConcentrationQ matches the hand-computed x=[0,0,1,3] fixture") {
    val recs = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1))
      .toDF("item", "slot").select(col("item"))
    val catalog = Seq("a", "b", "c", "d").toDF("item")
    val out = Metrics.recConcentrationQ(recs, catalog, "item")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // ascending x = [0,0,1,3]: gini num = 1*(2*3-5) + 3*(2*4-5) = 10 over
    // n*tot = 16; hhi = (9+1)/16; top-decile t=1 -> mass 3 of 4
    assert(out("gini") == ((10L, 16L, 0.625)))
    assert(out("hhi") == ((10L, 16L, 0.625)))
    assert(out("top_decile_share") == ((3L, 4L, 0.75)))
  }

  test("recConcentrationQ: uniform counts give gini 0, concentrated give ~1") {
    val uniform = Seq("a", "b", "c", "d").toDF("item")
    val outU = Metrics.recConcentrationQ(uniform, uniform, "item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outU("gini") == 0L)
    // all mass on one of 100 items: gini = (2*100-101-... ) -> (n-1)/n
    val one = Seq.fill(50)("a").toDF("item")
    val cat = (0 until 100).map(i => s"i$i").toDF("item")
      .union(Seq("a").toDF("item"))
    val outC = Metrics.recConcentrationQ(one, cat, "item")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(outC("gini") > 0.98 && outC("gini") < 1.0)
    assert(outC("hhi") == 1.0)
    assert(outC("top_decile_share") == 1.0)
  }

  test("recPopularityBiasQ matches the hand-computed band fixture") {
    // pop a=1 b=2 c=3 d=10 (n_items=4, all values distinct):
    // below = 0,1,2,3 -> band (3*below) div 4 = 0,0,1,2 = tail,tail,
    // torso,head; rec slots [a,c,d,d,e] with e unknown -> cold, v=0
    val pop = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 10L))
      .toDF("item", "v")
    val recs = Seq("a", "c", "d", "d", "e").toDF("item")
    val out = Metrics.recPopularityBiasQ(recs, pop, "item", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("arp") == ((24L, 5L, 4.8))) // 1+3+10+10+0
    assert(out("head_share") == ((2L, 5L, 0.4)))
    assert(out("torso_share") == ((1L, 5L, 0.2)))
    assert(out("tail_share") == ((1L, 5L, 0.2)))
    assert(out("cold_share") == ((1L, 5L, 0.2)))
    spark.catalog.clearCache()
  }

  test("calibrationTvQ matches the hand-computed cross-multiplied TV") {
    // u1 hist: A=3, B=1 (hden 4); recs: A,A,C,C (rden 4):
    //   |3*4-2*4| + |1*4-0| + |0-2*4| = 16 -> 16e6 div 32 = 500000 (TV .5)
    // u2 identical mixes -> 0; u3 hist-only -> excluded
    val hist = Seq((1L, "A", 3L), (1L, "B", 1L), (2L, "A", 2L),
      (3L, "A", 9L)).toDF("user", "cat", "w")
    val recs = Seq((1L, "A"), (1L, "A"), (1L, "C"), (1L, "C"), (2L, "A"))
      .toDF("user", "cat")
    val out = Metrics.calibrationTvQ(recs, hist, "user", "cat", "w")
      .collect().head
    assert(out.getString(0) == "calibration_tv")
    assert(out.getLong(1) == 2L)       // u1, u2 — u3 has no recs
    assert(out.getLong(2) == 500000L)  // 500000 + 0
    assert(out.getDouble(3) == 0.25)
    spark.catalog.clearCache()
  }

  test("calibrationTvQ refuses the 2*hden*rden*10^6 long budget breach") {
    val hist = Seq((1L, "A", 1L << 42)).toDF("user", "cat", "w")
    val recs = Seq.fill(10)((1L, "A")).toDF("user", "cat")
    val e = intercept[IllegalArgumentException] {
      Metrics.calibrationTvQ(recs, hist, "user", "cat", "w")
    }
    assert(e.getMessage.contains("long budget"))
    spark.catalog.clearCache()
  }

  test("recPopularityBiasQ refuses the ARP long-budget breach") {
    val pop = Seq(("a", 1L << 61)).toDF("item", "v")
    val recs = Seq("a", "a").toDF("item")
    val e = intercept[IllegalArgumentException] {
      Metrics.recPopularityBiasQ(recs, pop, "item", "v")
    }
    assert(e.getMessage.contains("ARP long budget"))
    spark.catalog.clearCache()
  }
}
