package graft.model

import graft.SparkTestBase
import graft.ops.VectorOps
import org.apache.spark.sql.functions._

class BprMetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("sigmoidNeg matches 1/(1+exp(x)) and is overflow-safe") {
    assert(math.abs(Bpr.sigmoidNeg(0.0) - 0.5) < 1e-12)
    assert(math.abs(Bpr.sigmoidNeg(2.0) - 1.0 / (1 + math.exp(2.0))) < 1e-12)
    assert(Bpr.sigmoidNeg(1000.0) == 0.0 && Bpr.sigmoidNeg(-1000.0) == 1.0)
  }

  test("BPR training separates positives from negatives on synthetic data") {
    // parity preference: user u likes items with i % 2 == u % 2, so every
    // item has non-zero popularity (popularity-weighted sampling can only
    // propose observed items — same behavior as the reference)
    val positives = (for (u <- 0 until 8; i <- 0 until 10 if i % 2 == u % 2)
      yield (u, i)).toDF("user", "item")
    val model = Bpr.train(positives, "user", "item", numItems = 10,
      Bpr.Params(rank = 4, lr = 0.05, reg = 0.01, epochs = 25, seed = 1L,
        initScale = 0.1),
      numPartitions = 2)
    def score(u: Int, i: Int): Double =
      model.userFactors(u).zip(model.itemFactors(i)).map { case (a, b) => a * b }.sum
    // mean score of liked items must exceed mean of unliked items per user
    val margins = (0 until 8).map { u =>
      val pos = (0 until 10).filter(i => i % 2 == u % 2).map(score(u, _)).sum / 5
      val neg = (0 until 10).filter(i => i % 2 != u % 2).map(score(u, _)).sum / 5
      pos - neg
    }
    assert(margins.count(_ > 0) >= 7, s"margins $margins")
  }

  test("genre-aware sampling never picks items sharing a genre with the positive") {
    val rng = new java.util.Random(3)
    val cdf = Array.tabulate(6)(i => (i + 1) / 6.0)
    val genres = Array(Array(0), Array(0, 1), Array(1), Array(2), Array(2, 3), Array(9))
    val pos = new java.util.HashSet[Int](); pos.add(0)
    for (_ <- 0 until 200) {
      val j = Bpr.sampleNegative(rng, cdf, pos, 1, genres, 200)
      assert(!pos.contains(j))
      assert(genres(j).intersect(genres(1)).isEmpty, s"item $j shares genre")
    }
  }

  test("rmse is zero for exact predictions, positive otherwise") {
    val preds = Seq((4.0, 4.0), (3.0, 3.0)).toDF("r", "prediction")
    assert(Metrics.rmse(preds, "r", "prediction") == 0.0)
    val preds2 = Seq((4.0, 5.0), (3.0, 3.0)).toDF("r", "prediction")
    assert(math.abs(Metrics.rmse(preds2, "r", "prediction") - math.sqrt(0.5)) < 1e-12)
  }

  test("precision/recall@k on a hand-checkable case") {
    // user 0: positives {1,2}; scored ranking: 1,3,2,4 -> top2 = {1,3}
    val scored = Seq((0, 1, 4.0), (0, 3, 3.0), (0, 2, 2.0), (0, 4, 1.0))
      .toDF("user", "item", "score")
    val positives = Seq((0, 1), (0, 2)).toDF("user", "item")
    val r = Metrics.precisionRecallAtK(scored, positives, "user", "item", "score", 2).head()
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12) // 1 of top-2
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12) // 1 of 2 positives
  }

  test("sampled P/R@k: exact at maxUsers >= all, within tolerance below, bounded plan") {
    // 40 users x 60 items, rank 4 — big enough for a subsample mean to land
    // near the full mean, small enough to hand-verify the sample identity
    val rng = new scala.util.Random(41L)
    val userF = (0 until 40).map(u => (u, Seq.fill(4)(rng.nextGaussian())))
      .toDF("id", "features")
    val itemF = (0 until 60).map(i => (i, Seq.fill(4)(rng.nextGaussian())))
      .toDF("id", "features")
    val positives = (for (u <- 0 until 40; i <- 0 until 60 if (u + i) % 7 == 0)
      yield (u, i)).toDF("user", "item")
    val exactScored = userF.select(col("id").as("user"), col("features").as("u"))
      .crossJoin(itemF.select(col("id").as("item"), col("features").as("v")))
      .select(col("user"), col("item"), VectorOps.dot(col("u"), col("v")).as("score"))
    val exact = Metrics.precisionRecallAtK(exactScored, positives,
      "user", "item", "score", 10).head()
    // maxUsers covering every user reproduces the exact numbers bit-for-bit
    val full = Metrics.precisionRecallAtKSampled(userF, itemF, positives,
      "user", "item", 10, maxUsers = 40, seed = 9L).head()
    assert(full.getDouble(0) == exact.getDouble(0))
    assert(full.getDouble(1) == exact.getDouble(1))
    // a strict subsample is the exact metric computed over exactly the
    // sampled users: replay the xxhash64 draw and compare against the
    // exact pipeline restricted to that user set
    val sampledUsers = positives.select(col("user")).distinct()
      .orderBy(xxhash64(lit(9L), col("user")), col("user")).limit(15)
      .as[Int].collect().toSet
    assert(sampledUsers.size == 15)
    val restricted = Metrics.precisionRecallAtK(
      exactScored.filter(col("user").isin(sampledUsers.toSeq: _*)),
      positives.filter(col("user").isin(sampledUsers.toSeq: _*)),
      "user", "item", "score", 10).head()
    val sampled = Metrics.precisionRecallAtKSampled(userF, itemF, positives,
      "user", "item", 10, maxUsers = 15, seed = 9L).head()
    assert(sampled.getDouble(0) == restricted.getDouble(0))
    assert(sampled.getDouble(1) == restricted.getDouble(1))
    // subsample mean lands near the full mean (tolerance, not equality)
    assert(math.abs(sampled.getDouble(1) - exact.getDouble(1)) < 0.15,
      s"sampled=${sampled.getDouble(1)} exact=${exact.getDouble(1)}")
    // plan shape: the one product joins a BROADCAST user side (the bounded
    // sample), so no M x N cross of two large relations exists
    val plan = Metrics.precisionRecallAtKSampled(userF, itemF, positives,
      "user", "item", 10, maxUsers = 15, seed = 9L).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("GlobalLimit") || plan.contains("TakeOrderedAndProject"), plan)
  }

  test("regLogLik decreases as predictions deviate") {
    val ratings = Seq((0, 0, 4.0)).toDF("u", "i", "r")
    def modelWith(v: Double) = AlsBias.Model(
      Seq((0, Seq(v), 0.0)).toDF("id", "features", "bias"),
      Seq((0, Seq(4.0), 0.0)).toDF("id", "features", "bias"))
    val good = Metrics.regLogLik(modelWith(1.0), ratings, "u", "i", "r", 0.1, 0.01, 0.01)
    val bad = Metrics.regLogLik(modelWith(2.0), ratings, "u", "i", "r", 0.1, 0.01, 0.01)
    assert(good > bad)
  }

  test("Recommend.foldInUsers reproduces the closed-form cold-start bias") {
    val p = AlsBias.Params(rank = 2, lambda = 0.1, tau = 0.01, alpha = 0.01)
    val itemFactors = Seq((0, Seq(0.0, 0.0), 1.0), (1, Seq(0.0, 0.0), -1.0))
      .toDF("id", "features", "bias")
    val history = Seq((100, 0, 5.0), (100, 1, 3.0)).toDF("user", "item", "r")
    val out = graft.serve.Recommend.foldInUsers(history, itemFactors, "user", "item", "r", p)
      .as[(Int, Seq[Double], Double)].head()
    // b = lambda*((5-1)+(3+1))/(alpha+lambda*2) with zero item vectors
    val expected = 0.1 * 8.0 / (0.01 + 0.2)
    assert(out._1 == 100 && math.abs(out._3 - expected) < 1e-12)
  }

  test("Recommend.recommend applies popularity floor, damping and top-k") {
    val users = Seq((0, Seq(1.0, 0.0), 0.0)).toDF("id", "features", "bias")
    val items = Seq(
      (0, Seq(1.0, 0.0), 10.0),  // high dot, popular
      (1, Seq(0.9, 0.0), 0.0),   // popular
      (2, Seq(5.0, 0.0), 0.0))   // best dot but unpopular -> excluded
      .toDF("id", "features", "bias")
    val counts = Seq((0, 100L), (1, 95L), (2, 5L)).toDF("id", "n_ratings")
    val recs = graft.serve.Recommend.recommend(users, items, counts, k = 2, popularityFloor = 90L)
      .select("item_id", "score", "rank").as[(Int, Double, Long)].collect().sortBy(_._3)
    assert(recs.map(_._1).toSeq == Seq(0, 1)) // item 2 filtered; damping orders 0 first
    assert(math.abs(recs.head._2 - (1.0 + 0.05 * 10.0)) < 1e-12)
  }
}
class BprGenreAwareSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("genre-aware BPR trains end-to-end with genre-disjoint negatives") {
    val positives = (for (u <- 0 until 6; i <- 0 until 10 if i % 2 == u % 2)
      yield (u, i)).toDF("user", "item")
    // even items share genre 0, odd items genre 1 -> negatives for an even
    // positive must be odd items minus the user's own positives... which for
    // odd users IS their positive set, exercising the retry/fallback path too
    val genres = (0 until 10).map(i => i -> Array(i % 2)).toMap
    val model = graft.model.Bpr.train(positives, "user", "item", numItems = 10,
      graft.model.Bpr.Params(rank = 4, lr = 0.05, epochs = 5, seed = 2L, initScale = 0.1),
      itemGenres = Some(genres), numPartitions = 2)
    assert(model.userFactors.size == 6)
    assert(model.itemFactors.length == 10)
    assert(model.userFactors.values.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
  }
}
