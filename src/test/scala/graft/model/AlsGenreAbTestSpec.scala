package graft.model

import graft.SparkTestBase
import graft.exp.AbTest
import org.apache.spark.sql.functions._

class AlsGenreAbTestSpec extends SparkTestBase {
  import spark.implicits._

  private def syntheticRatings(seed: Int) = {
    val rng = new scala.util.Random(seed)
    val uTrue = Array.fill(10)(Array.fill(2)(rng.nextGaussian()))
    val vTrue = Array.fill(12)(Array.fill(2)(rng.nextGaussian()))
    (for { u <- 0 until 10; i <- 0 until 12 if rng.nextDouble() < 0.7 }
      yield (u, i, uTrue(u).zip(vTrue(i)).map { case (a, b) => a * b }.sum))
      .toDF("u", "i", "r")
  }

  private val movieGenres = (0 until 12)
    .map(i => (i, Seq(i % 3, 3 + i % 2), 2)).toDF("id", "genre_values", "genre_count")

  test("genre-prior movie sweep reduces to plain sweep when F is zero") {
    val p = AlsGenre.Params(rank = 2, maxIter = 1)
    val ratings = syntheticRatings(1)
    val bp = AlsBias.Params(rank = 2)
    val users = AlsBias.initFactors(ratings, "u", bp, 1L)
    val items = AlsBias.initFactors(ratings, "i", bp, 2L)
    val zeroF = (0 until 20).map(g => g -> Array(0.0, 0.0)).toMap
    val withPrior = AlsGenre.movieSweepWithPrior(ratings, items, users, movieGenres,
      "i", "u", "r", zeroF, p).orderBy("id")
      .as[(Int, Seq[Double], Double)].collect()
    val plain = AlsBias.halfSweep(ratings, items, users, "i", "u", "r", bp)
      .orderBy("id").as[(Int, Seq[Double], Double)].collect()
    withPrior.zip(plain).foreach { case (a, b) =>
      assert(a._1 == b._1 && math.abs(a._3 - b._3) < 1e-12)
      a._2.zip(b._2).foreach { case (x, y) => assert(math.abs(x - y) < 1e-10) }
    }
  }

  test("genre feature update matches hand computation on a single movie") {
    val p = AlsGenre.Params(rank = 2, tau = 0.5, beta = 0.1)
    val items = Seq((0, Seq(2.0, 4.0), 0.0)).toDF("id", "features", "bias")
    val mg = Seq((0, Seq(1, 2), 2)).toDF("id", "genre_values", "genre_count")
    val f0 = Map(1 -> Array(1.0, 0.0), 2 -> Array(0.0, 1.0))
    val out = AlsGenre.updateGenreFactors(items, mg, f0, p)
    // genre 1: numer = (v - F[2]/sqrt2)/sqrt2 ; denom = beta + tau*(1/2)
    val sqrt2 = math.sqrt(2.0)
    val expected1 = Array((2.0 - 0.0 / sqrt2) / sqrt2, (4.0 - 1.0 / sqrt2) / sqrt2)
      .map(x => 0.5 * x / (0.1 + 0.5 * 0.5))
    out(1).zip(expected1).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("genre-coupled training converges and fills all three factor sets") {
    val model = AlsGenre.train(syntheticRatings(2), movieGenres, "u", "i", "r",
      AlsGenre.Params(rank = 3, lambda = 1.0, maxIter = 4, tol = 1e-6))
    assert(model.userFactors.count() == 10)
    assert(model.itemFactors.count() == 12)
    assert(model.genreFactors.nonEmpty)
    val rmse = Metrics.rmse(
      AlsBias.Model(model.userFactors, model.itemFactors).predict(syntheticRatings(2), "u", "i"),
      "r", "prediction")
    assert(rmse < 1.0, s"rmse $rmse")
  }

  test("genre-coupled sweep modes are numerically identical: bcast == routed huge") {
    // AlsGenre clones AlsBias's routed-factor path in movieSweepWithPrior;
    // pin that the threshold picks only the PLAN there too — full trainings
    // through the broadcast and both-huge routed branches must agree.
    val ratings = syntheticRatings(3)
    val base = AlsGenre.Params(rank = 3, lambda = 0.5, maxIter = 3, tol = 0.0)
    def dump(m: AlsGenre.Model) =
      (m.userFactors.orderBy("id").as[(Int, Seq[Double], Double)].collect().toSeq,
       m.itemFactors.orderBy("id").as[(Int, Seq[Double], Double)].collect().toSeq,
       m.genreFactors.toSeq.sortBy(_._1).map { case (g, f) => (g, f.toSeq) })
    val bcast = dump(AlsGenre.train(ratings, movieGenres, "u", "i", "r", base))
    val huge = dump(AlsGenre.train(ratings, movieGenres, "u", "i", "r",
      base.copy(broadcastEntities = 5, factBuckets = 16))) // both sides above
    def close(a: Seq[Double], b: Seq[Double]): Unit =
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    bcast._1.zip(huge._1).foreach { case (a, b) =>
      assert(a._1 == b._1); close(a._2, b._2); assert(math.abs(a._3 - b._3) < 1e-9) }
    bcast._2.zip(huge._2).foreach { case (a, b) =>
      assert(a._1 == b._1); close(a._2, b._2); assert(math.abs(a._3 - b._3) < 1e-9) }
    bcast._3.zip(huge._3).foreach { case (a, b) =>
      assert(a._1 == b._1); close(a._2, b._2) }
  }

  test("MLlib plain ALS path trains and exports engine-shaped factors") {
    val model = AlsPlain.train(syntheticRatings(3), "u", "i", "r",
      AlsPlain.Params(rank = 3, regParam = 0.1, maxIter = 5, numBlocks = 2))
    val (uf, vf) = AlsPlain.toFactorFrames(model)
    assert(uf.columns.toSeq == Seq("id", "features", "bias"))
    assert(uf.count() == 10 && vf.count() == 12)
  }

  test("A/B simulation is deterministic, bounded and well-formed") {
    val genreIndex = (0 until 20).map(g => (g, (0 until 30).map(m => m))).toDF("genreId", "movieIds")
    val sim1 = AbTest.simulateUsers(spark, genreIndex, numUsers = 60, seed = 7L)
    val sim2 = AbTest.simulateUsers(spark, genreIndex, numUsers = 60, seed = 7L)
    assert(sim1.collect().toSet == sim2.collect().toSet)
    assert(sim1.select("user_id").distinct().count() == 60)
    val perUserGenre = sim1.groupBy("user_id").count().as[(Int, Long)].collect()
    assert(perUserGenre.forall { case (_, n) => n >= 5 && n <= 20 })
    val ratings = sim1.select("rating").distinct().as[Double].collect().toSet
    assert(ratings.subsetOf(Set(7.0, 8.0, 9.0, 10.0)))
    val groups = sim1.select("group").distinct().as[String].collect().toSet
    assert(groups == Set("A", "B"))
  }

  test("A/B evaluate runs the full decision tree on synthetic scores") {
    val rng = new scala.util.Random(13)
    val log = ((0 until 200).map(i => (i, 5.0 + rng.nextGaussian(), "A")) ++
      (0 until 220).map(i => (1000 + i, 5.5 + rng.nextGaussian(), "B")))
      .toDF("user_id", "score", "group")
    val r = AbTest.evaluate(log, seed = 3L)
    assert(r.nA == r.nB)                       // equalized
    assert(r.twoSided.pValue < 0.05)           // clear shift detected
    assert(r.less.pValue < 0.05)               // A < B
    assert(r.levene.pValue > 0.001)
  }
}
class EmbedExtensionsSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("PCA projection of factor frames yields k-dim embeddings") {
    val rng = new scala.util.Random(21)
    val factors = (0 until 30).map(i => (i, Seq.fill(6)(rng.nextGaussian())))
      .toDF("id", "features")
    val proj = Embed.pcaProject(factors, 2).as[(Int, Seq[Double])].collect()
    assert(proj.length == 30)
    assert(proj.forall(_._2.length == 2))
    // deterministic for fixed input
    val proj2 = Embed.pcaProject(factors, 2).as[(Int, Seq[Double])].collect()
    assert(proj.toSeq == proj2.toSeq)
  }

  test("GraftExtensions injects the dot-product function") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    // injection path executes without error; session-level registration is
    // covered end-to-end in VectorTextSpec via GraftFunctions.register
  }
}
