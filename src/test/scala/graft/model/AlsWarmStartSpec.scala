package graft.model

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Warm-start / delta-retraining contract for the explicit-ALS trainers:
  * a converged model plus a small model-consistent ratings delta
  * re-converges in 1-2 sweeps when seeded from the prior factors (the
  * reference's checkpoint-resume flow, explicit_ratings/ab_test.py:73-85)
  * — the fold-deltas-never-rebuild discipline applied to the engine's
  * most expensive standing state. Fixture: a rank-1 factorized matrix
  * whose held-out cells form the delta, so the increment is consistent
  * with the learned structure (the production shape: yesterday's model
  * explains most of today's data). */
class AlsWarmStartSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic rank-1 corpus: 8 users x 9 items, ~15% of cells held
  // out as the delta, every rating = uTrue(u) * vTrue(i)
  private val rng = new scala.util.Random(7)
  private val uTrue = Array.fill(8)(rng.nextGaussian())
  private val vTrue = Array.fill(9)(rng.nextGaussian())
  private val cells =
    for { u <- 0 until 8; i <- 0 until 9 } yield (u, i, rng.nextDouble())
  private def rated(cs: Seq[(Int, Int, Double)]) =
    cs.map { case (u, i, _) => (u, i, uTrue(u) * vTrue(i)) }
  private val baseCells = rated(cells.filter(_._3 < 0.85))
  private val deltaCells = rated(cells.filter(_._3 >= 0.85).take(4))
  private val p = AlsBias.Params(rank = 1, maxIter = 40, tol = 0.05, seed = 42L)

  test("warm restart on a model-consistent delta re-converges in <= 2 sweeps") {
    val base = baseCells.toDF("u", "i", "r").persist()
    val (model, coldHist) = AlsBias.trainTraced(base, "u", "i", "r", p,
      Trace.Config(computeMetrics = false))
    assert(coldHist.length >= 5,
      s"fixture too easy: cold training converged in ${coldHist.length} sweeps")
    assert(coldHist.last.maxDelta <= p.tol, "cold training must converge")
    val updated = base.unionByName(deltaCells.toDF("u", "i", "r")).persist()
    val (_, warmHist) = AlsBias.trainTraced(updated, "u", "i", "r", p,
      Trace.Config(computeMetrics = false), init = Some(model))
    assert(warmHist.length <= 2,
      s"warm restart took ${warmHist.length} sweeps (cold: ${coldHist.length})")
    assert(warmHist.last.maxDelta <= p.tol)
    base.unpersist(); updated.unpersist()
  }

  test("seedFactors keeps prior rows, inits new ids, drops vanished ids") {
    val sp = AlsBias.Params(rank = 2, seed = 1L)
    val prior = Seq(
      (0, Seq(1.0, 2.0), 0.5),
      (1, Seq(3.0, 4.0), -0.5),
      (9, Seq(7.0, 7.0), 7.0)) // id 9 absent from the new corpus
      .toDF("id", "features", "bias")
    val ratings = Seq((0, 0, 1.0), (1, 0, 2.0), (2, 1, 3.0)).toDF("u", "i", "r")
    val got = AlsBias.seedFactors(ratings, "u", sp, 1L, prior)
      .as[(Int, Seq[Double], Double)].collect().map(t => t._1 -> t).toMap
    assert(got.keySet == Set(0, 1, 2)) // universe = the new corpus
    assert(got(0)._2 == Seq(1.0, 2.0) && got(0)._3 == 0.5) // prior kept
    assert(got(1)._2 == Seq(3.0, 4.0) && got(1)._3 == -0.5)
    // the new id gets the SAME deterministic Gaussian init a cold start
    // would give it, with zero bias
    val coldInit = AlsBias.initFactors(ratings, "u", sp, 1L)
      .as[(Int, Seq[Double], Double)].collect().map(t => t._1 -> t).toMap
    assert(got(2) == coldInit(2))
    assert(got(2)._3 == 0.0)
  }

  test("a delta with a NEW user trains warm: fresh id converges, far under cold") {
    val base = baseCells.toDF("u", "i", "r").persist()
    val (model, coldHist) = AlsBias.trainTraced(base, "u", "i", "r", p,
      Trace.Config(computeMetrics = false))
    // a brand-new user rates three items consistently with user 0's taste
    val delta = Seq((99, 0, uTrue(0) * vTrue(0)), (99, 3, uTrue(0) * vTrue(3)),
      (99, 5, uTrue(0) * vTrue(5))).toDF("u", "i", "r")
    val (warm, hist) = AlsBias.trainTraced(base.unionByName(delta), "u", "i", "r", p,
      Trace.Config(computeMetrics = false), init = Some(model))
    val ids = warm.userFactors.select("id").as[Int].collect().toSet
    assert(ids.contains(99), "new user must appear in the warm model")
    assert(hist.last.maxDelta <= p.tol, "warm training must converge")
    // only the fresh random-init entity pays sweeps; far under the cold
    // schedule (measured: 5 vs 23 on this fixture)
    assert(hist.length < coldHist.length / 2,
      s"warm-with-new-user took ${hist.length} vs cold ${coldHist.length}")
    base.unpersist()
  }

  test("ALS continuation is exact: cold(N+k) == cold(N) + warm(k) on the same corpus") {
    // ALS sweeps have no per-sweep randomness (init is id-hash derived,
    // sweeps are deterministic given factors), so checkpoint-resume loses
    // NOTHING: k warm sweeps from the N-sweep model replay exactly the
    // sweeps N+1..N+k of a longer cold run — the explicit-trainer
    // counterpart of BprWarmStartSpec's epochOffset contract. Tolerance
    // covers only partial-aggregation merge order, not model drift.
    val base = baseCells.toDF("u", "i", "r").persist()
    val pp = p.copy(maxIter = 6, tol = 0.0)
    val (cold8, _) = AlsBias.trainTraced(base, "u", "i", "r",
      pp.copy(maxIter = 8), Trace.Config(computeMetrics = false))
    val (cold6, _) = AlsBias.trainTraced(base, "u", "i", "r", pp,
      Trace.Config(computeMetrics = false))
    val (resumed, hist) = AlsBias.trainTraced(base, "u", "i", "r",
      pp.copy(maxIter = 2), Trace.Config(computeMetrics = false),
      init = Some(cold6))
    assert(hist.length == 2)
    def dump(m: AlsBias.Model) =
      (m.userFactors.orderBy("id").as[(Int, Seq[Double], Double)].collect().toSeq,
       m.itemFactors.orderBy("id").as[(Int, Seq[Double], Double)].collect().toSeq)
    val (a, b) = (dump(cold8), dump(resumed))
    a._1.zip(b._1).foreach { case (x, y) =>
      assert(x._1 == y._1)
      x._2.zip(y._2).foreach { case (u, v) => assert(math.abs(u - v) < 1e-9) }
      assert(math.abs(x._3 - y._3) < 1e-9) }
    a._2.zip(b._2).foreach { case (x, y) =>
      assert(x._1 == y._1)
      x._2.zip(y._2).foreach { case (u, v) => assert(math.abs(u - v) < 1e-9) }
      assert(math.abs(x._3 - y._3) < 1e-9) }
    base.unpersist()
  }

  test("disk resume: train -> snapshot -> loadModel -> warm retrain in <= 2 sweeps") {
    // the reference's ACTUAL resume flow loads factors FROM DISK
    // (ab_test.py:73-85) — close the loop end-to-end through the public
    // loader, not the in-memory model
    val dir = java.nio.file.Files.createTempDirectory("als_resume").toString
    val base = baseCells.toDF("u", "i", "r").persist()
    val (_, coldHist) = AlsBias.trainTraced(base, "u", "i", "r", p,
      Trace.Config(computeMetrics = false, snapshotDir = Some(dir)))
    assert(coldHist.length >= 5)
    val loaded = Trace.loadModel(spark, dir, "final")
    val updated = base.unionByName(deltaCells.toDF("u", "i", "r")).persist()
    val (_, warmHist) = AlsBias.trainTraced(updated, "u", "i", "r", p,
      Trace.Config(computeMetrics = false), init = Some(loaded))
    assert(warmHist.length <= 2,
      s"disk-resumed warm restart took ${warmHist.length} sweeps (cold: ${coldHist.length})")
    assert(warmHist.last.maxDelta <= p.tol)
    base.unpersist(); updated.unpersist()
  }

  test("loadGenreModel round-trips the genre matrix and warm-retrains from disk") {
    val dir = java.nio.file.Files.createTempDirectory("als_genre_resume").toString
    val ratings = baseCells.toDF("u", "i", "r").persist()
    val genres = (0 until 9)
      .map(i => (i, Seq(i % 3, (i + 1) % 3).distinct, 2))
      .toDF("id", "genre_values", "genre_count")
    val gp = AlsGenre.Params(rank = 1, maxIter = 40, tol = 0.05, seed = 42L)
    val (model, coldHist) = AlsGenre.trainTraced(ratings, genres, "u", "i", "r", gp,
      Trace.Config(computeMetrics = false, snapshotDir = Some(dir)))
    val loaded = Trace.loadGenreModel(spark, dir, "final")
    // the genre matrix round-trips exactly
    assert(loaded.genreFactors.keySet == model.genreFactors.keySet)
    loaded.genreFactors.foreach { case (g, f) =>
      assert(f.sameElements(model.genreFactors(g)), s"genre $g") }
    val (_, warmHist) = AlsGenre.trainTraced(ratings, genres, "u", "i", "r", gp,
      Trace.Config(computeMetrics = false), init = Some(loaded))
    assert(warmHist.length <= 2,
      s"disk-resumed genre restart took ${warmHist.length} (cold: ${coldHist.length})")
    ratings.unpersist()
  }

  test("AlsGenre warm restart seeds users, items AND the genre matrix") {
    val ratings = baseCells.toDF("u", "i", "r").persist()
    val genres = (0 until 9)
      .map(i => (i, Seq(i % 3, (i + 1) % 3).distinct, 2))
      .toDF("id", "genre_values", "genre_count")
    val gp = AlsGenre.Params(rank = 1, maxIter = 40, tol = 0.05, seed = 42L)
    val (model, coldHist) = AlsGenre.trainTraced(ratings, genres, "u", "i", "r", gp,
      Trace.Config(computeMetrics = false))
    assert(coldHist.length >= 3,
      s"fixture too easy: cold genre training converged in ${coldHist.length}")
    assert(coldHist.last.maxDelta <= gp.tol, "cold genre training must converge")
    val (warm, warmHist) = AlsGenre.trainTraced(ratings, genres, "u", "i", "r", gp,
      Trace.Config(computeMetrics = false), init = Some(model))
    // identical corpus from the converged state: 1-2 confirming sweeps
    assert(warmHist.length <= 2,
      s"warm genre restart took ${warmHist.length} sweeps (cold: ${coldHist.length})")
    assert(warm.genreFactors.keySet == model.genreFactors.keySet)
    ratings.unpersist()
  }
}
