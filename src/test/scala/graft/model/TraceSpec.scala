package graft.model

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Per-iteration trace + snapshot cadence (reference prac_1.py:141-204,
  * prac_2.py:117-139): the history is produced, the callback fires, the
  * durable parquet snapshots round-trip to an equivalent model. */
class TraceSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val ratings = {
    val rng = new scala.util.Random(7)
    val uTrue = Array.fill(10)(Array.fill(2)(rng.nextGaussian()))
    val vTrue = Array.fill(12)(Array.fill(2)(rng.nextGaussian()))
    (for {
      u <- 0 until 10; i <- 0 until 12 if rng.nextDouble() < 0.8
    } yield (u, i, uTrue(u).zip(vTrue(i)).map { case (a, b) => a * b }.sum))
      .toDF("u", "i", "r")
  }

  test("AlsBias.trainTraced: full history, live callback, round-trip snapshots") {
    val dir = tmpDir("als_trace")
    var callbacks = 0
    val p = AlsBias.Params(rank = 2, maxIter = 4, tol = 0.0)
    val (model, hist) = AlsBias.trainTraced(ratings, "u", "i", "r", p,
      Trace.Config(computeMetrics = true, onIter = _ => callbacks += 1,
        snapshotDir = Some(dir), snapshotEvery = 2))
    assert(hist.map(_.iter) == Seq(1, 2, 3, 4) && callbacks == 4)
    assert(hist.forall(s => !s.logLik.isNaN && !s.rmse.isNaN && s.maxDelta > 0))
    // the reference's convergence signal: LL improves, RMSE shrinks
    assert(hist.last.logLik >= hist.head.logLik)
    assert(hist.last.rmse <= hist.head.rmse)
    // cadence: every 2 sweeps + final + the metric history
    for (tag <- Seq("iter_2", "iter_4", "final"))
      assert(new java.io.File(s"$dir/$tag/user_factors").exists, tag)
    val storedTrace = spark.read.parquet(s"$dir/trace")
      .orderBy(col("iter")).as[Trace.IterStats].collect().toSeq
    assert(storedTrace == hist)
    // snapshot round-trips to an equivalent model (identical predictions)
    val reloaded = Trace.loadModel(spark, dir, "final")
    def preds(m: AlsBias.Model) = m.predict(ratings, "u", "i")
      .select(col("u"), col("i"), col("prediction"))
      .as[(Int, Int, Double)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(preds(reloaded) == preds(model))
  }

  test("plain train (no metrics) still tracks maxDelta history internally") {
    val p = AlsBias.Params(rank = 2, maxIter = 2, tol = 0.0)
    val (_, hist) = AlsBias.trainTraced(ratings, "u", "i", "r", p,
      Trace.Config(computeMetrics = false))
    assert(hist.length == 2)
    assert(hist.forall(s => s.logLik.isNaN && s.rmse.isNaN && s.maxDelta > 0))
  }

  test("AlsGenre.trainTraced snapshots genre factors alongside the frames") {
    val movieGenres = (0 until 12)
      .map(i => (i, Seq(i % 3, 3 + i % 2), 2)).toDF("id", "genre_values", "genre_count")
    val dir = tmpDir("genre_trace")
    val p = AlsGenre.Params(rank = 2, maxIter = 2, tol = 0.0)
    val (model, hist) = AlsGenre.trainTraced(ratings, movieGenres, "u", "i", "r", p,
      Trace.Config(computeMetrics = true, snapshotDir = Some(dir), snapshotEvery = 2))
    assert(hist.length == 2 && hist.forall(s => !s.logLik.isNaN))
    val gf = spark.read.parquet(s"$dir/final/genre_factors")
      .as[(Int, Seq[Double])].collect().toMap
    assert(gf.keySet == model.genreFactors.keySet)
    model.genreFactors.foreach { case (g, f) => assert(gf(g) == f.toSeq) }
  }

  test("Bpr epoch trace: metrics, free item-delta, snapshot round-trip") {
    val positives = Seq(
      (0, 0), (0, 1), (0, 2), (1, 1), (1, 3), (2, 0), (2, 3), (3, 2), (3, 4))
      .toDF("user", "item")
    val dir = tmpDir("bpr_trace")
    val hist = scala.collection.mutable.ArrayBuffer.empty[Trace.EpochStats]
    val model = Bpr.train(positives, "user", "item", numItems = 5,
      Bpr.Params(rank = 2, epochs = 3, seed = 11, initScale = 0.1),
      trace = Trace.BprConfig(computeMetrics = true, metricK = 2,
        onEpoch = hist += _, snapshotDir = Some(dir), snapshotEvery = 2))
    assert(hist.map(_.epoch) == Seq(1, 2, 3))
    assert(hist.forall(s => s.maxItemDelta > 0))
    assert(hist.forall(s => s.precisionAtK >= 0 && s.precisionAtK <= 1
      && s.recallAtK >= 0 && s.recallAtK <= 1))
    for (tag <- Seq("epoch_2", "final"))
      assert(new java.io.File(s"$dir/$tag/item_factors").exists, tag)
    assert(spark.read.parquet(s"$dir/trace").count() == 3)
    // final snapshot carries exactly the returned factors
    val storedItems = spark.read.parquet(s"$dir/final/item_factors")
      .as[(Int, Seq[Double])].collect().toMap
    model.itemFactors.zipWithIndex.foreach { case (f, i) =>
      assert(storedItems(i) == f.toSeq)
    }
    val storedUsers = spark.read.parquet(s"$dir/final/user_factors")
      .as[(Int, Seq[Double])].collect().toMap
    model.userFactors.foreach { case (u, f) => assert(storedUsers(u) == f.toSeq) }
  }

  test("DsgdBpr epoch trace: accumulator delta, metrics, snapshot round-trip") {
    val positives = Seq(
      (0, 0), (0, 1), (0, 2), (1, 1), (1, 3), (2, 0), (2, 3), (3, 2), (3, 4))
      .toDF("user", "item")
    val dir = tmpDir("dsgd_trace")
    val hist = scala.collection.mutable.ArrayBuffer.empty[Trace.EpochStats]
    val model = DsgdBpr.train(positives, "user", "item", numItems = 5,
      DsgdBpr.Params(rank = 2, epochs = 3, blocks = 2, seed = 11, initScale = 0.1),
      trace = Trace.BprConfig(computeMetrics = true, metricK = 2,
        onEpoch = hist += _, snapshotDir = Some(dir), snapshotEvery = 2))
    assert(hist.map(_.epoch) == Seq(1, 2, 3))
    assert(hist.forall(s => s.maxItemDelta > 0))
    assert(hist.forall(s => s.precisionAtK >= 0 && s.precisionAtK <= 1))
    for (tag <- Seq("epoch_2", "final"))
      assert(new java.io.File(s"$dir/$tag/item_factors").exists, tag)
    val storedItems = spark.read.parquet(s"$dir/final/item_factors")
      .as[(Int, Seq[Double])].collect().toMap
    model.itemFactors.zipWithIndex.foreach { case (f, i) =>
      assert(storedItems(i) == f.toSeq)
    }
    // tracing must not perturb training: same model as the untraced run
    val untraced = DsgdBpr.train(positives, "user", "item", numItems = 5,
      DsgdBpr.Params(rank = 2, epochs = 3, blocks = 2, seed = 11, initScale = 0.1))
    model.itemFactors.zipWithIndex.foreach { case (f, i) =>
      assert(untraced.itemFactors(i).toSeq == f.toSeq)
    }
  }
}
