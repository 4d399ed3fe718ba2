package graft.model

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Warm-start / resume contract for the IMPLICIT trainers — the flow the
  * reference runs for BPR (it snapshots parameters every 5 epochs,
  * implicit_feedback/prac_2.py:118-122, and reloads them in
  * prac_2_results.py:22-23), mirroring what AlsWarmStartSpec pins for
  * explicit ALS:
  *   - epochs = 0 with an `init` is the identity on the seeded rows
  *     (resume really starts FROM the checkpoint, not near it);
  *   - ids new to the corpus/catalog get the deterministic cold init;
  *   - `epochOffset` continuation: resume(k, offset N) replays exactly
  *     the sampling streams of cold epochs N..N+k-1, so checkpointing
  *     LOSES NOTHING — cold(N+k) == cold(N) + resume(k) (bit-identical
  *     for DSGD's conflict-free strata; machine-noise tolerance for
  *     Bpr's summed delta merge);
  *   - the disk leg closes end-to-end: factorsDir dump →
  *     Trace.loadFactorFrames → trainFactors(init = loaded). */
class BprWarmStartSpec extends SparkTestBase {
  import spark.implicits._

  // two taste clusters: users 0-3 like items 0-4, users 4-7 like items 5-9
  private def clusteredPositives = {
    val rows = for {
      u <- 0 until 8
      i <- 0 until 10
      if (u < 4 && i < 5) || (u >= 4 && i >= 5)
    } yield (u, i)
    rows.toDF("user", "item")
  }

  test("Bpr: epochs=0 with init is the identity; offset resume continues exactly") {
    val p = Bpr.Params(rank = 4, lr = 0.05, epochs = 10, seed = 7L, initScale = 0.1)
    val model = Bpr.train(clusteredPositives, "user", "item", 10, p)
    // identity: zero warm epochs return the seeded factors bit-exactly
    val idy = Bpr.train(clusteredPositives, "user", "item", 10,
      p.copy(epochs = 0), init = Some(model))
    model.userFactors.foreach { case (u, f) =>
      assert(idy.userFactors(u).sameElements(f), s"user $u") }
    model.itemFactors.zip(idy.itemFactors).zipWithIndex.foreach {
      case ((a, b), i) => assert(a.sameElements(b), s"item $i") }
    // continuation: resume(2 epochs, offset 10) replays exactly the
    // sampling streams of cold epochs 10-11, so cold(12) == cold(10) +
    // resume(2). Tolerance only for the item-delta merge's float
    // summation order (reduceByKey arrival order); the values match to
    // machine noise, not "close after retraining"
    val cold12 = Bpr.train(clusteredPositives, "user", "item", 10,
      p.copy(epochs = 12))
    val resumed = Bpr.train(clusteredPositives, "user", "item", 10,
      p.copy(epochs = 2, epochOffset = 10), init = Some(model))
    cold12.userFactors.foreach { case (u, f) =>
      f.zip(resumed.userFactors(u)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"user $u: $a vs $b") } }
    cold12.itemFactors.zip(resumed.itemFactors).zipWithIndex.foreach {
      case ((a, b), i) => a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"item $i: $x vs $y") } }
  }

  test("Bpr: a grown catalog warm-starts with cold-init tails for the new ids") {
    val p = Bpr.Params(rank = 3, lr = 0.05, epochs = 4, seed = 11L, initScale = 0.1)
    val model = Bpr.train(clusteredPositives, "user", "item", 10, p)
    // the corpus gains a user (99) and an item (10)
    val grown = clusteredPositives
      .unionByName(Seq((99, 10), (99, 0)).toDF("user", "item"))
    val seeded = Bpr.train(grown, "user", "item", 11, p.copy(epochs = 0),
      init = Some(model))
    // prior ids verbatim
    model.itemFactors.zip(seeded.itemFactors).foreach { case (a, b) =>
      assert(a.sameElements(b)) }
    model.userFactors.foreach { case (u, f) =>
      assert(seeded.userFactors(u).sameElements(f)) }
    // new ids carry the deterministic COLD init for the grown shape
    val cold = Bpr.train(grown, "user", "item", 11, p.copy(epochs = 0))
    assert(seeded.userFactors(99).sameElements(cold.userFactors(99)))
    assert(seeded.itemFactors(10).sameElements(cold.itemFactors(10)))
  }

  test("DsgdBpr: disk resume round-trip — dump, load, offset resume is bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("dsgd_warm").toString
    val p = DsgdBpr.Params(rank = 4, lr = 0.05, epochs = 10, blocks = 3,
      seed = 7L, initScale = 0.1)
    DsgdBpr.trainFactors(clusteredPositives, "user", "item", 10, p,
      factorsDir = Some(dir))
    val loaded = Trace.loadFactorFrames(spark, dir, "final")
    def dump(ff: DsgdBpr.FactorFrames) =
      (ff.userFactors.orderBy("id").as[(Int, Seq[Double])].collect().toSeq,
       ff.itemFactors.orderBy("id").as[(Int, Seq[Double])].collect().toSeq)
    // epochs=0 with the loaded frames is the identity on the dump
    val idy = DsgdBpr.trainFactors(clusteredPositives, "user", "item", 10,
      p.copy(epochs = 0), init = Some(loaded))
    assert(dump(idy) == dump(loaded))
    // continuation: DSGD strata are conflict-free, so resume(2, offset 10)
    // from the DISK dump is BIT-IDENTICAL to cold(12) — checkpoint-resume
    // loses nothing, the strongest form of the reference's reload flow
    val cold12 = DsgdBpr.trainFactors(clusteredPositives, "user", "item", 10,
      p.copy(epochs = 12))
    val resumed = DsgdBpr.trainFactors(clusteredPositives, "user", "item", 10,
      p.copy(epochs = 2, epochOffset = 10), init = Some(loaded))
    assert(dump(resumed) == dump(cold12))
  }
}
