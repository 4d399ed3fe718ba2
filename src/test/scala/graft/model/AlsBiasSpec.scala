package graft.model

import graft.SparkTestBase
import graft.linalg.Linalg
import org.apache.spark.sql.functions._

class AlsBiasSpec extends SparkTestBase {
  import spark.implicits._

  test("Linalg.choleskySolve solves SPD systems") {
    val a = Array(Array(4.0, 2.0), Array(2.0, 3.0))
    val x = Linalg.choleskySolve(a, Array(10.0, 8.0))
    // 4x+2y=10, 2x+3y=8 -> x=1.75, y=1.5
    assert(math.abs(x(0) - 1.75) < 1e-12 && math.abs(x(1) - 1.5) < 1e-12)
  }

  test("half-sweep bias matches closed form on zero factors (bias-only model)") {
    // with u=0, v=0, bo=0: newBias = lambda*sum(r)/(alpha+lambda*n), features=0
    val p = AlsBias.Params(rank = 2, lambda = 0.1, tau = 0.01, alpha = 0.01)
    val ratings = Seq((0, 0, 4.0), (0, 1, 2.0), (1, 0, 5.0)).toDF("u", "i", "r")
    val zeroU = Seq((0, Seq(0.0, 0.0), 0.0), (1, Seq(0.0, 0.0), 0.0))
      .toDF("id", "features", "bias")
    val zeroI = Seq((0, Seq(0.0, 0.0), 0.0), (1, Seq(0.0, 0.0), 0.0))
      .toDF("id", "features", "bias")
    val out = AlsBias.halfSweep(ratings, zeroU, zeroI, "u", "i", "r", p)
      .as[(Int, Seq[Double], Double)].collect().map(t => t._1 -> t).toMap
    val b0 = 0.1 * 6.0 / (0.01 + 0.1 * 2)
    val b1 = 0.1 * 5.0 / (0.01 + 0.1 * 1)
    assert(math.abs(out(0)._3 - b0) < 1e-12)
    assert(math.abs(out(1)._3 - b1) < 1e-12)
    assert(out(0)._2.forall(_ == 0.0)) // zero item vectors -> zero solution
  }

  test("half-sweep trait vector matches hand-computed d=1 normal equation") {
    // one user, two items with v=[2],[3], biases bv=0.5,-0.5, user bias from formula
    val p = AlsBias.Params(rank = 1, lambda = 0.1, tau = 0.01, alpha = 0.01)
    val ratings = Seq((0, 0, 4.0), (0, 1, 3.0)).toDF("u", "i", "r")
    val users = Seq((0, Seq(1.0), 0.0)).toDF("id", "features", "bias")
    val items = Seq((0, Seq(2.0), 0.5), (1, Seq(3.0), -0.5)).toDF("id", "features", "bias")
    val out = AlsBias.halfSweep(ratings, users, items, "u", "i", "r", p)
      .as[(Int, Seq[Double], Double)].head()
    // resid with current u=1: (4 - 1*2 - 0.5) + (3 - 1*3 + 0.5) = 1.5 + 0.5 = 2.0
    val bNew = 0.1 * 2.0 / (0.01 + 0.1 * 2)
    // rhs = sum((r - bv - bNew)*v) = (4-0.5-b)*2 + (3+0.5-b)*3
    val rhs = (4.0 - 0.5 - bNew) * 2 + (3.0 + 0.5 - bNew) * 3
    // (lambda*(4+9) + tau) * u = lambda * rhs
    val uNew = 0.1 * rhs / (0.1 * 13 + 0.01)
    assert(math.abs(out._3 - bNew) < 1e-12)
    assert(math.abs(out._2.head - uNew) < 1e-12)
  }

  test("training on a rank-2 synthetic matrix converges to low RMSE") {
    val rng = new scala.util.Random(7)
    val d = 2
    val uTrue = Array.fill(12)(Array.fill(d)(rng.nextGaussian()))
    val vTrue = Array.fill(15)(Array.fill(d)(rng.nextGaussian()))
    val ratings = (for {
      u <- 0 until 12; i <- 0 until 15 if rng.nextDouble() < 0.8
    } yield (u, i, uTrue(u).zip(vTrue(i)).map { case (a, b) => a * b }.sum))
      .toDF("u", "i", "r")
    val model = AlsBias.train(ratings, "u", "i", "r",
      AlsBias.Params(rank = 4, lambda = 1.0, tau = 0.01, alpha = 0.01, maxIter = 12, tol = 1e-4))
    val rmse = Metrics.rmse(model.predict(ratings, "u", "i"), "r", "prediction")
    assert(rmse < 0.15, s"rmse $rmse")
  }

  test("strictQ1Bias reproduces the reference's last-rating movie bias") {
    // item 0 rated by users 0 and 1; zero factors so resid = r
    val p = AlsBias.Params(rank = 1, lambda = 0.1, alpha = 0.01, strictQ1Bias = true)
    val ratings = Seq((0, 0, 4.0), (1, 0, 2.0)).toDF("u", "i", "r")
    val items = Seq((0, Seq(0.0), 0.0)).toDF("id", "features", "bias")
    val users = Seq((0, Seq(0.0), 0.0), (1, Seq(0.0), 0.0)).toDF("id", "features", "bias")
    val strict = AlsBias.halfSweep(ratings, items, users, "i", "u", "r", p)
      .as[(Int, Seq[Double], Double)].head()
    // last = max userId = user 1 -> resid 2.0; denominator still uses n=2
    assert(math.abs(strict._3 - 0.1 * 2.0 / (0.01 + 0.1 * 2)) < 1e-12)
    val corrected = AlsBias.halfSweep(ratings, items, users, "i", "u", "r",
      p.copy(strictQ1Bias = false)).as[(Int, Seq[Double], Double)].head()
    assert(math.abs(corrected._3 - 0.1 * 6.0 / (0.01 + 0.1 * 2)) < 1e-12)
  }

  test("maxDelta is zero for identical frames and positive otherwise") {
    val f1 = Seq((0, Seq(1.0, 2.0), 0.5)).toDF("id", "features", "bias")
    val f2 = Seq((0, Seq(1.0, 2.5), 0.5)).toDF("id", "features", "bias")
    assert(AlsBias.maxDelta(f1, f1) == 0.0)
    assert(math.abs(AlsBias.maxDelta(f1, f2) - 0.5) < 1e-12)
  }

  test("sweep modes are numerically identical: bcast == mid == routed huge") {
    // the threshold picks the PLAN, never the math: full multi-sweep
    // trainings through each sweepPlans branch (both-small broadcast,
    // one-side-above mid, both-above routed-factor huge) must produce
    // bit-comparable models on the same corpus. Covers the huge branch's
    // bucketed-fact + routing-table construction end to end, including
    // the training-scoped subset-key co-partition conf.
    val rng = new scala.util.Random(11)
    val ratings = (for {
      u <- 0 until 30; i <- 0 until 12 if rng.nextDouble() < 0.6
    } yield (u, i, (rng.nextInt(9) + 1) * 0.5)).toDF("u", "i", "r")
    val base = AlsBias.Params(rank = 3, lambda = 0.5, tau = 0.01, alpha = 0.01,
      maxIter = 4, tol = 0.0)
    def dump(m: AlsBias.Model) =
      (m.userFactors.orderBy("id").as[(Int, Seq[Double], Double)].collect().toSeq,
       m.itemFactors.orderBy("id").as[(Int, Seq[Double], Double)].collect().toSeq)
    def close(a: (Int, Seq[Double], Double), b: (Int, Seq[Double], Double)): Unit = {
      assert(a._1 == b._1)
      a._2.zip(b._2).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
      assert(math.abs(a._3 - b._3) < 1e-9)
    }
    val bcast = dump(AlsBias.train(ratings, "u", "i", "r", base))
    val mid = dump(AlsBias.train(ratings, "u", "i", "r",
      base.copy(broadcastEntities = 20))) // 30 users above, 12 items below
    val huge = dump(AlsBias.train(ratings, "u", "i", "r",
      base.copy(broadcastEntities = 5, factBuckets = 16))) // both above
    // default bucket encoding: one murmur-representative bucket per
    // partition (the OutBlock-minimum routing geometry)
    val hugeDef = dump(AlsBias.train(ratings, "u", "i", "r",
      base.copy(broadcastEntities = 5)))
    for (other <- Seq(mid, huge, hugeDef)) {
      bcast._1.zip(other._1).foreach { case (a, b) => close(a, b) }
      bcast._2.zip(other._2).foreach { case (a, b) => close(a, b) }
    }
    // the scoped conf restored after training (default true on 4.x)
    assert(spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition") == "true")
  }

  test("bucketReps pins bucket j to partition j under Spark's repartition hash") {
    for (n <- Seq(3, 32, 100)) {
      val reps = AlsBias.bucketReps(n)
      assert(reps.distinct.length == n)
      // the exact partition function a repartition(n, col) applies
      reps.zipWithIndex.foreach { case (v, j) =>
        val h = new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
          Seq(org.apache.spark.sql.catalyst.expressions.Literal(v)))
          .eval(null).asInstanceOf[Int]
        assert(math.floorMod(h, n) == j, s"rep $v for bucket $j of $n")
      }
    }
    // and through the REAL planner: a frame repartitioned on the rep
    // column puts every bucket alone in its own partition
    val n = 8
    val reps = AlsBias.bucketReps(n)
    val df = (0 until 400).toDF("id")
      .withColumn("b", element_at(
        array(reps.map(lit(_)).toIndexedSeq: _*),
        (pmod(hash(col("id")), lit(n)) + 1).cast("int")))
      .repartition(n, col("b"))
    val perPart = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single(pid -> it.map(_.getInt(1)).toSet)
    }.collect().toMap
    assert(perPart.values.forall(_.size <= 1), s"bucket collision: $perPart")
    assert(perPart.count(_._2.nonEmpty) == n, "every partition owns a bucket")
  }

  test("gaussian init is deterministic and roughly scaled") {
    val ids = (0 until 500).toDF("id")
    val feats = ids.select(AlsBias.gaussianInitCol(col("id"), 4, 1.0, 42L).as("f"))
      .as[Seq[Double]].collect()
    val feats2 = ids.select(AlsBias.gaussianInitCol(col("id"), 4, 1.0, 42L).as("f"))
      .as[Seq[Double]].collect()
    assert(feats.toSeq == feats2.toSeq)
    val all = feats.flatten
    val mean = all.sum / all.size
    val sd = math.sqrt(all.map(x => (x - mean) * (x - mean)).sum / all.size)
    assert(math.abs(mean) < 0.1 && sd > 0.8 && sd < 1.2)
  }
}
class BiasOnlySpec extends graft.SparkTestBase {
  import spark.implicits._

  test("biasOnly training keeps factors at zero and fits additive biases") {
    // additive ground truth: r = bu(u) + bi(i)
    val ratings = (for (u <- 0 until 6; i <- 0 until 8)
      yield (u, i, 3.0 + (u - 2.5) * 0.4 + (i - 3.5) * 0.2)).toSeq.toDF("u", "i", "r")
    val model = graft.model.AlsBias.train(ratings, "u", "i", "r",
      graft.model.AlsBias.Params(rank = 2, lambda = 1.0, alpha = 0.001,
        maxIter = 8, tol = 1e-6, biasOnly = true))
    val feats = model.userFactors.union(model.itemFactors)
      .select("features").as[Seq[Double]].collect()
    assert(feats.forall(_.forall(_ == 0.0)))
    val rmse = graft.model.Metrics.rmse(
      model.predict(ratings, "u", "i"), "r", "prediction")
    assert(rmse < 0.1, s"rmse $rmse")
  }
}
