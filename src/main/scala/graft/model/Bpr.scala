package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Bayesian Personalised Ranking on implicit feedback
  * (/root/reference/implicit_feedback/functions.py:6-260, prac_2.py).
  *
  * Spark-first layout (SURVEY.md §7.4): users are RANGE-DISJOINT across
  * partitions, so the per-user SGD state is partition-local and exact; item
  * factors are broadcast per epoch and updated on a partition-local clone,
  * with per-partition deltas summed at the epoch barrier (block-Jacobi /
  * Hogwild-style). With a single partition this degenerates to the
  * reference's faithful sequential SGD (its own triplet order is already
  * shuffle-nondeterministic, prac_2.py:91-92). Reference quirk Q5 (the
  * regularizer is ADDED, growing θ) is corrected to the standard descent
  * sign by default; `refCompatRegSign = true` reproduces the quirk.
  *
  * Negative sampling (L13/L14): popularity-weighted inverse-CDF draw,
  * rejected while the candidate is in the user's positive set (and, in
  * genre-aware mode, while it shares any genre with the positive item,
  * functions.py:84-131), with a bounded retry count for determinism.
  */
object Bpr {

  /** `initScale` NaN ⇒ reference default 5/√rank
    * (/root/reference/implicit_feedback/prac_2.py:52-57); smaller values
    * avoid sigmoid saturation on dense synthetic data. */
  /** `epochOffset` numbers this run's epochs from `offset` instead of 0 —
    * the per-(user, epoch) sampling RNGs, the trace's epoch labels, and
    * the snapshot tags all continue the prior run's sequence, so a
    * checkpoint-resume (`init` + the offset) replays EXACTLY the epochs
    * a longer cold run would have executed (BprWarmStartSpec pins
    * cold(N+k) == cold(N) then resume(k, offset N)). */
  final case class Params(rank: Int = 12, lr: Double = 0.02, reg: Double = 0.01,
                          epochs: Int = 30, seed: Long = 42L,
                          maxSampleRetries: Int = 200,
                          refCompatRegSign: Boolean = false,
                          initScale: Double = Double.NaN,
                          epochOffset: Int = 0) {
    def resolvedInitScale: Double =
      if (initScale.isNaN) 5.0 / math.sqrt(rank) else initScale
  }

  final case class UserState(user: Int, pos: Array[Int], u: Array[Double])

  /** Per-partition epoch output: updated user states stay distributed; item
    * deltas are the only driver-bound data (numItems × rank doubles). */
  final case class EpochOut(users: Array[UserState],
                            deltas: Array[(Int, Array[Double])])

  final case class ModelArrays(userFactors: Map[Int, Array[Double]],
                               itemFactors: Array[Array[Double]]) {
    def toDataFrames(spark: SparkSession): (DataFrame, DataFrame) = {
      import spark.implicits._
      val uf = userFactors.toSeq.map { case (id, f) => (id, f.toSeq) }
        .toDF("id", "features")
      val vf = itemFactors.zipWithIndex.map { case (f, id) => (id, f.toSeq) }
        .toSeq.toDF("id", "features")
      (uf, vf)
    }
  }

  /** σ(−x) = 1/(1+eˣ), overflow-guarded (functions.py:181). */
  def sigmoidNeg(x: Double): Double =
    if (x > 35) 0.0 else if (x < -35) 1.0 else 1.0 / (1.0 + math.exp(x))

  private def gaussianRow(rng: java.util.Random, d: Int, scale: Double): Array[Double] =
    Array.fill(d)(rng.nextGaussian() * scale)

  /** Popularity-weighted negative draw via inverse CDF + rejection.
    * `genresOf` null ⇒ naive sampling (L13); else genre-aware (L14).
    * Returns -1 when no eligible negative exists (positives cover the whole
    * catalog, or every non-positive shares a genre with `posItem`) — callers
    * skip the triplet update, preserving the sampling invariant instead of
    * silently relaxing it. */
  private[model] def sampleNegative(rng: java.util.Random, cdf: Array[Double],
                                    userPos: java.util.HashSet[Int], posItem: Int,
                                    genresOf: Array[Array[Int]], maxRetries: Int): Int = {
    @inline def eligible(j: Int): Boolean =
      !userPos.contains(j) &&
        (genresOf == null || !sharesGenre(genresOf(posItem), genresOf(j)))
    var tries = 0
    while (tries < maxRetries) {
      val u = rng.nextDouble()
      var j = java.util.Arrays.binarySearch(cdf, u)
      if (j < 0) j = -j - 1
      if (j >= cdf.length) j = cdf.length - 1
      if (eligible(j)) return j
      tries += 1
    }
    // deterministic fallback: first ELIGIBLE item (same constraints as the
    // sampled path), bounded by the catalog size; -1 if none exists
    var j = 0
    while (j < cdf.length && !eligible(j)) j += 1
    if (j < cdf.length) j else -1
  }

  private def sharesGenre(a: Array[Int], b: Array[Int]): Boolean = {
    var i = 0
    while (i < a.length) {
      var k = 0
      while (k < b.length) {
        if (a(i) == b(k)) return true
        k += 1
      }
      i += 1
    }
    false
  }

  /** Train from a positives frame (userCol, itemCol) with dense 0-based ids.
    * `numItems` = dense item-id cardinality; `itemGenres` optional
    * (itemId -> genre ids) for genre-aware sampling.
    *
    * `trace` adds the reference's per-epoch observability
    * (/root/reference/implicit_feedback/prac_2.py:117-139): P/R@k via
    * `onEpoch` (opt-in — it prices a users × items scoring pass per epoch,
    * as the reference does every iteration), the epoch's max item-factor
    * delta (free — it falls out of the delta merge), and factor parquet
    * snapshots every `snapshotEvery` epochs plus a final set.
    *
    * `init` warm-starts the epoch loop from a prior model — the
    * reference's checkpoint-resume flow (prac_2.py:118-122 snapshots
    * every 5 epochs; prac_2_results.py:22-23 reloads): prior user/item
    * rows seed verbatim, ids new to this corpus get the deterministic
    * cold init (the item side replays the cold init sequence first, so
    * a grown catalog's new tail matches what cold training at the same
    * `numItems` would draw). At scale prefer [[DsgdBpr.trainFactors]]'s
    * frame-based `init` — this trainer's ModelArrays contract is
    * driver-sized by design. */
  def train(positives: DataFrame, userCol: String, itemCol: String, numItems: Int,
            p: Params = Params(), itemGenres: Option[Map[Int, Array[Int]]] = None,
            numPartitions: Int = 0,
            trace: Trace.BprConfig = Trace.BprConfig(),
            init: Option[ModelArrays] = None): ModelArrays = {
    val spark = positives.sparkSession
    import spark.implicits._

    // popularity distribution (A2, prac_2.py:17-25) -> CDF over item id
    // (numeric widening: denseReindex emits LONG ids, fixtures INT)
    val counts = positives.groupBy(col(itemCol)).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getAs[Number](0).intValue -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val cdf = new Array[Double](numItems)
    var acc = 0.0
    for (i <- 0 until numItems) {
      acc += counts.getOrElse(i, 0L) / total
      cdf(i) = acc
    }
    cdf(numItems - 1) = 1.0

    val genresArr: Array[Array[Int]] = itemGenres
      .map(m => Array.tabulate(numItems)(i => m.getOrElse(i, Array.empty[Int])))
      .orNull

    val initRng = new java.util.Random(p.seed)
    val scale = p.resolvedInitScale
    // cold init always draws the full sequence (item i's draw depends on
    // the i-1 before it), THEN the warm seed overwrites the covered
    // prefix — new tail ids match a cold training at the same numItems
    var itemF = Array.fill(numItems)(gaussianRow(initRng, p.rank, scale))
    init.foreach { m =>
      var i = 0
      val bound = math.min(numItems, m.itemFactors.length)
      while (i < bound) { itemF(i) = m.itemFactors(i).clone(); i += 1 }
    }
    val bcWarmU = init.map(m => positives.sparkSession.sparkContext
      .broadcast(m.userFactors))

    val nPart = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    var users: Dataset[UserState] = positives
      .groupBy(col(userCol)).agg(collect_list(col(itemCol)).as("pos"))
      .as[(Int, Seq[Int])]
      .map { case (u, pos) =>
        val rng = new java.util.Random(p.seed ^ (u.toLong * 2654435761L))
        val warm = bcWarmU.flatMap(_.value.get(u))
        UserState(u, pos.toArray,
          warm.map(_.clone()).getOrElse(gaussianRow(rng, p.rank, scale)))
      }
      .repartition(nPart, col("user"))
      .persist()
    users.count()

    val sc = spark.sparkContext
    // CDF and genre metadata are epoch-invariant: broadcast ONCE (only the
    // item factors change per epoch)
    val bcCdf = sc.broadcast(cdf)
    val bcGenres = sc.broadcast(genresArr)
    val epochHist = mutable.ArrayBuffer.empty[Trace.EpochStats]
    for (epoch0 <- 0 until p.epochs) {
      val epoch = p.epochOffset + epoch0 // global epoch: resume replays exactly
      val bcV = sc.broadcast(itemF)
      val pp = p
      val epochOut = users.mapPartitions { it =>
        val vLocal = bcV.value.map(_.clone())
        val touched = new mutable.HashSet[Int]
        val out = it.map { st =>
          val rng = new java.util.Random(pp.seed ^ (st.user.toLong * 31L) ^ (epoch * 1000003L))
          val posSet = new java.util.HashSet[Int]()
          st.pos.foreach(posSet.add(_))
          val u = st.u.clone()
          val d = pp.rank
          st.pos.foreach { i =>
            val j = sampleNegative(rng, bcCdf.value, posSet, i, bcGenres.value,
              pp.maxSampleRetries)
            if (j >= 0) {
              val vi = vLocal(i); val vj = vLocal(j)
              touched.add(i); touched.add(j)
              var x = 0.0
              var k = 0
              while (k < d) { x += u(k) * (vi(k) - vj(k)); k += 1 }
              val c = sigmoidNeg(x)
              val rs = if (pp.refCompatRegSign) 1.0 else -1.0
              k = 0
              while (k < d) {
                val gu = c * (vi(k) - vj(k)) + rs * pp.reg * u(k)
                val gi = c * u(k) + rs * pp.reg * vi(k)
                val gj = -c * u(k) + rs * pp.reg * vj(k)
                u(k) += pp.lr * gu
                vi(k) += pp.lr * gi
                vj(k) += pp.lr * gj
                k += 1
              }
            }
          }
          st.copy(u = u)
        }.toArray
        val deltas = touched.iterator.map { i =>
          val dv = new Array[Double](pp.rank)
          var k = 0
          while (k < pp.rank) { dv(k) = vLocal(i)(k) - bcV.value(i)(k); k += 1 }
          i -> dv
        }.toArray
        Iterator.single(EpochOut(out, deltas))
      }.persist()
      epochOut.count()

      // only the (numItems x rank) delta matrix crosses to the driver
      val mergedDeltas = new mutable.HashMap[Int, Array[Double]]
      epochOut.flatMap(_.deltas.toIndexedSeq).rdd
        .reduceByKey { (a, b) =>
          val s = a.clone(); var k = 0
          while (k < s.length) { s(k) += b(k); k += 1 }; s
        }.collect()
        .foreach { case (i, dv) => mergedDeltas(i) = dv }
      itemF = itemF.zipWithIndex.map { case (v, i) =>
        mergedDeltas.get(i) match {
          case Some(dv) => Array.tabulate(p.rank)(k => v(k) + dv(k))
          case None => v
        }
      }
      // localCheckpoint truncates lineage (plan grows by one layer per
      // epoch otherwise) and IS the materialization — persist() before it
      // would cache the pre-checkpoint plan, which no later unpersist on the
      // checkpointed frame can release
      users = epochOut.flatMap(_.users.toIndexedSeq)
        .repartition(nPart, col("user")).localCheckpoint()
      epochOut.unpersist()
      bcV.destroy() // per-epoch; cdf/genres stay for the whole run

      // epoch observability (reference prac_2.py:117-139): the max
      // item-factor move is free from the merged deltas; P/R@k and
      // snapshots build frames from the still-distributed user states
      val it = epoch + 1
      def userDf = users.map(st => (st.user, st.u.toSeq)).toDF("id", "features")
      def itemDf = itemF.zipWithIndex.map { case (f, i) => (i, f.toSeq) }
        .toSeq.toDF("id", "features")
      val maxItemDelta = mergedDeltas.valuesIterator
        .flatMap(_.iterator.map(math.abs)).foldLeft(0.0)(math.max)
      val (pk, rk) =
        if (trace.computeMetrics) {
          val scored = userDf.select(col("id").as("user"), col("features").as("u"))
            .crossJoin(broadcast(itemDf.select(col("id").as("item"), col("features").as("v"))))
            .select(col("user"), col("item"),
              graft.ops.VectorOps.dot(col("u"), col("v")).as("score"))
          val r = Metrics.precisionRecallAtK(scored,
            positives.select(col(userCol).as("user"), col(itemCol).as("item")),
            "user", "item", "score", trace.metricK).head()
          (r.getDouble(0), r.getDouble(1))
        } else (Double.NaN, Double.NaN)
      val st = Trace.EpochStats(it, pk, rk, maxItemDelta)
      epochHist += st
      trace.onEpoch(st)
      trace.snapshotDir.foreach { dir =>
        if (it % trace.snapshotEvery == 0)
          Trace.snapshotFactors(dir, s"epoch_$it", userDf, itemDf)
      }
    }
    // warm-seed broadcast outlives the first materialization only because
    // a recomputed lost block would still read it through the lineage
    bcCdf.destroy(); bcGenres.destroy(); bcWarmU.foreach(_.destroy())
    trace.snapshotDir.foreach { dir =>
      Trace.snapshotFactors(dir, "final",
        users.map(st => (st.user, st.u.toSeq)).toDF("id", "features"),
        itemF.zipWithIndex.map { case (f, i) => (i, f.toSeq) }.toSeq.toDF("id", "features"))
      Trace.writeBprHistory(spark, dir, epochHist.toSeq)
    }

    val uf = users.collect().map(st => st.user -> st.u).toMap
    users.unpersist()
    ModelArrays(uf, itemF)
  }
}
