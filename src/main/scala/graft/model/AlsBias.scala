package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.linalg.Linalg
import graft.ops.{Aggregators, VectorOps}

/** Custom alternating-least-squares trainer WITH per-entity bias terms —
  * the reference's core model `r̂(m,n) = uₘ·vₙ + b_m + b_n`
  * (/root/reference/explicit_ratings/prac_1.py:54-140), which MLlib ALS
  * cannot express (no bias terms).
  *
  * Spark-first design (SURVEY.md §7.4 option (a)): each half-sweep is ONE
  * distributed aggregation job —
  *   ratings ⋈ otherFactors ⋈ selfFactors
  *     → groupBy(entity).agg(n, Σresid, Σ(r−b_other)v, Σv, Σvvᵀ)
  *     → per-entity d×d Cholesky solve in a map (d ≈ 12).
  * The Gramian/vector sums use custom typed Aggregators with primitive-array
  * buffers, so Spark partial-aggregates map-side and the shuffle carries one
  * packed buffer per (entity, partition) — the same data movement as MLlib's
  * InBlock/OutBlock layout, without hand-rolled block management.
  *
  * Bias update (reference semantics, user side):
  *   b_m = λ·Σ(r − u·v − b_n) / (α + λ·n_m)     [prac_1.py:68-77]
  * then the trait solve uses the NEW bias:
  *   (λ·Σvvᵀ + τI) u = λ·Σ(r − b_n − b_m_new)·v  [prac_1.py:79-93]
  * which we rewrite as λ(Σ(r−b_n)v − b_m_new·Σv) so one aggregation pass
  * suffices. Quirk Q1 (movie-bias overwrite bug, prac_1.py:111) is corrected
  * to the summed form by default, as recorded in SURVEY.md §2.12.
  *
  * Within a half-sweep all entities read the pre-sweep factors of the other
  * side (block-Jacobi) — identical to MLlib ALS and the reference's own
  * multiprocessing variant (SURVEY.md Q4).
  */
object AlsBias {

  /** `strictQ1Bias` reproduces reference quirk Q1 (SURVEY §2.12): the movie
    * loop OVERWRITES the bias accumulator, so only the LAST rating — the
    * max other-id row in the reference's (movieId, userId)-sorted CSR —
    * contributes to the bias numerator. Default false = corrected summed
    * form. Apply only to the item-side sweep, as the reference does. */
  /** `biasOnly` reproduces the reference's bias-only model
    * (/root/reference/explicit_ratings/prac_1_bias_only.py): factors start
    * at zero and STAY zero (the ridge solve of a zero Gramian with a zero
    * RHS is zero), so training alternates pure bias updates. */
  /** `broadcastEntities`: when BOTH sides' entity counts are at or below
    * this, the training loop pre-partitions the ratings by each sweep's
    * entity key and broadcasts the factor frames into the sweep joins —
    * the half-sweep then runs with ZERO per-sweep exchange (the
    * partial+final aggregation reuses the ratings' hash partitioning;
    * MLlib's InBlock layout expressed declaratively). Above the threshold
    * the plain shuffle joins run — no catalog-size cliff, the
    * `broadcastItems` two-mode idiom. 10⁶ entities ≈ a 160 MB broadcast
    * at rank 12 — fine on any real executor; size down for tiny ones. */
  final case class Params(rank: Int = 12, lambda: Double = 0.1, tau: Double = 0.01,
                          alpha: Double = 0.01, maxIter: Int = 20, tol: Double = 0.05,
                          seed: Long = 42L, strictQ1Bias: Boolean = false,
                          biasOnly: Boolean = false,
                          broadcastEntities: Long = 1000000L)

  final case class Model(userFactors: DataFrame, itemFactors: DataFrame) {
    /** r̂ = u·v + b_u + b_i over a ratings frame with (userCol, itemCol). */
    def predict(ratings: DataFrame, userCol: String, itemCol: String): DataFrame =
      ratings
        .join(userFactors.select(col("id").as(userCol), col("features").as("__u"),
          col("bias").as("__bu")), Seq(userCol))
        .join(itemFactors.select(col("id").as(itemCol), col("features").as("__v"),
          col("bias").as("__bv")), Seq(itemCol))
        .withColumn("prediction",
          VectorOps.dot(col("__u"), col("__v")) + col("__bu") + col("__bv"))
        .drop("__u", "__v", "__bu", "__bv")
  }

  /** Deterministic N(0, scale²) init via Box-Muller over xxhash64 uniforms —
    * reproducible on any cluster/partitioning, no RNG state (reference:
    * np.random.normal(0, 5/√d), prac_1.py:41-48, unseeded there; SURVEY Q3
    * records scale 5/√d as the default). */
  def gaussianInitCol(idCol: Column, rank: Int, scale: Double, seed: Long): Column =
    transform(sequence(lit(0), lit(rank - 1)), i => {
      val u1 = (pmod(xxhash64(idCol, i * 2, lit(seed)), lit(1000000L)).cast("double") + 0.5) / 1000000.0
      val u2 = (pmod(xxhash64(idCol, i * 2 + 1, lit(seed)), lit(1000000L)).cast("double") + 0.5) / 1000000.0
      sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2) * scale
    })

  /** Initial factor frame for the distinct ids of `ratings(idCol)`. */
  def initFactors(ratings: DataFrame, idCol: String, p: Params, sideSeed: Long): DataFrame = {
    val features =
      if (p.biasOnly) transform(sequence(lit(0), lit(p.rank - 1)), _ => lit(0.0))
      else gaussianInitCol(col("id"), p.rank, 5.0 / math.sqrt(p.rank), p.seed + sideSeed)
    ratings.select(col(idCol).as("id")).distinct()
      .withColumn("features", features)
      .withColumn("bias", lit(0.0))
  }

  /** One half-sweep: update `selfFactors` (keyed by selfCol) given fixed
    * `otherFactors` (keyed by otherCol). Returns the new factor frame with
    * the same (id, features, bias) schema; entities with no ratings get
    * (bias 0, features 0) — the reference's closed-form result for an empty
    * rating set. */
  def halfSweep(ratings: DataFrame, selfFactors: DataFrame, otherFactors: DataFrame,
                selfCol: String, otherCol: String, ratingCol: String,
                p: Params, broadcastFactors: Boolean = false): DataFrame = {
    val rank = p.rank
    val vecSum = udaf(new Aggregators.VectorSum(rank))
    val gramSum = udaf(new Aggregators.GramianSum(rank))

    // broadcastFactors (the training loop sets it below the entity
    // threshold): both factor joins broadcast, so ratings KEEP their
    // partitioning — pre-partitioned by selfCol, the groupBy below then
    // needs no exchange at all and the sweep is shuffle-free (measured:
    // the 25M-rating sf-1× sweep spilled 4.3 GB through sort-merge joins
    // at 32 partitions; broadcast + co-location spills zero)
    val of = otherFactors.select(col("id").as("oid"), col("features").as("v"),
      col("bias").as("bo"))
    val sf = selfFactors.select(col("id").as("sid"), col("features").as("u"))
    val joined = ratings
      .select(col(selfCol).as("sid"), col(otherCol).as("oid"), col(ratingCol).as("r"))
      .join(if (broadcastFactors) broadcast(of) else of, Seq("oid"))
      .join(if (broadcastFactors) broadcast(sf) else sf, Seq("sid"))

    // quirk Q1 compat: "last" rating = the max other-id row (the reference's
    // CSR is sorted by (selfId, otherId), so its overwrite keeps that row)
    val biasNumerator =
      if (p.strictQ1Bias) max_by(col("resid"), col("oid")) else sum(col("resid"))
    val aggd = joined
      .withColumn("resid", col("r") - VectorOps.dot(col("u"), col("v")) - col("bo"))
      .withColumn("rv", transform(col("v"), x => (col("r") - col("bo")) * x))
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n"), biasNumerator.as("sresid"),
        vecSum(col("rv")).as("srv"), vecSum(col("v")).as("sv"),
        gramSum(col("v")).as("gram"))

    val lambda = p.lambda; val tau = p.tau; val alpha = p.alpha
    val solve = udf((n: Long, sresid: Double, srv: Seq[Double], sv: Seq[Double],
                     gram: Seq[Double]) => {
      val newBias = lambda * sresid / (alpha + lambda * n)
      val rhs = srv.indices.map(i => srv(i) - newBias * sv(i)).toArray
      val feats = Linalg.ridgeSolve(gram, rhs, lambda, tau)
      (newBias, feats.toSeq)
    })

    val updated = aggd.select(col("sid").as("id"),
      solve(col("n"), col("sresid"), col("srv"), col("sv"), col("gram")).as("ub"))
      .select(col("id"), col("ub._2").as("features"), col("ub._1").as("bias"))

    // entities with zero ratings this sweep: closed form -> zero bias/vector.
    // Under broadcastFactors the (entity-sized) updated frame broadcasts so
    // the alignment join adds no exchange either — the sweep stays
    // exchange-free end to end (PlanShapeSpec pins it)
    val updJ = if (broadcastFactors) broadcast(updated) else updated
    selfFactors.select(col("id")).join(updJ, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("features"),
          transform(sequence(lit(0), lit(rank - 1)), _ => lit(0.0))).as("features"),
        coalesce(col("bias"), lit(0.0)).as("bias"))
  }

  /** max |Δparam| between two factor frames (convergence test L6,
    * /root/reference/explicit_ratings/prac_1.py:179-187). */
  def maxDelta(oldF: DataFrame, newF: DataFrame): Double = {
    val j = oldF.select(col("id"), col("features").as("f0"), col("bias").as("b0"))
      .join(newF.select(col("id"), col("features").as("f1"), col("bias").as("b1")), Seq("id"))
      .select(greatest(
        abs(col("b1") - col("b0")),
        array_max(zip_with(col("f0"), col("f1"), (a, b) => abs(b - a)))).as("d"))
    val row = j.agg(max(col("d"))).head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** Full alternating training loop. Factor frames are truncated with an
    * eager localCheckpoint per sweep, so lineage stays O(1) across
    * iterations and the checkpoint blocks ARE the materialization (an
    * additional persist() would cache the pre-checkpoint plan, which no
    * unpersist on the checkpointed frame can ever free — a leak). Blocks of
    * superseded sweeps are reclaimed by the ContextCleaner once the frames
    * go out of scope. At cluster scale: a reliable checkpoint dir. */
  def train(ratings: DataFrame, userCol: String, itemCol: String, ratingCol: String,
            p: Params = Params()): Model =
    trainTraced(ratings, userCol, itemCol, ratingCol, p,
      Trace.Config(computeMetrics = false))._1

  /** Training loop with the reference's per-iteration observability
    * (LL + RMSE each sweep, prac_1.py:141-161; parameter snapshots every
    * `snapshotEvery` sweeps plus a final set, prac_1.py:163-204): returns
    * the model AND the (iter, LL, RMSE, maxDelta) history, invoking
    * `trace.onIter` live. */
  def trainTraced(ratings: DataFrame, userCol: String, itemCol: String,
                  ratingCol: String, p: Params,
                  trace: Trace.Config): (Model, Seq[Trace.IterStats]) = {
    var users = initFactors(ratings, userCol, p, 1L)
      .localCheckpoint()
    var items = initFactors(ratings, itemCol, p, 2L)
      .localCheckpoint()
    // two bounded 1-row reads off the checkpointed factor frames pick the
    // sweep plan: at or below the entity threshold, ratings pre-partition
    // by each sweep's key ONCE (paid here, amortized over every sweep)
    // and the factor joins broadcast — each half-sweep then runs with
    // zero exchange; above it, the plain shuffle-join plan (see Params)
    val bcast = math.max(users.count(), items.count()) <= p.broadcastEntities
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val byUser = if (bcast) ratings.repartition(col(userCol)).persist(lvl)
      else ratings
    val byItem = if (bcast) ratings.repartition(col(itemCol)).persist(lvl)
      else ratings
    // The typed Gramian/vector Aggregators plan as ObjectHashAggregate,
    // whose sort-based fallback triggers at 128 DISTINCT KEYS by default
    // — three orders of magnitude below any real entity count, so every
    // partial aggregation was silently sorting the full joined frame
    // (measured: 23 GB of external-sort spill on the 25M-rating corpus).
    // Under the co-located plan the per-task key count is bounded by
    // construction (nEntities / partitions, ~1 KB packed buffer each), so
    // raise the fallback for the duration of training and restore after.
    val ss = ratings.sparkSession
    val fbKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val oldFb = try Some(ss.conf.get(fbKey)) catch { case _: Exception => None }
    ss.conf.set(fbKey, "4194304")
    try {
    val hist = scala.collection.mutable.ArrayBuffer.empty[Trace.IterStats]
    var iter = 0
    var delta = Double.MaxValue
    while (iter < p.maxIter && delta > p.tol) {
      // Q1 is a movie-loop-only quirk: user sweep always sums
      val newUsers = halfSweep(byUser, users, items, userCol, itemCol, ratingCol,
          p.copy(strictQ1Bias = false), broadcastFactors = bcast)
        .localCheckpoint()
      val newItems = halfSweep(byItem, items, newUsers, itemCol, userCol, ratingCol,
          p, broadcastFactors = bcast)
        .localCheckpoint()
      delta = math.max(maxDelta(users, newUsers), maxDelta(items, newItems))
      users = newUsers; items = newItems
      iter += 1
      val (ll, rm) =
        if (trace.computeMetrics) {
          val m = Model(users, items)
          (Metrics.regLogLik(m, ratings, userCol, itemCol, ratingCol,
            p.lambda, p.tau, p.alpha),
           Metrics.rmse(m.predict(ratings, userCol, itemCol), ratingCol, "prediction"))
        } else (Double.NaN, Double.NaN)
      val st = Trace.IterStats(iter, ll, rm, delta)
      hist += st
      trace.onIter(st)
      trace.snapshotDir.foreach { dir =>
        if (iter % trace.snapshotEvery == 0)
          Trace.snapshotFactors(dir, s"iter_$iter", users, items)
      }
    }
    trace.snapshotDir.foreach { dir =>
      Trace.snapshotFactors(dir, "final", users, items)
      Trace.writeHistory(ratings.sparkSession, dir, hist.toSeq)
    }
    // the returned factor frames are checkpointed — the pre-partitioned
    // ratings copies are training-internal and safe to release here
    if (bcast) { byUser.unpersist(blocking = false); byItem.unpersist(blocking = false) }
    (Model(users, items), hist.toSeq)
    } finally {
      oldFb match {
        case Some(v) => ss.conf.set(fbKey, v)
        case None => ss.conf.unset(fbKey)
      }
    }
  }
}
