package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.linalg.Linalg
import graft.ops.{Aggregators, VectorOps}

/** Genre-coupled ALS (/root/reference/explicit_ratings/incl_genre.py): movie
  * vectors get a prior mean assembled from shared genre feature vectors,
  *   (λ·Σuuᵀ + τI) v = λ·Σ(r−b_m−b_n)u + (τ/√c)·Σ_{g∈genres} F[g]
  * (incl_genre.py:185-193), and the 20×d genre matrix F is refit each sweep
  * from the movie vectors (incl_genre.py:199-219).
  *
  * Spark shape: user sweep reuses AlsBias.halfSweep unchanged; the movie
  * sweep adds one broadcast map (F is 20×d — driver-solved) and one extra
  * term in the per-movie solve; the F update is an explode(movie→genre) +
  * grouped vector aggregation. F is updated Jacobi-style across genres per
  * sweep (the reference iterates genres sequentially AND carries an
  * accumulator across genres — quirk Q9, recorded in SURVEY §2.12 spirit:
  * numerator/denominator are never reset between genres, incl_genre.py:199-219.
  * We implement the intended per-genre closed form.)
  */
object AlsGenre {

  final case class Params(rank: Int = 12, lambda: Double = 0.1, tau: Double = 0.01,
                          alpha: Double = 0.01, beta: Double = 0.01,
                          maxIter: Int = 20, tol: Double = 0.05, seed: Long = 42L,
                          broadcastEntities: Long = 1000000L)

  final case class Model(userFactors: DataFrame, itemFactors: DataFrame,
                         genreFactors: Map[Int, Array[Double]])

  private def toBiasParams(p: Params) =
    AlsBias.Params(p.rank, p.lambda, p.tau, p.alpha, p.maxIter, p.tol, p.seed,
      broadcastEntities = p.broadcastEntities)

  /** Movie half-sweep with the genre prior. `movieGenres` carries
    * (id, genre_values ARRAY<INT>, genre_count INT); `genreF` is the current
    * 20×d feature matrix (broadcast as a literal map — driver-held, tiny). */
  def movieSweepWithPrior(ratings: DataFrame, itemFactors: DataFrame,
                          userFactors: DataFrame, movieGenres: DataFrame,
                          itemCol: String, userCol: String, ratingCol: String,
                          genreF: Map[Int, Array[Double]], p: Params,
                          broadcastFactors: Boolean = false): DataFrame = {
    val rank = p.rank
    val vecSum = udaf(new Aggregators.VectorSum(rank))
    val gramSum = udaf(new Aggregators.GramianSum(rank))

    // broadcastFactors: same zero-exchange sweep plan as
    // [[AlsBias.halfSweep]] — factor joins broadcast, item-partitioned
    // ratings keep their partitioning into the groupBy
    val uf = userFactors.select(col("id").as("oid"), col("features").as("v"),
      col("bias").as("bo"))
    val sf = itemFactors.select(col("id").as("sid"), col("features").as("u"))
    val joined = ratings
      .select(col(itemCol).as("sid"), col(userCol).as("oid"), col(ratingCol).as("r"))
      .join(if (broadcastFactors) broadcast(uf) else uf, Seq("oid"))
      .join(if (broadcastFactors) broadcast(sf) else sf, Seq("sid"))

    val aggd = joined
      .withColumn("resid", col("r") - VectorOps.dot(col("u"), col("v")) - col("bo"))
      .withColumn("rv", transform(col("v"), x => (col("r") - col("bo")) * x))
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n"), sum(col("resid")).as("sresid"),
        vecSum(col("rv")).as("srv"), vecSum(col("v")).as("sv"),
        gramSum(col("v")).as("gram"))
      .join({
        val mg = movieGenres.select(col("id").as("sid"), col("genre_values"),
          col("genre_count"))
        if (broadcastFactors) broadcast(mg) else mg // genre dim is item-sized
      }, Seq("sid"), "left")

    val lambda = p.lambda; val tau = p.tau; val alpha = p.alpha
    val fMap = genreF // serialized into the UDF closure (20×d doubles)
    val solve = udf((n: Long, sresid: Double, srv: Seq[Double], sv: Seq[Double],
                     gram: Seq[Double], genres: Seq[Int], genreCount: Int) => {
      val newBias = lambda * sresid / (alpha + lambda * n)
      val prior = new Array[Double](rank)
      if (genres != null && genreCount > 0) {
        val s = tau / math.sqrt(genreCount.toDouble)
        genres.foreach { g =>
          val f = fMap.getOrElse(g, new Array[Double](rank))
          var k = 0; while (k < rank) { prior(k) += s * f(k); k += 1 }
        }
      }
      val rhs = srv.indices.map(i => srv(i) - newBias * sv(i)).toArray
      val feats = Linalg.ridgeSolveWithPrior(gram, rhs, prior, lambda, tau)
      (newBias, feats.toSeq)
    })

    val updated = aggd.select(col("sid").as("id"),
      solve(col("n"), col("sresid"), col("srv"), col("sv"), col("gram"),
        col("genre_values"), coalesce(col("genre_count"), lit(0))).as("ub"))
      .select(col("id"), col("ub._2").as("features"), col("ub._1").as("bias"))

    val updJ = if (broadcastFactors) broadcast(updated) else updated
    itemFactors.select(col("id")).join(updJ, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("features"),
          transform(sequence(lit(0), lit(rank - 1)), _ => lit(0.0))).as("features"),
        coalesce(col("bias"), lit(0.0)).as("bias"))
  }

  /** Refit the genre features from the movie vectors (intended closed form
    * of incl_genre.py:199-219, Jacobi across genres):
    *   F[g] = τ·Σ_{m∋g}(v_m − Σ_{g'≠g}F[g']/√c_m)/√c_m / (β + τ·Σ_{m∋g} 1/c_m)
    * One explode + grouped vector aggregation; the 20-row result is collected
    * to the driver (it is broadcast back next sweep). */
  def updateGenreFactors(itemFactors: DataFrame, movieGenres: DataFrame,
                         genreF: Map[Int, Array[Double]], p: Params): Map[Int, Array[Double]] = {
    val rank = p.rank
    val vecSum = udaf(new Aggregators.VectorSum(rank))
    val fMap = genreF
    val numerTerm = udf((v: Seq[Double], genres: Seq[Int], genreCount: Int, g: Int) => {
      val c = math.sqrt(genreCount.toDouble)
      val out = new Array[Double](rank)
      var k = 0
      while (k < rank) { out(k) = v(k); k += 1 }
      genres.filter(_ != g).foreach { g2 =>
        val f = fMap.getOrElse(g2, new Array[Double](rank))
        k = 0; while (k < rank) { out(k) -= f(k) / c; k += 1 }
      }
      k = 0; while (k < rank) { out(k) /= c; k += 1 }
      out.toSeq
    })
    val exploded = movieGenres
      .join(itemFactors.select(col("id"), col("features")), Seq("id"))
      .select(col("id"), col("features"), col("genre_values"), col("genre_count"),
        explode(col("genre_values")).as("g"))
    val aggd = exploded
      .withColumn("term", numerTerm(col("features"), col("genre_values"),
        col("genre_count"), col("g")))
      .groupBy(col("g"))
      .agg(vecSum(col("term")).as("numer"),
        sum(lit(1.0) / col("genre_count")).as("denom"))
      .collect()
    aggd.map { r =>
      val g = r.getInt(0)
      val numer = r.getSeq[Double](1)
      val denom = p.beta + p.tau * r.getDouble(2)
      g -> numer.map(x => p.tau * x / denom).toArray
    }.toMap
  }

  /** Full alternating loop: user sweep (shared with AlsBias) → movie sweep
    * with genre prior → genre feature refit. */
  def train(ratings: DataFrame, movieGenres: DataFrame,
            userCol: String, itemCol: String, ratingCol: String,
            p: Params = Params()): Model =
    trainTraced(ratings, movieGenres, userCol, itemCol, ratingCol, p,
      Trace.Config(computeMetrics = false))._1

  /** [[train]] with the reference's per-iteration observability (LL + RMSE
    * each sweep, parameter snapshots every `snapshotEvery` sweeps + final —
    * prac_1.py:141-204 behavior; genre factors snapshot alongside the
    * user/item frames). The LL is the base bias-model likelihood
    * (Metrics.regLogLik) — the convergence signal the reference plots. */
  def trainTraced(ratings: DataFrame, movieGenres: DataFrame,
                  userCol: String, itemCol: String, ratingCol: String,
                  p: Params, trace: Trace.Config): (Model, Seq[Trace.IterStats]) = {
    val bp = toBiasParams(p)
    var users = AlsBias.initFactors(ratings, userCol, bp, 1L)
      .localCheckpoint()
    var items = AlsBias.initFactors(ratings, itemCol, bp, 2L)
      .localCheckpoint()
    val rng = new java.util.Random(p.seed)
    var genreF: Map[Int, Array[Double]] =
      (0 until 20).map(g => g -> Array.fill(p.rank)(rng.nextGaussian())).toMap
    // the AlsBias zero-exchange sweep plan, decided the same way (two
    // bounded 1-row reads; ratings pre-partitioned once per sweep key)
    val bcast = math.max(users.count(), items.count()) <= bp.broadcastEntities
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val byUser = if (bcast) ratings.repartition(col(userCol)).persist(lvl)
      else ratings
    val byItem = if (bcast) ratings.repartition(col(itemCol)).persist(lvl)
      else ratings
    // raise the ObjectHashAggregate sort-fallback for the duration of
    // training and restore after — see the AlsBias.trainTraced note (the
    // default 128-key fallback silently sorts the full joined frame)
    val ss = ratings.sparkSession
    val fbKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val oldFb = try Some(ss.conf.get(fbKey)) catch { case _: Exception => None }
    ss.conf.set(fbKey, "4194304")
    try {
    val hist = scala.collection.mutable.ArrayBuffer.empty[Trace.IterStats]
    var iter = 0
    var delta = Double.MaxValue
    while (iter < p.maxIter && delta > p.tol) {
      val newUsers = AlsBias.halfSweep(byUser, users, items, userCol, itemCol,
          ratingCol, bp, broadcastFactors = bcast)
        .localCheckpoint()
      val newItems = movieSweepWithPrior(byItem, items, newUsers, movieGenres,
        itemCol, userCol, ratingCol, genreF, p, broadcastFactors = bcast)
        .localCheckpoint()
      val newGenreF = updateGenreFactors(newItems, movieGenres, genreF, p)
      val fDelta = newGenreF.map { case (g, f) =>
        val old = genreF.getOrElse(g, new Array[Double](p.rank))
        f.indices.map(i => math.abs(f(i) - old(i))).max
      }.foldLeft(0.0)(math.max)
      delta = math.max(math.max(AlsBias.maxDelta(users, newUsers),
        AlsBias.maxDelta(items, newItems)), fDelta)
      users = newUsers; items = newItems; genreF = newGenreF
      iter += 1
      val (ll, rm) =
        if (trace.computeMetrics) {
          val m = AlsBias.Model(users, items)
          (Metrics.regLogLik(m, ratings, userCol, itemCol, ratingCol,
            p.lambda, p.tau, p.alpha),
           Metrics.rmse(m.predict(ratings, userCol, itemCol), ratingCol, "prediction"))
        } else (Double.NaN, Double.NaN)
      val st = Trace.IterStats(iter, ll, rm, delta)
      hist += st
      trace.onIter(st)
      trace.snapshotDir.foreach { dir =>
        if (iter % trace.snapshotEvery == 0) {
          Trace.snapshotFactors(dir, s"iter_$iter", users, items)
          Trace.snapshotGenreFactors(ratings.sparkSession, dir, s"iter_$iter", genreF)
        }
      }
    }
    trace.snapshotDir.foreach { dir =>
      Trace.snapshotFactors(dir, "final", users, items)
      Trace.snapshotGenreFactors(ratings.sparkSession, dir, "final", genreF)
      Trace.writeHistory(ratings.sparkSession, dir, hist.toSeq)
    }
    if (bcast) { byUser.unpersist(blocking = false); byItem.unpersist(blocking = false) }
    (Model(users, items, genreF), hist.toSeq)
    } finally {
      oldFb match {
        case Some(v) => ss.conf.set(fbKey, v)
        case None => ss.conf.unset(fbKey)
      }
    }
  }
}
