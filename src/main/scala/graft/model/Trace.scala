package graft.model

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Per-iteration convergence trace + durable snapshot cadence for the
  * trainers — the reference's primary correctness tool: it prints LL and
  * RMSE every iteration and saves parameters every 5 iterations plus a
  * final set (/root/reference/explicit_ratings/prac_1.py:141-204); the BPR
  * script logs precision/recall@k per epoch and snapshots on the same
  * cadence (/root/reference/implicit_feedback/prac_2.py:117-139).
  *
  * Snapshots are plain parquet of the factor frames (schema
  * (id, features, bias) / (id, features)) — durable, resumable, and
  * readable by any engine, unlike the lineage-only localCheckpoints the
  * training loops use internally. At cluster scale the directory is any
  * shared filesystem path.
  */
object Trace {

  /** One row of the ALS convergence trace (LL/RMSE are NaN when
    * `computeMetrics` is off — maxDelta is always tracked). */
  final case class IterStats(iter: Int, logLik: Double, rmse: Double, maxDelta: Double)

  /** ALS observer config. `computeMetrics` prices the reference's
    * per-sweep LL + RMSE evaluations (two extra passes over the ratings per
    * sweep — the reference always pays them; the plain `train` entry points
    * don't); `onIter` is the live callback (the reference prints);
    * `snapshotDir`/`snapshotEvery` mirror the every-5-iterations parameter
    * dump, plus a `final` snapshot and the metric history at the end. */
  final case class Config(computeMetrics: Boolean = true,
                          onIter: IterStats => Unit = _ => (),
                          snapshotDir: Option[String] = None,
                          snapshotEvery: Int = 5,
                          onStart: () => Unit = () => ())

  /** One row of the BPR epoch trace. P/R are NaN unless `computeMetrics`;
    * maxItemDelta (the largest item-factor move this epoch) is free — it
    * falls out of the epoch's delta merge. */
  final case class EpochStats(epoch: Int, precisionAtK: Double, recallAtK: Double,
                              maxItemDelta: Double)

  /** BPR observer config; `metricK` is the reference's eval cut-off
    * (prac_2.py uses the {40,50,60} grid — one k suffices for the trace).
    * `metricMaxUsers` switches the per-epoch eval to the user-sampled
    * [[Metrics.precisionRecallAtKSampled]] — at scale the exact eval's
    * users × items product costs more than the epoch it measures. */
  final case class BprConfig(computeMetrics: Boolean = false,
                             metricK: Int = 40,
                             metricMaxUsers: Option[Int] = None,
                             onEpoch: EpochStats => Unit = _ => (),
                             snapshotDir: Option[String] = None,
                             snapshotEvery: Int = 5)

  private[model] def snapshotFactors(dir: String, tag: String,
                                     users: DataFrame, items: DataFrame): Unit = {
    users.write.mode(SaveMode.Overwrite).parquet(s"$dir/$tag/user_factors")
    items.write.mode(SaveMode.Overwrite).parquet(s"$dir/$tag/item_factors")
  }

  private[model] def snapshotGenreFactors(spark: SparkSession, dir: String, tag: String,
                                          genreF: Map[Int, Array[Double]]): Unit = {
    import spark.implicits._
    genreF.toSeq.map { case (g, f) => (g, f.toSeq) }.toDF("genre", "features")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$tag/genre_factors")
  }

  private[model] def writeHistory(spark: SparkSession, dir: String,
                                  hist: Seq[IterStats]): Unit = {
    import spark.implicits._
    hist.toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/trace")
  }

  private[model] def writeBprHistory(spark: SparkSession, dir: String,
                                     hist: Seq[EpochStats]): Unit = {
    import spark.implicits._
    hist.toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/trace")
  }

  /** Read an ALS snapshot back as a model (round-trip of the parquet dump;
    * `tag` is `iter_N` or `final`). Feed the result straight to
    * `AlsBias.trainTraced(init = Some(loaded))` for the reference's
    * resume-from-disk flow (explicit_ratings/ab_test.py:73-85): load
    * checkpointed parameters, retrain on the new corpus warm. */
  def loadModel(spark: SparkSession, dir: String, tag: String): AlsBias.Model =
    AlsBias.Model(spark.read.parquet(s"$dir/$tag/user_factors"),
      spark.read.parquet(s"$dir/$tag/item_factors"))

  /** Genre-coupled variant of [[loadModel]]: the factor frames plus the
    * genre matrix written by the AlsGenre trainer's snapshots. The genre
    * map is genre-cardinality-sized (tens of rows) — the collect is the
    * trainer's own driver-side contract for it. */
  def loadGenreModel(spark: SparkSession, dir: String, tag: String): AlsGenre.Model = {
    val genreF = spark.read.parquet(s"$dir/$tag/genre_factors")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    AlsGenre.Model(spark.read.parquet(s"$dir/$tag/user_factors"),
      spark.read.parquet(s"$dir/$tag/item_factors"), genreF)
  }

  /** Implicit-trainer snapshot loader: the distributed frame contract for
    * `DsgdBpr.trainFactors(init = Some(loaded))` — resume the BPR epoch
    * schedule from a `factorsDir`/snapshot dump without anything
    * factor-sized touching the driver (the reference reloads its BPR
    * checkpoints the same way, implicit_feedback/prac_2_results.py:22-23). */
  def loadFactorFrames(spark: SparkSession, dir: String, tag: String): DsgdBpr.FactorFrames =
    DsgdBpr.FactorFrames(spark.read.parquet(s"$dir/$tag/user_factors"),
      spark.read.parquet(s"$dir/$tag/item_factors"))

  /** Max-aggregating accumulator: lets distributed training strata report
    * their local max factor delta with ZERO extra jobs (piggybacks on the
    * materializing action). Safe under task re-execution — max is
    * idempotent for repeated values, unlike a sum. */
  final class MaxAccumulator extends org.apache.spark.util.AccumulatorV2[Double, Double] {
    private var _max: Double = Double.NegativeInfinity
    def isZero: Boolean = _max == Double.NegativeInfinity
    def copy(): MaxAccumulator = { val a = new MaxAccumulator; a._max = _max; a }
    def reset(): Unit = _max = Double.NegativeInfinity
    def add(v: Double): Unit = if (v > _max) _max = v
    def merge(other: org.apache.spark.util.AccumulatorV2[Double, Double]): Unit =
      add(other.value)
    def value: Double = if (isZero) 0.0 else _max
  }
}
