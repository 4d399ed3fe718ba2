package graft.model

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Built-in MLlib path for the bias-free model — the same math as the
  * reference's plain ALS (per-entity ridge + Cholesky,
  * /root/reference/explicit_ratings/prac_1.py with biases off): MLlib's
  * NormalEquation/CholeskyDecomposition solve identical normal equations
  * with block-partitioned factors (SURVEY.md §7.4 "built-in").
  *
  * Use this when biases/genre-coupling aren't needed: it is the
  * production-hardened scale path (In/Out blocks, checkpointing, blocked
  * shuffles). AlsBias/AlsGenre cover the reference's extended models.
  */
object AlsPlain {

  final case class Params(rank: Int = 12, regParam: Double = 0.1, maxIter: Int = 10,
                          seed: Long = 42L, implicitPrefs: Boolean = false,
                          numBlocks: Int = 10)

  def train(ratings: DataFrame, userCol: String, itemCol: String, ratingCol: String,
            p: Params = Params()): ALSModel =
    new ALS()
      .setRank(p.rank)
      .setRegParam(p.regParam)
      .setMaxIter(p.maxIter)
      .setSeed(p.seed)
      .setImplicitPrefs(p.implicitPrefs)
      .setNumUserBlocks(p.numBlocks)
      .setNumItemBlocks(p.numBlocks)
      .setUserCol(userCol)
      .setItemCol(itemCol)
      .setRatingCol(ratingCol)
      .setColdStartStrategy("drop")
      .fit(ratings)

  /** Factor frames in the engine's (id, features, bias) shape (bias 0). */
  def toFactorFrames(model: ALSModel): (DataFrame, DataFrame) = {
    def shape(df: DataFrame): DataFrame =
      df.select(col("id"),
        transform(col("features"), x => x.cast("double")).as("features"),
        lit(0.0).as("bias"))
    (shape(model.userFactors), shape(model.itemFactors))
  }
}
