package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Relational, VectorOps}

/** Training/eval metrics as single distributed aggregation jobs
  * (SURVEY.md L4/L5/L15). */
object Metrics {

  /** RMSE over a predictions frame
    * (/root/reference/explicit_ratings/functions.py:250-280). */
  def rmse(predictions: DataFrame, ratingCol: String, predCol: String): Double =
    predictions
      .agg(sqrt(avg(pow(col(predCol) - col(ratingCol), 2))))
      .head().getDouble(0)

  /** Regularized log-likelihood (/root/reference/explicit_ratings/functions.py:49-116):
    *   −(α/2)(‖b_u‖²+‖b_v‖²) − (τ/2)(‖U‖²_F+‖V‖²_F) − (λ/2)·Σ(r−r̂)²
    * Three scalar aggregations (factor norms are tiny frames; the error term
    * is one pass over ratings). */
  def regLogLik(model: AlsBias.Model, ratings: DataFrame,
                userCol: String, itemCol: String, ratingCol: String,
                lambda: Double, tau: Double, alpha: Double): Double = {
    def factorTerms(f: DataFrame): (Double, Double) = {
      val r = f.agg(
        sum(VectorOps.normSq(col("features"))).as("fro"),
        sum(col("bias") * col("bias")).as("b2")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (uFro, uB2) = factorTerms(model.userFactors)
    val (vFro, vB2) = factorTerms(model.itemFactors)
    val sqErr = model.predict(ratings, userCol, itemCol)
      .agg(sum(pow(col("prediction") - col(ratingCol), 2))).head().getDouble(0)
    -(alpha / 2) * (uB2 + vB2) - (tau / 2) * (uFro + vFro) - (lambda / 2) * sqErr
  }

  /** Precision@k and Recall@k (/root/reference/implicit_feedback/functions.py:212-246):
    * top-k of `scored` per user (deterministic tie-break on item id), TP
    * counted via an inner join against the positives, mean over users.
    * Users whose top-k hits nothing still count (TP=0) via the left join. */
  def precisionRecallAtK(scored: DataFrame, positives: DataFrame,
                         userCol: String, itemCol: String, scoreCol: String,
                         k: Int): DataFrame = {
    val topk = Relational.topKPerGroup(scored, Seq(col(userCol)),
      Seq(col(scoreCol).desc, col(itemCol).asc), k)
    val tp = topk.join(positives.select(col(userCol), col(itemCol)),
        Seq(userCol, itemCol), "inner")
      .groupBy(col(userCol)).agg(count(lit(1)).as("tp"))
    val posCount = positives.groupBy(col(userCol)).agg(count(lit(1)).as("npos"))
    posCount
      .join(tp, Seq(userCol), "left")
      .withColumn("tp", coalesce(col("tp"), lit(0L)))
      .select(
        avg(col("tp") / lit(k.toDouble)).as(s"precision_at_$k"),
        avg(col("tp") / col("npos")).as(s"recall_at_$k"))
  }

  /** User-sampled P/R@k — the at-scale eval. [[precisionRecallAtK]] is
    * exact but consumes a caller-materialized users × items scored
    * product: faithful to the reference grid (implicit_feedback/
    * prac_2.py:124-138) and right at fixture scale, but the product is
    * the 100×-scale cost. This variant OWNS the scoring: it draws a
    * deterministic `maxUsers`-user sample (lowest xxhash64(seed, user) —
    * stable under any partitioning, a TakeOrdered over user ids only),
    * cross-scores ONLY the sampled users against the catalog (the plan's
    * one product is maxUsers × N by construction — never M × N), and
    * evaluates P/R@k over the sample. Estimates the exact metric as a
    * uniform-over-users subsample mean; maxUsers >= |users| reproduces
    * the exact numbers bit-for-bit. */
  def precisionRecallAtKSampled(userFactors: DataFrame, itemFactors: DataFrame,
                                positives: DataFrame, userCol: String,
                                itemCol: String, k: Int, maxUsers: Int,
                                seed: Long = 42L): DataFrame = {
    require(maxUsers >= 1, "maxUsers must be >= 1")
    val sampled = positives.select(col(userCol)).distinct()
      .orderBy(xxhash64(lit(seed), col(userCol)), col(userCol))
      .limit(maxUsers)
    val su = userFactors.join(
      broadcast(sampled.withColumnRenamed(userCol, "id")), Seq("id"), "left_semi")
    val scored = broadcast(su.select(col("id").as(userCol), col("features").as("u")))
      .crossJoin(itemFactors.select(col("id").as(itemCol), col("features").as("v")))
      .select(col(userCol), col(itemCol),
        VectorOps.dot(col("u"), col("v")).as("score"))
    val posSampled = positives.join(broadcast(sampled), Seq(userCol), "left_semi")
    precisionRecallAtK(scored, posSampled, userCol, itemCol, "score", k)
  }
}
