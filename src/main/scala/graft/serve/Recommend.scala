package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.AlsBias
import graft.ops.{Relational, VectorOps}

/** Serving path: cold-start fold-in + full-catalog scoring + top-N
  * (SURVEY.md L7-L9), batched over ALL users as one pipeline instead of the
  * reference's per-user driver loop (/root/reference/explicit_ratings/ab_test.py:100-199).
  */
object Recommend {

  /** Cold-start fold-in (L7+L8): given rating histories of NEW users, solve
    * bias + trait vector against the frozen item factors. Implemented as one
    * AlsBias half-sweep from a zero factor state — with u=0 the bias update
    * reduces exactly to the reference's  b = λΣ(r−b_n)/(α+λ|hist|)
    * (/root/reference/explicit_ratings/functions.py:522-548) and the trait
    * solve to (λΣvvᵀ+τI)u = λΣ(r−b_n−b)v (functions.py:551-596). */
  def foldInUsers(history: DataFrame, itemFactors: DataFrame,
                  userCol: String, itemCol: String, ratingCol: String,
                  p: AlsBias.Params): DataFrame = {
    val zeroUsers = history.select(col(userCol).as("id")).distinct()
      .withColumn("features",
        transform(sequence(lit(0), lit(p.rank - 1)), _ => lit(0.0)))
      .withColumn("bias", lit(0.0))
    // Q1 is a movie-loop-only quirk: the reference's fold-in always SUMS
    // the bias numerator (functions.py:522-548), so never let a
    // strict-trained model's params leak the overwrite semantics in here
    AlsBias.halfSweep(history, zeroUsers, itemFactors,
      userCol, itemCol, ratingCol, p.copy(strictQ1Bias = false))
  }

  /** Full-catalog scoring + top-N (L9): score(u,n) = u·vₙ + damping·b_n
    * (bias damping 0.05, /root/reference/explicit_ratings/functions.py:627),
    * excluding items with fewer than `popularityFloor` ratings
    * (functions.py:643-645; floor 90 in ab_test.py), top-k per user with
    * deterministic tie-break.
    *
    * Scale shape: the user side is broadcast (queries), so scoring is a
    * narrow map over the catalog; per-user top-k runs as a bounded TopK
    * Aggregator with map-side partial aggregation — the ONLY shuffled data
    * is at most k (score, item) pairs per (user, partition), never the full
    * users × catalog product a row_number window would exchange. */
  def recommend(userFactors: DataFrame, itemFactors: DataFrame,
                itemRatingCounts: DataFrame, k: Int = 20,
                popularityFloor: Long = 90L, biasDamping: Double = 0.05): DataFrame = {
    val eligible = itemFactors
      .join(itemRatingCounts.filter(col("n_ratings") >= popularityFloor)
        .select(col("id")), Seq("id"), "left_semi")
    val scored = broadcast(userFactors.select(col("id").as("user_id"),
        col("features").as("u")))
      .crossJoin(eligible.select(col("id").as("item_id"), col("features").as("v"),
        col("bias").as("bv")))
      .withColumn("score", VectorOps.dot(col("u"), col("v")) + lit(biasDamping) * col("bv"))
      .select(col("user_id"), col("item_id"), col("score"))
    val itemType = scored.schema("item_id").dataType
    val topk = udaf(new graft.ops.Aggregators.TopK(k))
    scored.groupBy(col("user_id"))
      .agg(topk(col("score"), col("item_id").cast("long")).as("recs"))
      .select(col("user_id"), posexplode(col("recs")))
      .select(col("user_id"), col("col._2").cast(itemType).as("item_id"),
        col("col._1").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }
}
