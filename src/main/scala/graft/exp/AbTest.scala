package graft.exp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.AlsBias
import graft.ops.Relational
import graft.serve.Recommend
import graft.stats.Tests

/** Simulated A/B experiment (/root/reference/explicit_ratings/ab_test.py):
  * synthesize users with genre-pair tastes (X1), serve top-k from a control
  * and a treatment model, log scores, equalize group sizes (X2), then run the
  * reference's decision tree of hypothesis tests (X3-X6): Levene gates the
  * t-test flavor, Shapiro-Wilk gates t vs rank-sum.
  *
  * All randomness is hash-derived (xxhash64 on user id + seed) so the
  * simulation is deterministic under any partitioning — unlike the
  * reference's unseeded global RNG (SURVEY §5 "reproducibility gaps").
  */
object AbTest {

  /** The reference's 10 curated genre pairs, VERBATIM from
    * /root/reference/explicit_ratings/ab_test.py:55-66 (ids match
    * Schemas.genreIds, which mirrors ab_test.py:31-52). */
  val GenrePairs: Seq[(Int, Int)] = Seq(
    (14, 15), // Sci-Fi, Fantasy
    (12, 5),  // Animation, Children
    (15, 6),  // Fantasy, Adventure
    (13, 9),  // Comedy, Romance
    (1, 16),  // War, Action
    (10, 0),  // Thriller, Horror
    (8, 9),   // Drama, Romance
    (5, 6),   // Children, Adventure
    (18, 2),  // Mystery, Crime
    (4, 16))  // Western, Action

  private def hashUnif(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    (pmod(xxhash64(cols: _*), lit(1000000L)).cast("double") + 0.5) / 1000000.0

  /** X1: simulate `numUsers` users. Each picks a genre pair, samples 5-10
    * movies per genre from the inverted index with ratings in {7..10}, and
    * lands in group A or B uniformly (ab_test.py:92-97, functions.py:491-519). */
  def simulateUsers(spark: SparkSession, genreIndex: DataFrame,
                    numUsers: Int = 500, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val pairs = GenrePairs.zipWithIndex
      .map { case ((g1, g2), i) => (i, g1, g2) }
      .toDF("pair_id", "genre_1", "genre_2")
    val users = spark.range(numUsers).select(col("id").cast("int").as("user_id"))
      .withColumn("pair_id",
        pmod(xxhash64(col("user_id"), lit(seed), lit("pair")), lit(GenrePairs.size)).cast("int"))
      .withColumn("group",
        when(hashUnif(col("user_id"), lit(seed), lit("grp")) < 0.5, "A").otherwise("B"))
      .join(broadcast(pairs), Seq("pair_id"))
    val perGenre = users
      .select(col("user_id"), col("group"), col("genre_1"), col("genre_2"),
        explode(array(col("genre_1"), col("genre_2"))).as("genreId"))
      .join(broadcast(genreIndex), Seq("genreId"))
      .withColumn("n_sample",
        (pmod(xxhash64(col("user_id"), col("genreId"), lit(seed), lit("n")), lit(6)) + 5).cast("int"))
      .select(col("user_id"), col("group"), col("genre_1"), col("genre_2"),
        col("genreId"), col("n_sample"), explode(col("movieIds")).as("movieId"))
    // movieId tiebreak: the 1e6-bucket hash collides (~birthday at 25k-movie
    // genres), and an untied window order would make the cutoff row
    // partition-dependent
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("genreId"))
      .orderBy(hashUnif(col("user_id"), col("movieId"), lit(seed), lit("pick")),
        col("movieId"))
    perGenre
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n_sample"))
      .withColumn("rating",
        (pmod(xxhash64(col("user_id"), col("movieId"), lit(seed), lit("r")), lit(4)) + 7).cast("int"))
      .select(col("user_id"), col("group"), col("genre_1"), col("genre_2"),
        col("movieId"), col("rating").cast("double"))
      .dropDuplicates("user_id", "movieId")
  }

  /** Serve top-k for every simulated user from its group's model and build
    * the experiment log (schema per ab_test.py:205-232, one id space —
    * quirk Q7 corrected). */
  def buildLog(history: DataFrame, controlModel: AlsBias.Model,
               treatmentModel: AlsBias.Model, itemRatingCounts: DataFrame,
               p: AlsBias.Params, k: Int = 20, popularityFloor: Long = 90L): DataFrame = {
    def serveGroup(group: String, model: AlsBias.Model): DataFrame = {
      val hist = history.filter(col("group") === group)
      val folded = Recommend.foldInUsers(hist, model.itemFactors,
        "user_id", "movieId", "rating", p)
      Recommend.recommend(folded, model.itemFactors, itemRatingCounts,
          k, popularityFloor)
        .select(col("user_id"), col("item_id").as("movie_id"),
          col("score"), lit(group).as("group"))
    }
    serveGroup("A", controlModel).unionByName(serveGroup("B", treatmentModel))
  }

  final case class ExperimentResult(
      levene: Tests.TestResult, shapiroA: Tests.TestResult, shapiroB: Tests.TestResult,
      usedWelch: Boolean, usedRankSum: Boolean,
      twoSided: Tests.TestResult, less: Tests.TestResult, greater: Tests.TestResult,
      nA: Long, nB: Long)

  /** X2: the reference equalizes at the USER level — surplus whole users
    * are dropped from the larger group (ab_test.py:247-265), keeping every
    * surviving user's complete top-k list (row-level truncation would slice
    * partial lists and, because scores within a user are correlated, shift
    * the group variance the X3-X6 tests read). User choice is hash-derived
    * (xxhash64 on user_id + seed) so the dropped set is deterministic under
    * any partitioning; the reference's np.random.choice quirk (sampling
    * WITH replacement, so it may drop fewer than `difference` users) is
    * corrected to exactly-min-count. */
  def equalizeUsers(log: DataFrame, seed: Long): DataFrame = {
    val userGroups = log.select(col("user_id"), col("group")).distinct()
    val minUsers = userGroups.groupBy(col("group")).agg(count(lit(1)).as("n"))
      .agg(min(col("n"))).head().getLong(0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("group"))
      .orderBy(xxhash64(col("user_id"), lit(seed), lit("eq")), col("user_id"))
    val keep = userGroups.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= minUsers)
      .select(col("user_id"))
    log.join(keep, Seq("user_id"), "left_semi")
  }

  /** X2-X6: equalize group sizes (user-level, [[equalizeUsers]]), then the
    * reference's stat decision tree (ab_test.py:236-391): Levene p<0.05 →
    * Welch, else Student; either Shapiro p<0.05 → Wilcoxon rank-sum instead
    * of t. Scores are collected (bounded: users×k rows) — the moment
    * statistics feeding the t-test are aggregation-friendly (see Queries
    * q33) for the at-scale path. */
  def evaluate(log: DataFrame, seed: Long = 42L, alpha: Double = 0.05): ExperimentResult = {
    val eq = equalizeUsers(
      log.select(col("user_id"), col("score"), col("group")), seed)
    val scoresA = eq.filter(col("group") === "A").select("score")
      .collect().map(_.getDouble(0))
    val scoresB = eq.filter(col("group") === "B").select("score")
      .collect().map(_.getDouble(0))
    val levene = Tests.levene(scoresA, scoresB)
    val shA = Tests.shapiroWilk(scoresA)
    val shB = Tests.shapiroWilk(scoresB)
    val useRankSum = shA.pValue < alpha || shB.pValue < alpha
    val useWelch = levene.pValue < alpha
    val (two, less, greater) =
      if (useRankSum)
        (Tests.rankSum(scoresA, scoresB, Tests.TwoSided),
          Tests.rankSum(scoresA, scoresB, Tests.Less),
          Tests.rankSum(scoresA, scoresB, Tests.Greater))
      else
        (Tests.tTest(scoresA, scoresB, !useWelch, Tests.TwoSided),
          Tests.tTest(scoresA, scoresB, !useWelch, Tests.Less),
          Tests.tTest(scoresA, scoresB, !useWelch, Tests.Greater))
    ExperimentResult(levene, shA, shB, useWelch, useRankSum, two, less, greater,
      scoresA.length, scoresB.length)
  }
}
