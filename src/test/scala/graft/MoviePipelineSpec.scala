package graft

/** End-to-end spec for the three reference entry points (SURVEY §3) wired
  * over deterministic synthetic MovieLens-shaped data. */
class MoviePipelineSpec extends SparkTestBase {

  test("full pipeline: explicit ALS, BPR, and A/B experiment produce sane metrics") {
    val m = MoviePipeline.runAll(spark, numUsers = 40, numMovies = 50)
    assert(m("rmse") > 0 && m("rmse") < 1.5, s"rmse ${m("rmse")}")
    assert(m("reg_log_lik") < 0)
    assert(m("precision_at_10") >= 0 && m("precision_at_10") <= 1)
    assert(m("recall_at_10") >= 0 && m("recall_at_10") <= 1)
    assert(m("ab_two_sided_p") >= 0 && m("ab_two_sided_p") <= 1)
    assert(m("ab_n_per_group") > 0)
  }

  test("pipeline is deterministic for a fixed seed") {
    val a = MoviePipeline.runAll(spark, numUsers = 25, numMovies = 30, seed = 5L)
    val b = MoviePipeline.runAll(spark, numUsers = 25, numMovies = 30, seed = 5L)
    assert(a == b)
  }
}
