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

  test("implicit training runs on the distributed DSGD path too") {
    val ratings = MoviePipeline.generateMovieLens(spark, 30, 40, seed = 9L)._1
    val pr = MoviePipeline.implicitTraining(ratings,
      graft.model.Bpr.Params(rank = 4, epochs = 4, initScale = 0.1),
      ks = Seq(10), distributed = Some(true))
    val (p, r) = pr(10)
    assert(p >= 0.0 && p <= 1.0 && r >= 0.0 && r <= 1.0)
  }

  test("implicit training auto-selects DSGD above the size threshold") {
    val ratings = MoviePipeline.generateMovieLens(spark, 30, 40, seed = 9L)._1
    val p = graft.model.Bpr.Params(rank = 4, epochs = 4, initScale = 0.1)
    def run(distributed: Option[Boolean], threshold: Long) =
      MoviePipeline.implicitTraining(ratings, p, ks = Seq(10),
        distributed = distributed, distributedThreshold = threshold)(10)
    val dsgd = run(Some(true), 0L)
    val bcast = run(Some(false), 0L)
    // auto mode picks DSGD when the positives count clears the threshold,
    // the broadcast trainer when it doesn't (exact match proves the switch)
    assert(run(None, 1L) == dsgd)
    assert(run(None, Long.MaxValue) == bcast)
    // both trainers land in the same metric neighborhood
    assert(math.abs(dsgd._1 - bcast._1) <= 0.25, s"precision $dsgd vs $bcast")
    assert(math.abs(dsgd._2 - bcast._2) <= 0.25, s"recall $dsgd vs $bcast")
    // a quirk-compat run (refCompatRegSign reproduces the reference's +reg
    // sign, which DSGD deliberately lacks) must NOT auto-switch trainers
    val quirk = p.copy(refCompatRegSign = true)
    val quirkAuto = MoviePipeline.implicitTraining(ratings, quirk, ks = Seq(10),
      distributed = None, distributedThreshold = 1L)(10)
    val quirkBcast = MoviePipeline.implicitTraining(ratings, quirk, ks = Seq(10),
      distributed = Some(false), distributedThreshold = 1L)(10)
    assert(quirkAuto == quirkBcast)
  }

  test("pipeline is deterministic for a fixed seed") {
    val a = MoviePipeline.runAll(spark, numUsers = 25, numMovies = 30, seed = 5L)
    val b = MoviePipeline.runAll(spark, numUsers = 25, numMovies = 30, seed = 5L)
    assert(a == b)
  }
}
