package graft.streaming

import graft.SparkTestBase
import graft.ops.Terms
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[EventStreams.gateByLmPerplexity]]: broadcast-LM streaming gate agrees
  * with the distributed batch scorer, handles unseen contexts, stays
  * stateless. */
class StreamingPerplexitySpec extends SparkTestBase {
  import spark.implicits._

  private val train = Seq((100L, "a b a c")).toDF("doc_id", "text")

  test("broadcast model replays the batch Laplace algebra exactly") {
    val m = Terms.bigramLmTrainCollect(train, "text")
    // hand values from PerplexitySpec: seen (a,b) p=0.4; unseen context
    // (c,_) p=1/3; seen context unseen pair (a,z) p=1/5
    assert(math.abs(m.score(Seq("a", "b")).get._3 - 2.5) < 1e-9)
    assert(math.abs(m.score(Seq("c", "a")).get._3 - 3.0) < 1e-9)
    assert(math.abs(m.score(Seq("a", "z")).get._3 - 5.0) < 1e-9)
    assert(m.score(Seq("solo")).isEmpty)
  }

  test("streamed gate equals the batch bigramPerplexity scorer") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq((1L, "a b a"), (2L, "z q w z"), (3L, "a b a c a b"))
      .toDF("doc_id", "text")
    val m = Terms.bigramLmTrainCollect(train, "text")
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.gateByLmPerplexity(
        in.toDF().toDF("doc_id", "text"), "text", m, maxPpl = 2.5)
      .writeStream.format("memory").queryName("lm_gate")
      .outputMode("append").start()
    in.addData((1L, "a b a"), (2L, "z q w z"), (3L, "a b a c a b"))
    q.processAllAvailable()
    val got = spark.table("lm_gate")
      .select(col("doc_id"), col("n_bigrams"), round(col("avg_nll"), 6),
        round(col("ppl"), 4), col("keep"))
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    q.stop()
    val batch = Terms.bigramPerplexity(docs, "doc_id", "text", train, "text")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (id, (_, n, nll, ppl, _)) =>
      assert(n == batch(id)._2, s"doc $id n_bigrams")
      assert(math.abs(nll - batch(id)._3) < 1e-6, s"doc $id avg_nll")
      assert(math.abs(ppl - batch(id)._4) < 1e-4, s"doc $id ppl")
    }
    // reference-like doc 1 (ppl ≈ 2.236) passes the 2.5 bar; all-unseen
    // noise doc 2 sits at the 1/V floor (ppl = V = 3.0) and fails
    assert(got(1L)._5 && !got(2L)._5)
  }

  test("sub-bigram docs score NULL and fail the gate; plan is stateless") {
    val m = Terms.bigramLmTrainCollect(train, "text")
    val out = EventStreams.gateByLmPerplexity(
        Seq((9L, "solo"), (10L, "")).toDF("doc_id", "text"), "text", m, 10.0)
      .select(col("doc_id"), col("ppl").isNull, col("keep"))
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(9L)._2 && !out(9L)._3 && out(10L)._2 && !out(10L)._3)
    val plan = EventStreams.gateByLmPerplexity(train, "text", m, 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("StateStore"), plan)
  }
}
