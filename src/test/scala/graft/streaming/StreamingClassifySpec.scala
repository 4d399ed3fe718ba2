package graft.streaming

import graft.SparkTestBase
import graft.ops.Classify
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingClassifySpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana", "fruit"),
    (2L, "apple apple", "fruit"),
    (3L, "carrot potato", "veg"),
    (4L, "banana carrot", "veg"))
    .toDF("doc_id", "text", "source")

  test("streamed gate verdicts equal the batch scorer on the training corpus") {
    implicit val sqlCtx = spark.sqlContext
    val model = Classify.nbTrainCollect(corpus, "doc_id", "text", "source")
    val in = MemoryStream[(Long, String)]
    val gated = EventStreams.gateByNbModel(
      in.toDF().toDF("doc_id", "text"), "text", model,
      keepClass = "fruit", minScore = 0.3)
    val q = gated.writeStream.format("memory").queryName("nb_gate")
      .outputMode("append").start()
    in.addData((1L, "apple banana"), (2L, "apple apple"),
      (3L, "carrot potato"), (4L, "banana carrot"))
    q.processAllAvailable()
    val got = spark.table("nb_gate")
      .select(col("doc_id"), col("pred_label"), round(col("score"), 6), col("keep"))
      .as[(Long, String, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    q.stop()
    // batch scorer on the identical corpus (scores rounded the same way)
    val batch = Classify.nbPredict(corpus, "doc_id", "text", "source")
      .as[(Long, String, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (id, (_, y, s, _)) =>
      assert(y == batch(id)._2, s"doc $id pred")
      assert(math.abs(s - batch(id)._3) < 1e-9, s"doc $id score")
    }
    // the gate verdict: fruit docs 1 (0.375) and 2 (0.5) pass the 0.3 bar
    assert(got(1L)._4 && got(2L)._4 && !got(3L)._4 && !got(4L)._4)
  }

  test("serve-time docs with unseen tokens take the per-class fallback") {
    val model = Classify.nbTrainCollect(corpus, "doc_id", "text", "source")
    // cy = 4 both classes, |V| = 4 -> unseen p = 1/8 per class; all-unseen
    // doc ties at 0.125 -> tie-break to "fruit"
    val (y, s) = model.predict(Seq("zucchini", "quince"))
    assert(y == "fruit" && s == 0.125)
    // batch-frame use of the gate (same code path, no stream required)
    val out = EventStreams.gateByNbModel(
      Seq((9L, "zucchini!")).toDF("doc_id", "text"), "text", model, "fruit", 0.2)
      .select("pred_label", "score", "keep")
      .as[(String, Double, Boolean)].head()
    assert(out == (("fruit", 0.125, false)))
  }

  test("gate plan is stateless: no shuffle, no state store") {
    val model = Classify.nbTrainCollect(corpus, "doc_id", "text", "source")
    val plan = EventStreams.gateByNbModel(corpus, "text", model, "fruit", 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("StateStore"), plan)
  }
}
