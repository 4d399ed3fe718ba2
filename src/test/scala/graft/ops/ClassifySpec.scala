package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  // Hand-computed Naive Bayes fixture. Vocab = {apple, banana, carrot,
  // potato}, |V| = 4. Counts: fruit -> apple 3, banana 1 (cy 4);
  // veg -> banana 1, carrot 2, potato 1 (cy 4). Smoothed:
  //   p(w|fruit) = apple .5, banana .25, carrot .125, potato .125
  //   p(w|veg)   = apple .125, banana .25, carrot .375, potato .25
  private val docs = Seq(
    (1L, "apple banana", "fruit"),
    (2L, "Apple APPLE!", "fruit"), // normalization folds case/punct
    (3L, "carrot potato", "veg"),
    (4L, "banana carrot", "veg"))
    .toDF("doc_id", "text", "source")

  test("nbSourceScores matches the hand-computed smoothed conditionals") {
    val s = Classify.nbSourceScores(docs, "doc_id", "text", "source")
      .as[(Long, String, Double)].collect()
      .map { case (d, y, v) => (d, y) -> v }.toMap
    assert(s((1L, "fruit")) == 0.375)    // (.5 + .25) / 2
    assert(s((1L, "veg")) == 0.1875)     // (.125 + .25) / 2
    assert(s((2L, "fruit")) == 0.5)
    assert(s((2L, "veg")) == 0.125)
    assert(s((3L, "veg")) == 0.3125)     // (.375 + .25) / 2
    assert(s((4L, "fruit")) == 0.1875)
    assert(s((4L, "veg")) == 0.3125)
    assert(s.size == 8)                  // every doc scored against every class
  }

  test("nbPredict argmaxes per doc and recovers the true labels here") {
    val p = Classify.nbPredict(docs, "doc_id", "text", "source")
      .as[(Long, String, Double)].collect()
      .map { case (d, y, v) => d -> ((y, v)) }.toMap
    assert(p(1L) == (("fruit", 0.375)))
    assert(p(2L) == (("fruit", 0.5)))
    assert(p(3L) == (("veg", 0.3125)))
    assert(p(4L) == (("veg", 0.3125)))
  }

  test("exact score ties break to the lexicographically smallest class") {
    // Symmetric corpus: both classes give every token identical evidence.
    val sym = Seq((1L, "a", "x"), (2L, "a", "y")).toDF("doc_id", "text", "source")
    val p = Classify.nbPredict(sym, "doc_id", "text", "source")
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(p == Map(1L -> "x", 2L -> "x"))
  }

  test("documents with no alphanumeric tokens are absent, not null-scored") {
    val withEmpty = docs.union(Seq((9L, "!!! ...", "fruit"))
      .toDF("doc_id", "text", "source"))
    val ids = Classify.nbPredict(withEmpty, "doc_id", "text", "source")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 4L))
  }

  test("nbTrainCollect reproduces the smoothed conditionals and guards the collect") {
    val m = Classify.nbTrainCollect(docs, "doc_id", "text", "source")
    assert(m.classes.toSeq == Seq("fruit", "veg"))
    assert(m.probs("apple").toSeq == Seq(0.5, 0.125))
    assert(m.probs("banana").toSeq == Seq(0.25, 0.25))
    assert(m.probs("carrot").toSeq == Seq(0.125, 0.375))
    assert(m.unseen.toSeq == Seq(0.125, 0.125))   // 1 / (4 + 4) both classes
    assert(m.predict(Seq("apple", "banana")) == (("fruit", 0.375)))
    // token-class table here is 5 rows (fruit: 2 words, veg: 3)
    intercept[IllegalArgumentException] {
      Classify.nbTrainCollect(docs, "doc_id", "text", "source", maxVocab = 4)
    }
  }

  test("plan shape: argmax is an aggregation, never a corpus window") {
    val plan = Classify.nbPredict(docs, "doc_id", "text", "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
