package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed Laplace-smoothed bigram perplexity cases for
  * [[Terms.bigramPerplexity]]. Training corpus "a b a c": c2(a,b)=1,
  * c2(b,a)=1, c2(a,c)=1; contexts c1(a)=2, c1(b)=1; V=3 ({a,b,c}). */
class PerplexitySpec extends SparkTestBase {
  import spark.implicits._

  private val train = Seq((100L, "a b a c")).toDF("doc_id", "text")

  private def score(docs: (Long, String)*): Map[Long, (Long, Double, Double)] =
    Terms.bigramPerplexity(docs.toDF("doc_id", "text"), "doc_id", "text",
        train, "text")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("seen bigram: p=(1+1)/(2+3), ppl=2.5 exactly") {
    val out = score((1L, "a b"))
    assert(out(1L)._1 == 1L)
    assert(out(1L)._2 == 1.321928) // -log2(0.4) rounded to 6
    assert(out(1L)._3 == 2.5)      // 1/0.4
  }

  test("unseen context falls back to 1/V; unseen pair to 1/(c1+V)") {
    val out = score((1L, "c a"), (2L, "a z"))
    assert(out(1L)._3 == 3.0) // p = 1/3  (context c never observed)
    assert(out(2L)._3 == 5.0) // p = 1/(2+3) (context a, pair unseen)
  }

  test("multi-bigram doc averages nll; geometric-mean identity holds") {
    // "a b a": bigrams (a,b) p=0.4 and (b,a) p=(1+1)/(1+3)=0.5
    // ppl = (0.4 * 0.5)^(-1/2) = 1/sqrt(0.2)
    val out = score((1L, "a b a"))
    assert(out(1L)._1 == 2L)
    assert(math.abs(out(1L)._3 - 1.0 / math.sqrt(0.2)) < 1e-4)
  }

  test("reference-like text scores lower perplexity than noise") {
    val out = score((1L, "a b a c a b"), (2L, "z q w z q p"))
    assert(out(1L)._3 < out(2L)._3)
  }

  test("sub-bigram docs are absent; normalization applies") {
    val out = score((1L, "a"), (2L, ""), (3L, "A, b!"))
    assert(!out.contains(1L) && !out.contains(2L))
    assert(out(3L)._3 == 2.5) // normalizes to "a b" — the seen bigram
  }
}
