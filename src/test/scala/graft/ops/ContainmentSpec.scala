package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Dedup.ngramContainmentPairs]]: the asymmetric short-inside-long cases
  * symmetric Jaccard misses, plus agreement with Jaccard on the symmetric
  * case through the shared blocked pair-count core. */
class ContainmentSpec extends SparkTestBase {
  import spark.implicits._

  // doc 2 = doc 1 verbatim inside a much longer wrapper; doc 3 unrelated
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon", "en"),
    (2L, "intro words here alpha beta gamma delta epsilon and then a very " +
      "long tail of unrelated filler content goes on and on for a while", "en"),
    (3L, "totally different text about other things entirely friends", "en"),
    (4L, "alpha beta gamma delta epsilon", "de")) // same text, other block
    .toDF("doc_id", "text", "lang")

  private def pairs(minC: Double) =
    Dedup.ngramContainmentPairs(docs, "doc_id", "text", Seq(col("lang")), 3, minC)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("short doc fully contained in long doc scores cont_a = 1.0") {
    val p = pairs(0.9)
    // doc 1 has 3 shingles ("alpha beta gamma","beta gamma delta",
    // "gamma delta epsilon"), all present in doc 2
    assert(p.keySet == Set((1L, 2L)))
    assert(p((1L, 2L))._1 == 1.0)       // |A∩B|/|A|
    assert(p((1L, 2L))._2 < 0.2)        // the long side's containment is low
  }

  test("the same pair is invisible to Jaccard at any near-dup threshold") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        Seq(col("lang")), 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(!j.exists(r => r._1 == 1L && r._2 == 2L))
  }

  test("blocking separates languages; unrelated docs never pair") {
    val p = pairs(0.1)
    assert(!p.keySet.exists { case (a, b) => a == 4L || b == 4L })
    assert(!p.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("threshold filters on the max direction") {
    assert(pairs(0.9).contains((1L, 2L)))   // max(1.0, low) >= 0.9
    val all = pairs(0.05)
    assert(all((1L, 2L))._2 > 0.05)          // both directions reported
  }
}
