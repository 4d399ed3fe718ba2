package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    val left = (0 until 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    ScaleJoins.writeBucketed(left, "k", 4, "bkt_left")
    ScaleJoins.writeBucketed(right, "k", 4, "bkt_right")
    try {
      val joined = ScaleJoins.bucketedJoin(spark, "bkt_left", "bkt_right", "k")
      assert(joined.count() == 1000)
      assert(ScaleJoins.countExchanges(joined) == 0,
        joined.queryExecution.executedPlan.toString)
      // contrast: the same join over plain frames needs shuffles
      val plain = left.join(right, Seq("k"))
      assert(plain.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("salted join returns exactly the plain join result") {
    // heavy skew: 90% of left rows share one key
    val left = ((0 until 900).map(i => (1L, s"hot$i")) ++
      (0 until 100).map(i => (i.toLong + 2, s"cold$i"))).toDF("k", "lv")
    val right = (0 until 200).map(i => (i.toLong, i * 10)).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(Long, String, Int)].collect().sorted.toSeq
    val salted = ScaleJoins.saltedJoin(left, right, "k", saltFactor = 8)
      .select("k", "lv", "rv").as[(Long, String, Int)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
