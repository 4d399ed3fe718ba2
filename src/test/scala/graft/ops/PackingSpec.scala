package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  // one shard, budget 10: [4,5] -> block 0; [7] -> block 1; [12] oversize
  // alone -> block 2; [3,6] -> block 3; [2] -> block 4 (6+2 <= 10? yes ->
  // stays in block 3). Hand-walked below.
  private val docs = Seq(
    (1L, 4L), (2L, 5L), (3L, 7L), (4L, 12L), (5L, 3L), (6L, 6L), (7L, 2L))
    .toDF("id", "tok")

  test("hand golden: greedy boundaries, oversize doc gets its own block") {
    val out = Packing.greedyPack(docs, "id", lit(0L), col("id"), col("tok"),
        budget = 10L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val expected = Seq(
      (1L, 0L, 0L, 0L, 4L),  // fill 4
      (2L, 0L, 0L, 4L, 5L),  // fill 9
      (3L, 0L, 1L, 0L, 7L),  // 9+7 > 10 -> new block
      (4L, 0L, 2L, 0L, 12L), // 7+12 > 10 -> new block, oversize alone
      (5L, 0L, 3L, 0L, 3L),  // 12+3 > 10 -> new block
      (6L, 0L, 3L, 3L, 6L),  // fill 9
      (7L, 0L, 4L, 0L, 2L))  // 9+2 > 10 -> new block
    assert(out.toSeq == expected)
  }

  test("shards pack independently and deterministically under repartition") {
    val sharded = docs.withColumn("shard", pmod(col("id"), lit(2L)))
    val a = Packing.greedyPack(sharded.repartition(7), "id", col("shard"),
        col("id"), col("tok"), budget = 10L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Packing.greedyPack(sharded.repartition(1), "id", col("shard"),
        col("id"), col("tok"), budget = 10L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    // shard 1 walks ids 1,3,5,7 (tok 4,7,3,2): [4] then 4+7>10 -> [7,3]
    // then 10+2>10 -> [2]
    val shard1 = a.filter(_._2 == 1L).map(t => (t._1, t._3, t._4))
    assert(shard1 == Seq((1L, 0L, 0L), (3L, 1L, 0L), (5L, 1L, 7L), (7L, 2L, 0L)))
  }

  test("packStats: fill accounting with waste clamped for oversize blocks") {
    val packed = Packing.greedyPack(docs, "id", lit(0L), col("id"),
      col("tok"), budget = 10L)
    val stats = Packing.packStats(packed, budget = 10L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(stats == Seq(
      (0L, 0L, 2L, 9L, 1L), (0L, 1L, 1L, 7L, 3L), (0L, 2L, 1L, 12L, 0L),
      (0L, 3L, 2L, 9L, 1L), (0L, 4L, 1L, 2L, 8L)))
  }

  test("NULL token count fails loudly, not by corrupting block boundaries") {
    val bad = Seq((1L, Some(4L)), (2L, None), (3L, Some(2L)))
      .toDF("id", "tok")
    val ex = intercept[Exception] {
      Packing.greedyPack(bad, "id", lit(0L), col("id"), col("tok"),
        budget = 10L).collect()
    }
    assert(ex.getMessage != null)
  }

  test("every block obeys the budget unless it is a single oversize doc") {
    val sharded = docs.withColumn("shard", pmod(col("id"), lit(3L)))
    val stats = Packing.packStats(
      Packing.greedyPack(sharded, "id", col("shard"), col("id"), col("tok"),
        budget = 10L), budget = 10L)
      .as[(Long, Long, Long, Long, Long)].collect()
    stats.foreach { case (_, _, nDocs, fill, _) =>
      assert(fill <= 10L || nDocs == 1L)
    }
  }

  test("property: random corpora equal a driver-side greedy replay") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val corpus: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        shard <- Gen.choose(0L, 3L)
        tok <- Gen.frequency(8 -> Gen.choose(1L, 12L), // normal
          1 -> Gen.const(0L),                          // zero-token doc
          1 -> Gen.choose(13L, 30L))                   // oversize
      } yield (shard, tok))
    } yield rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
    for (seedNo <- 0 until 6) {
      val rows = corpus
        .pureApply(org.scalacheck.Gen.Parameters.default.withSize(40),
          Seed(31L + seedNo))
      val df = rows.toDF("id", "shard", "tok")
      val got = Packing.greedyPack(df, "id", col("shard"), col("id"),
          col("tok"), budget = 10L)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      // driver replay of the documented walk
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (shard, rs) =>
        var block = -1L; var fill = Long.MaxValue
        rs.sortBy(_._1).map { case (id, _, tok) =>
          if (fill + tok > 10L || fill == Long.MaxValue) {
            block += 1L; fill = 0L
          }
          val off = fill; fill += tok
          (id, shard, block, off, tok)
        }
      }.sortBy(_._1)
      assert(got == expected, s"seed $seedNo")
    }
  }
}
