package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Product quantization: encode determinism, ADC exactness under
  * reconstruction-exact codebooks, recall of the two-stage search with
  * fitted codebooks, and the rerankK <= 0 brute-force equality that q122
  * declares. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  // dim 8, m = 2 subspaces of 4; every subvector drawn from 3 prototypes
  private val protos = Seq(
    Seq(1.0f, 0.0f, 0.0f, 0.0f),
    Seq(0.0f, 1.0f, 1.0f, 0.0f),
    Seq(0.5f, 0.5f, 0.0f, 1.0f))
  private val exactBooks: Seq[Seq[(Long, Seq[Double])]] =
    Seq.fill(2)(protos.zipWithIndex.map { case (p, i) =>
      (i.toLong, p.map(_.toDouble)) })
  private val docs = (for (a <- protos.indices; b <- protos.indices)
    yield ((a * 3 + b).toLong, (protos(a) ++ protos(b)).toSeq)).toDF("id", "vec")

  test("pqEncode picks the argmin centroid per subspace, partition-independent") {
    val codes = Similarity.pqEncode(docs, "id", "vec", exactBooks)
      .as[(Long, Seq[Byte])].collect().toMap
    for (a <- protos.indices; b <- protos.indices)
      assert(codes((a * 3 + b).toLong) == Seq(a.toByte, b.toByte))
    val re = Similarity.pqEncode(docs.repartition(7), "id", "vec", exactBooks)
      .as[(Long, Seq[Byte])].collect().toMap
    assert(re == codes)
  }

  test("ADC equals exact cosine when codebooks reproduce every subvector") {
    val codes = Similarity.pqEncode(docs, "id", "vec", exactBooks)
    val queries = docs.filter(col("id") < 3)
    val adc = Similarity.pqAdcScores(queries, codes, "id", "vec", exactBooks)
      .as[(Long, Long, Double)].collect()
      .map { case (q, c, s) => (q, c) -> s }.toMap
    val exact = Similarity.cosineTopK(queries, docs, "id", "vec", k = 9)
      .select(col("query_id"), col("cand_id"), col("cosine_sim"))
      .as[(Long, Long, Double)].collect()
    assert(exact.nonEmpty)
    for ((q, c, s) <- exact)
      assert(math.abs(adc((q, c)) - s) < 1e-6 + 1e-6 * math.abs(s),
        s"query $q cand $c: adc ${adc((q, c))} vs exact $s")
  }

  test("fitted codebooks + modest re-rank recover the brute-force top-k") {
    // 5 well-separated cluster directions in dim 16, 40 vectors each with
    // small deterministic jitter
    val rnd = new scala.util.Random(7)
    val centers = (0 until 5).map(_ => Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("id", "vec")
    val books = Similarity.pqCodebooks(vecs, "vec", m = 4, ksub = 8)
    val codes = Similarity.pqEncode(vecs, "id", "vec", books)
    val queries = vecs.filter(col("id") < 10)

    val exact = Similarity.cosineTopK(queries, vecs, "id", "vec", k = 5)
      .select(col("query_id"), col("cand_id"))
      .as[(Long, Long)].collect().toSet
    // rerank depth must cover an ADC resolution cell: tightly-clustered
    // vectors share identical codes, so ADC ties across a whole cluster
    // (~40 members here) and stage 1 keeps an arbitrary id-ordered subset
    // — rerankK 50 > cluster size lets stage 2 see the full tied cohort
    val got = Similarity.pqSearch(queries, codes, vecs, "id", "vec", books,
        k = 5, rerankK = 50)
      .select(col("query_id"), col("cand_id"))
      .as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall")

    // rerankK <= 0: every candidate exactly re-ranked == brute force,
    // whatever the codebooks (the q122 contract)
    val full = Similarity.pqSearch(queries, codes, vecs, "id", "vec", books,
        k = 5, rerankK = 0)
      .select(col("query_id"), col("cand_id"), col("cosine_sim"), col("rnk"))
      .as[(Long, Long, Double, Long)].collect().toSet
    val brute = Similarity.cosineTopK(queries, vecs, "id", "vec", k = 5)
      .select(col("query_id"), col("cand_id"), col("cosine_sim"), col("rank"))
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(full == brute)
  }
}
