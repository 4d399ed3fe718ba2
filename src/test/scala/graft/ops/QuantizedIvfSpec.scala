package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class QuantizedIvfSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private val corpus = Seq(
    (100L, vec(1.0, 0.05)), (101L, vec(0.95, 0.1)), (102L, vec(1.05, -0.05)),
    (200L, vec(0.05, 1.0)), (201L, vec(0.1, 0.9)), (202L, vec(-0.02, 1.1)))
    .toDF("vec_id", "embedding")
  private val queries = Seq((1L, vec(0.9, 0.0)), (2L, vec(0.0, 0.8)))
    .toDF("vec_id", "embedding")
  private val centroids = Seq((100L, Seq(1.0, 0.0)), (200L, Seq(0.0, 1.0)))

  test("store carries int8 codes + scale; full re-rank equals brute force exactly") {
    Similarity.writeQuantizedIvfStore(corpus, "vec_id", "embedding", centroids,
      "qivf_store", numBuckets = 4)
    try {
      val store = spark.table("qivf_store")
      assert(store.schema("codes").dataType == ArrayType(ByteType, containsNull = false)
        || store.schema("codes").dataType == ArrayType(ByteType, containsNull = true),
        store.schema.treeString)
      assert(store.schema("scale").dataType == DoubleType)
      assert(store.count() == 6)
      // codes reconstruct the vectors within the symmetric-int8 error bound
      val maxErr = store
        .join(corpus.select($"vec_id".as("id"), $"embedding"), Seq("id"))
        .select(VectorOps.dequantMaxErr($"embedding", $"codes".cast("array<int>"), $"scale"))
        .as[Double].collect().max
      assert(maxErr <= 1.1 / 127.0 * 0.5 + 1e-9, s"maxErr $maxErr") // scale/2 bound
      val got = Similarity.quantizedIvfSearchFromStore(spark, "qivf_store",
          corpus, queries, "vec_id", "embedding", centroids,
          nProbe = 2, k = 3, rerankK = 0)
        .select($"query_id", $"cand_id", $"cosine_sim", $"rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
      val brute = Similarity.cosineTopK(queries, corpus, "vec_id", "embedding", 3)
        .select($"query_id", $"cand_id", $"cosine_sim", $"rank")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(got == brute)
      assert(got.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS qivf_store")
  }

  test("bucket pruning holds: nProbe=1 reads fewer buckets, within-cell results") {
    Similarity.writeQuantizedIvfStore(corpus, "vec_id", "embedding", centroids,
      "qivf_prune", numBuckets = 4)
    try {
      val out = Similarity.quantizedIvfSearchFromStore(spark, "qivf_prune",
        corpus, queries, "vec_id", "embedding", centroids,
        nProbe = 1, k = 10, rerankK = 0)
      val scanLine = out.queryExecution.executedPlan.toString.linesIterator
        .find(_.contains("SelectedBucketsCount"))
      assert(scanLine.isDefined, out.queryExecution.executedPlan.toString)
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(scanLine.get).get
      assert(m.group(1).toInt < m.group(2).toInt, scanLine.get)
      val byQuery = out.select($"query_id", $"cand_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(byQuery(1L) == Set(100L, 101L, 102L))
      assert(byQuery(2L) == Set(200L, 201L, 202L))
    } finally spark.sql("DROP TABLE IF EXISTS qivf_prune")
  }

  test("bounded rerank on real embeddings: recall@5 vs brute force >= 0.95") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val qs = emb.filter($"vec_id" < 20).select($"vec_id", $"embedding")
    val corp = emb.filter($"vec_id" >= 20).select($"vec_id", $"embedding")
    val codebook = corp.filter($"vec_id" < 28).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    Similarity.writeQuantizedIvfStore(corp, "vec_id", "embedding", codebook,
      "qivf_real", numBuckets = codebook.size)
    try {
      val brute = Similarity.cosineTopK(qs, corp, "vec_id", "embedding", 5)
        .select($"query_id", $"cand_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // all cells probed but the exact re-rank sees only the top-10
      // DEQUANTIZED candidates per query: recall measures what int8
      // ranking error costs, the contract of the approximate serving point
      val approx = Similarity.quantizedIvfSearchFromStore(spark, "qivf_real",
          corp, qs, "vec_id", "embedding", codebook,
          nProbe = codebook.size, k = 5, rerankK = 10)
        .select($"query_id", $"cand_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = brute.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).count(t).toDouble / t.size }.sum / brute.size
      assert(recall >= 0.95, s"recall@5 $recall")
    } finally spark.sql("DROP TABLE IF EXISTS qivf_real")
  }

  test("filtered batch serving: metadata predicate pushes down, equals filtered brute force") {
    val labeled = corpus.withColumn("label",
      (col("vec_id") % 2 === 0).cast("int"))   // 100,102,200,202 -> label 1... (even ids)
    Similarity.writeQuantizedIvfStore(labeled, "vec_id", "embedding", centroids,
      "qivf_filt", numBuckets = 4, metaCols = Seq("label"))
    try {
      val out = Similarity.quantizedIvfSearchFromStore(spark, "qivf_filt",
        labeled, queries, "vec_id", "embedding", centroids,
        nProbe = 2, k = 3, rerankK = 0,
        candidateFilter = Some(col("label") === 1))
      // the predicate reaches the parquet scan of the quantized store
      val plan = out.queryExecution.executedPlan.toString
      val scan = plan.linesIterator.find(l =>
        l.contains("PushedFilters") && l.contains("label"))
      assert(scan.isDefined, plan)
      // exactness point: equals brute force over the label-filtered corpus
      val got = out.select($"query_id", $"cand_id", $"cosine_sim", $"rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
      val brute = Similarity.cosineTopK(queries,
          labeled.filter($"label" === 1), "vec_id", "embedding", 3)
        .select($"query_id", $"cand_id", $"cosine_sim", $"rank")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(got == brute)
      assert(got.nonEmpty)
      // every served candidate satisfies the predicate
      assert(got.forall(_._2 % 2 == 0))
    } finally spark.sql("DROP TABLE IF EXISTS qivf_filt")
  }

  test("quantized delta log: base+deltas equals a rebuild; shared fold is exactly-once") {
    def probe(table: String, delta: Option[String]) = {
      val out = delta match {
        case Some(p) => Similarity.quantizedIvfSearchFromStoreWithDeltas(spark,
          table, p, corpus, queries, "vec_id", "embedding", centroids,
          nProbe = 2, k = 10, rerankK = 0)
        case None => Similarity.quantizedIvfSearchFromStore(spark, table,
          corpus, queries, "vec_id", "embedding", centroids,
          nProbe = 2, k = 10, rerankK = 0)
      }
      out.select($"query_id", $"cand_id", $"cosine_sim", $"rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
    }
    Similarity.writeQuantizedIvfStore(corpus, "vec_id", "embedding", centroids,
      "qivf_dreb", numBuckets = 4)
    val rebuilt = probe("qivf_dreb", None)
    val delta = java.nio.file.Files.createTempDirectory("qivf_delta").toString
    Similarity.writeQuantizedIvfStore(corpus.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", centroids, "qivf_d", numBuckets = 4)
    Similarity.writeQuantizedIvfDeltaBatch(corpus.filter($"vec_id" % 2 === 1),
      "vec_id", "embedding", centroids, delta, 0L)
    assert(probe("qivf_d", Some(delta)) == rebuilt)
    // the SHARED fold (compactIvfDelta) handles the quantized layout too,
    // exactly-once under a crash between append and sweep
    val e = intercept[RuntimeException] {
      Similarity.compactIvfDeltaImpl(spark, "qivf_d", delta,
        numBuckets = 4, maxBatchExclusive = 1L, crashAfterStep = 1)
    }
    assert(e.getMessage.contains("step 1"))
    assert(Similarity.compactIvfDelta(spark, "qivf_d", delta,
      numBuckets = 4, maxBatchExclusive = 1L) == 1)
    val folded = probe("qivf_d", None)
    assert(folded == rebuilt)
    folded.toSeq.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).distinct.size == rs.size, s"dup candidate for query $q")
    }
    spark.sql("DROP TABLE IF EXISTS qivf_d")
    spark.sql("DROP TABLE IF EXISTS qivf_dreb")
  }
}
