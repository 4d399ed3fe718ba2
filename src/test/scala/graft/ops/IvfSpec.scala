package graft.ops

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  // 2-d toy corpus in two clear clusters around (1,0) and (0,1)
  private val corpus = Seq(
    (100L, vec(1.0, 0.05)), (101L, vec(0.95, 0.1)), (102L, vec(1.05, -0.05)),
    (200L, vec(0.05, 1.0)), (201L, vec(0.1, 0.9)), (202L, vec(-0.02, 1.1)))
    .toDF("vec_id", "embedding")
  private val queries = Seq((1L, vec(0.9, 0.0)), (2L, vec(0.0, 0.8)))
    .toDF("vec_id", "embedding")
  private val centroids = Seq((100L, Seq(1.0, 0.0)), (200L, Seq(0.0, 1.0)))

  test("l2sq kernel matches the HOF l2Dist squared") {
    val both = corpus.select(
      GraftFunctions.l2sq(col("embedding"), typedLit(Seq(0.5, 0.5))),
      pow(VectorOps.l2Dist(col("embedding"), typedLit(Seq(0.5, 0.5))), 2))
      .as[(Double, Double)].collect()
    both.foreach { case (k, h) => assert(math.abs(k - h) < 1e-12) }
  }

  test("ivfSearch with nProbe=1 probes only the query's own cluster") {
    val out = Similarity.ivfSearch(queries, corpus, "vec_id", "embedding",
        centroids, nProbe = 1, k = 10)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
    val byQuery = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byQuery(1L) == Set(100L, 101L, 102L))
    assert(byQuery(2L) == Set(200L, 201L, 202L))
  }

  test("hardNegatives: only cross-label pairs, equals cosineTopK when labels all differ") {
    val anchors = queries.withColumn("label", lit(0))
    val sameAndOther = corpus.withColumn("label",
      when(col("vec_id") < 200L, 0).otherwise(1))
    val negs = Similarity.hardNegatives(anchors, sameAndOther,
        "vec_id", "embedding", "label", 10)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
    // label-0 corpus vectors (100..102) are never negatives for label-0 anchors
    assert(negs.nonEmpty && negs.forall(_._2 >= 200L))
    // with disjoint labels everywhere, mining IS brute-force top-k
    val allOther = corpus.withColumn("label", lit(1))
    val viaMine = Similarity.hardNegatives(anchors, allOther,
        "vec_id", "embedding", "label", 3)
      .select($"query_id", $"cand_id", $"cosine_sim", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val viaTopK = Similarity.cosineTopK(queries, corpus, "vec_id", "embedding", 3)
      .select($"query_id", $"cand_id", $"cosine_sim", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaMine == viaTopK)
  }

  test("ivfSearch with nProbe = nCells equals brute-force cosine top-k") {
    val ivf = Similarity.ivfSearch(queries, corpus, "vec_id", "embedding",
        centroids, nProbe = 2, k = 3)
      .select($"query_id", $"cand_id", $"cosine_sim", $"rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val brute = Similarity.cosineTopK(queries, corpus, "vec_id", "embedding", 3)
      .select($"query_id", $"cand_id", $"cosine_sim", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(ivf == brute)
  }

  test("IVF store: bucket pruning reads only probed cells, same results") {
    Similarity.writeIvfStore(corpus, "vec_id", "embedding", centroids,
      "ivf_store", numBuckets = 4)
    try {
      val fromStore = Similarity.ivfSearchFromStore(spark, "ivf_store", queries,
        "vec_id", "embedding", centroids, nProbe = 1, k = 10)
      // probes touch 2 distinct cells; the scan must prune to < all buckets
      val scanLine = fromStore.queryExecution.executedPlan.toString.linesIterator
        .find(_.contains("SelectedBucketsCount"))
      assert(scanLine.isDefined, fromStore.queryExecution.executedPlan.toString)
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(scanLine.get).get
      assert(m.group(1).toInt < m.group(2).toInt, scanLine.get)
      val direct = Similarity.ivfSearch(queries, corpus, "vec_id", "embedding",
          centroids, nProbe = 1, k = 10)
        .as[(Long, Long, Double, Long)].collect().toSet
      val stored = fromStore.as[(Long, Long, Double, Long)].collect().toSet
      assert(stored == direct)
      assert(stored.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_store")
    }
  }

  test("filtered ANN: predicate-restricted top-k equals brute force, pushes to the scan") {
    val labeled = corpus.withColumn("label", (col("vec_id") % 2).cast("int"))
    Similarity.writeIvfStore(labeled, "vec_id", "embedding", centroids,
      "ivf_store_flt", numBuckets = 4, metaCols = Seq("label"))
    try {
      val fromStore = Similarity.ivfSearchFromStore(spark, "ivf_store_flt",
        queries, "vec_id", "embedding", centroids,
        nProbe = centroids.size, k = 10,
        candidateFilter = Some(col("label") === 1))
      // at nProbe = nCells the filtered search equals brute force over the
      // filtered corpus
      val brute = Similarity.cosineTopK(queries,
          labeled.filter(col("label") === 1), "vec_id", "embedding", 10)
        .as[(Long, Long, Double, Long)].collect().toSet
      val stored = fromStore.as[(Long, Long, Double, Long)].collect().toSet
      assert(stored == brute)
      assert(stored.nonEmpty && stored.forall(r => r._2 % 2 == 1))
      // the label predicate reaches the parquet scan as a pushed filter
      val plan = fromStore.queryExecution.executedPlan.toString
      val scan = plan.linesIterator.find(l =>
        l.contains("PushedFilters") && l.contains("label"))
      assert(scan.isDefined, s"label predicate must push to the scan:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_store_flt")
    }
  }

  test("IVF store append: new vectors probe-visible, equal to a full rewrite") {
    // base store holds the corpus; a refresh appends new vectors under the
    // SAME codebook at O(new) cost — probes must see old ∪ new exactly as
    // a from-scratch store of the union would, and bucket pruning must
    // still hold on the appended table
    val newcomers = Seq((103L, vec(0.98, 0.02)), (203L, vec(0.02, 0.95)))
      .toDF("vec_id", "embedding")
    Similarity.writeIvfStore(corpus, "vec_id", "embedding", centroids,
      "ivf_store_app", numBuckets = 4)
    Similarity.writeIvfStore(corpus.unionByName(newcomers), "vec_id", "embedding",
      centroids, "ivf_store_full", numBuckets = 4)
    try {
      Similarity.appendToIvfStore(newcomers, "vec_id", "embedding", centroids,
        "ivf_store_app", numBuckets = 4)
      val appended = Similarity.ivfSearchFromStore(spark, "ivf_store_app",
        queries, "vec_id", "embedding", centroids, nProbe = 1, k = 10)
      val rewritten = Similarity.ivfSearchFromStore(spark, "ivf_store_full",
          queries, "vec_id", "embedding", centroids, nProbe = 1, k = 10)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(appended.as[(Long, Long, Double, Long)].collect().toSet == rewritten)
      assert(rewritten.map(_._2).contains(103L) && rewritten.map(_._2).contains(203L))
      // pruning survives the append (bucketed files per append, same layout)
      val scanLine = appended.queryExecution.executedPlan.toString.linesIterator
        .find(_.contains("SelectedBucketsCount"))
      assert(scanLine.isDefined)
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(scanLine.get).get
      assert(m.group(1).toInt < m.group(2).toInt, scanLine.get)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_store_app")
      spark.sql("DROP TABLE IF EXISTS ivf_store_full")
    }
  }

  test("srpNearPairs with Rademacher planes finds planted near-duplicates") {
    // asymmetric components: a (0.5, 0.5, 0.5, 0.5)-style vector lands
    // exactly ON a +-1 hyperplane (dot = 0), where a 0.01 perturbation
    // flips the bucket bit — correct LSH behavior, wrong test fixture
    val planted = Seq(
      (1L, vec(0.6, 0.5, 0.4, 0.3)), (2L, vec(0.6, 0.5, 0.4, 0.29)), // near-dup pair
      (3L, vec(1.0, -1.0, 1.0, -1.0)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.srpNearPairs(planted, "vec_id", "embedding",
        numPlanes = 4, minCosine = 0.99, dim = 4,
        planesOverride = Some(Similarity.rademacherPlanes(4, 4)))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("k-means codebook plugs into ivfSearch with recall >= the fixed codebook") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val qs = emb.filter($"vec_id" < 20)
    val corp = emb.filter($"vec_id" >= 20)
    val brute = Similarity.cosineTopK(qs, corp, "vec_id", "embedding", 3)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallAt3(centroids: Seq[(Long, Seq[Double])]): Double = {
      val ivf = Similarity.ivfSearch(qs, corp, "vec_id", "embedding",
          centroids, nProbe = 2, k = 3)
        .select($"query_id", $"cand_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      brute.map { case (q, t) => ivf.getOrElse(q, Set.empty).count(t).toDouble / 3 }
        .sum / brute.size
    }
    // q53's deterministic stand-in codebook: the 8 lowest corpus vectors
    val fixed = corp.filter($"vec_id" < 28)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    val km = Similarity.kmeansCodebook(corp, "embedding", k = 8)
    assert(km.length == 8 && km.forall(_._2.length == 64))
    val (rKm, rFixed) = (recallAt3(km), recallAt3(fixed))
    assert(rKm >= rFixed, s"kmeans recall $rKm < fixed-codebook recall $rFixed")
    assert(rKm > 0.0)
  }

  test("srpNearPairs banding keeps recall; maxBucketSize drops degenerate buckets") {
    val planted = Seq(
      (1L, vec(0.6, 0.5, 0.4, 0.3)), (2L, vec(0.6, 0.5, 0.4, 0.29)),
      (3L, vec(1.0, -1.0, 1.0, -1.0)))
      .toDF("vec_id", "embedding")
    // banded (2 bands of 4 bits): the planted pair still surfaces — a pair
    // agreeing on ALL planes agrees on every band
    val banded = Similarity.srpNearPairs(planted, "vec_id", "embedding",
        numPlanes = 8, minCosine = 0.99, dim = 4, bands = 2,
        planesOverride = Some(Similarity.rademacherPlanes(8, 4)))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(banded == Set((1L, 2L)))
    // degenerate corpus: 20 identical vectors land in ONE bucket per band.
    // Cap below the bucket size -> no candidates (the B^2 blowup is refused);
    // cap above it -> all 190 pairs at cosine 1.0
    val dup = (0 until 20).map(i => (i.toLong, vec(0.6, 0.5, 0.4, 0.3)))
      .toDF("vec_id", "embedding")
    def run(cap: Int) = Similarity.srpNearPairs(dup, "vec_id", "embedding",
        numPlanes = 8, minCosine = 0.9, dim = 4, bands = 2, maxBucketSize = cap,
        planesOverride = Some(Similarity.rademacherPlanes(8, 4)))
      .as[(Long, Long, Double)].collect()
    assert(run(10).isEmpty)
    val all = run(20)
    assert(all.length == 190 && all.forall(_._3 == 1.0))
  }

  test("semanticNearPairs pairs only within centroid cells, above the threshold") {
    // corpus clusters around (1,0) and (0,1); cross-cluster cosines ~0,
    // within-cluster cosines ~1 — pairs must stay within cells
    val pairs = Similarity.semanticNearPairs(corpus, "vec_id", "embedding",
        centroids, minCosine = 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L), (100L, 102L), (101L, 102L),
      (200L, 201L), (200L, 202L), (201L, 202L)))
    // threshold excludes: cosine((1,0.05),(0.95,0.1)) ~ 0.997 but 0.9999
    // excludes everything except near-identical pairs
    val strict = Similarity.semanticNearPairs(corpus, "vec_id", "embedding",
        centroids, minCosine = 0.9999)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(strict.isEmpty)
    // degenerate cell guard: 20 identical vectors in one cell, cap below
    // the cell size -> refused, no pairs
    val dup = (0 until 20).map(i => (i.toLong, vec(0.6, 0.5, 0.4, 0.3)))
      .toDF("vec_id", "embedding")
    val capped = Similarity.semanticNearPairs(dup, "vec_id", "embedding",
      Seq((0L, Seq(0.6, 0.5, 0.4, 0.3)), (1L, Seq(-1.0, 0.0, 0.0, 0.0))),
      minCosine = 0.9, maxCellSize = 10)
    assert(capped.collect().isEmpty)
    // composed keep-list: clusters label components with the min id
    val keep = Dedup.duplicateClusters(
        corpus.select($"vec_id"), "vec_id",
        Similarity.semanticNearPairs(corpus, "vec_id", "embedding",
          centroids, minCosine = 0.9))
      .as[(Long, Long)].collect().toMap
    assert(keep == Map(100L -> 100L, 101L -> 100L, 102L -> 100L,
      200L -> 200L, 201L -> 200L, 202L -> 200L))
  }

  test("autoCodebook scales k with the corpus and bounds cell population") {
    // synthetic blob corpus: `nBlobs` tight clusters of 8 vectors each in
    // 4-d; near-dup pairs live strictly within a blob
    def blobs(nBlobs: Int): org.apache.spark.sql.DataFrame = {
      val rnd = new scala.util.Random(7)
      val centers = (0 until nBlobs).map(_ => Seq.fill(4)(rnd.nextGaussian()))
      centers.zipWithIndex.flatMap { case (c, b) =>
        (0 until 8).map { j =>
          (b * 100L + j, c.map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
        }
      }.toDF("vec_id", "embedding")
    }
    val small = blobs(4)   //  32 vectors
    val large = blobs(16)  // 128 vectors
    // k tracks ceil(N / targetCellPop); the clamp engages at maxK
    assert(Similarity.autoCodebook(small, "embedding", targetCellPop = 8).size == 4)
    assert(Similarity.autoCodebook(large, "embedding", targetCellPop = 8).size == 16)
    assert(Similarity.autoCodebook(large, "embedding", targetCellPop = 8,
      maxK = 5).size == 5)
    assert(Similarity.autoCodebook(large.limit(0), "embedding", 8).isEmpty)
    // at both scales every within-blob pair survives the celled search:
    // 8 vectors x C(8,2) = 28 pairs per blob, nothing cross-blob at 0.99
    for ((corp, nBlobs) <- Seq((small, 4), (large, 16))) {
      val pairs = Similarity.semanticNearPairsAuto(corp, "vec_id", "embedding",
          minCosine = 0.99, targetCellPop = 8)
        .select($"id_a", $"id_b").as[(Long, Long)].collect()
      assert(pairs.length == 28 * nBlobs, s"nBlobs=$nBlobs got ${pairs.length}")
      assert(pairs.forall { case (a, b) => a / 100 == b / 100 })
    }
    // the >maxFitRows path: a bounded deterministic sample still yields a
    // k-sized codebook and the same pair recall
    val sampled = Similarity.semanticNearPairsAuto(large, "vec_id", "embedding",
        minCosine = 0.99, targetCellPop = 8, maxFitRows = 64L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(sampled.length == 28 * 16)
  }

  private def probeRows(table: String, delta: Option[String] = None): Set[(Long, Long, Double, Long)] = {
    val out = delta match {
      case Some(p) => Similarity.ivfSearchFromStoreWithDeltas(spark, table, p,
        queries, "vec_id", "embedding", centroids, nProbe = 2, k = 10)
      case None => Similarity.ivfSearchFromStore(spark, table, queries,
        "vec_id", "embedding", centroids, nProbe = 2, k = 10)
    }
    out.select($"query_id", $"cand_id", $"cosine_sim", $"rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
  }

  test("IVF delta log: base+deltas equals a rebuilt store; fold is exactly-once under crash") {
    val base = corpus.filter($"vec_id" % 2 === 0)   // 100, 102, 200, 202
    val d0 = corpus.filter($"vec_id" === 101L)
    val d1 = corpus.filter($"vec_id" === 201L)
    Similarity.writeIvfStore(corpus, "vec_id", "embedding", centroids,
      "ivf_delta_reb", numBuckets = 4)
    val rebuilt = probeRows("ivf_delta_reb")
    for (step <- Seq(1, 2)) {
      val delta = java.nio.file.Files.createTempDirectory(s"ivf_delta$step").toString
      Similarity.writeIvfStore(base, "vec_id", "embedding", centroids,
        "ivf_delta_t", numBuckets = 4)
      Similarity.writeIvfDeltaBatch(d0, "vec_id", "embedding", centroids, delta, 0L)
      Similarity.writeIvfDeltaBatch(d1, "vec_id", "embedding", centroids, delta, 1L)
      // delta-union reads equal the one-shot rebuild
      assert(probeRows("ivf_delta_t", Some(delta)) == rebuilt, s"step=$step union")
      // crash the fold at each step boundary, then recover by re-running:
      // the provenance guard must yield NO duplicate candidates and NO loss
      val e = intercept[RuntimeException] {
        Similarity.compactIvfDeltaImpl(spark, "ivf_delta_t", delta,
          numBuckets = 4, maxBatchExclusive = 2L, crashAfterStep = step)
      }
      assert(e.getMessage.contains(s"step $step"))
      // a crash after the sweep leaves nothing to fold on re-run (0);
      // a crash after the append re-runs to a pure cleanup pass (2)
      assert(Similarity.compactIvfDelta(spark, "ivf_delta_t", delta,
        numBuckets = 4, maxBatchExclusive = 2L) == (if (step == 1) 2 else 0))
      val folded = probeRows("ivf_delta_t")
      assert(folded == rebuilt, s"step=$step folded")
      // duplicate-candidate check, independent of the equality above
      val perQuery = folded.toSeq.groupBy(_._1).view
        .mapValues(_.map(_._2)).toMap
      perQuery.foreach { case (q, cands) =>
        assert(cands.distinct.size == cands.size, s"step=$step dup for query $q")
      }
      assert(Similarity.compactIvfDelta(spark, "ivf_delta_t", delta,
        numBuckets = 4, maxBatchExclusive = 10L) == 0, s"step=$step residue")
      spark.sql("DROP TABLE IF EXISTS ivf_delta_t")
    }
    spark.sql("DROP TABLE IF EXISTS ivf_delta_reb")
  }
}
