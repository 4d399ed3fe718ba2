package graft

import org.apache.spark.sql.DataFrame

/** Regression guards for the scale-critical physical-plan shapes documented
  * in PLANS.md — a future change that silently degrades one of these (a
  * filter that stops pushing, a top-k that becomes a global sort, a kernel
  * that falls out of the scan stage) fails here, not at 100 TB. */
class PlanShapeSpec extends SparkTestBase {

  private val sf = sf0001
  private def plan(q: String): String = {
    val df: DataFrame = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q24_global_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("per-group top-k gets rank-limit pushdown (WindowGroupLimit)") {
    val p = plan("q18_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("comparison filter reaches the parquet scan and prunes columns") {
    val p = plan("q02_filter_compare")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan"), p)
    assert(!p.contains("l_comment"), "scan should not read unprojected columns")
  }

  test("dimension joins broadcast (no shuffle of the fact side for dims)") {
    val p = plan("q20_join_revenue_per_nation")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("sketch kernels stay scan-side: no exchange before the simhash map") {
    val p = plan("q44_simhash")
    assert(p.contains("graft_simhash"), p)
    // single-split local input triggers the Layout.spread repartition; the
    // kernel projection must sit directly on that (or the scan) — not
    // behind any aggregation exchange
    assert(!p.contains("HashAggregate"), p)
  }

  test("ANN rank paths use the bounded TopK aggregate, not a window") {
    // a row_number window on the scored product would exchange every
    // (query, candidate) row and cap parallelism at |queries|; the bounded
    // TopK aggregator partial-aggregates map-side instead
    for (q <- Seq("q48_cosine_topk", "q53_ivf_ann")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q plans a window:\n$p")
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
        s"$q missing the TopK aggregate:\n$p")
    }
  }

  test("decontamination broadcasts the benchmark set; corpus side never shuffles pre-join") {
    val p = plan("q59_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus side must not sort-merge:\n$p")
  }

  test("segment dedup's count window reuses its own repartition exchange") {
    val p = plan("q60_segment_dedup")
    val segHashExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("seg_hash"))
      .size
    assert(segHashExchanges == 1,
      s"expected exactly 1 seg_hash exchange (window must reuse it), got $segHashExchanges:\n$p")
  }

  test("sequence packing exchanges only the pack group") {
    val p = plan("q61_pack_sequences")
    val hashExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    // Layout.spread's doc_id repartition is the single-split parallelizer
    // (a no-op on real multi-split inputs); beyond it, only the pack_group
    // window exchange may appear
    assert(hashExchanges.nonEmpty &&
      hashExchanges.forall(l => l.contains("pack_group") || l.contains("doc_id")),
      s"only the pack_group window exchange (+ spread) expected:\n${hashExchanges.mkString("\n")}")
    assert(hashExchanges.exists(_.contains("pack_group")), p)
  }

  test("PII redaction is a pure narrow map (no hash exchange)") {
    val p = plan("q62_pii_redact")
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("exact dedup shuffles the md5 digest, not document text") {
    val p = plan("q40_dedup_exact")
    val exchangeLines = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchangeLines.exists(_.contains("text_hash")), exchangeLines.mkString("\n"))
    assert(!exchangeLines.exists(_.contains("text#")), exchangeLines.mkString("\n"))
  }

  test("as-of join plans no join operator and pushes the event-type filters") {
    val p = plan("q63_asof_join")
    assert(!p.contains("Join"), s"asof must be the union+window form, not a join:\n$p")
    assert(p.contains("EqualTo(event_type,purchase)") ||
      p.contains("event_type), EqualTo"), s"event_type filter must push to the scan:\n$p")
  }

  test("interval pairs plan an equi-join on the bin key, never a nested loop") {
    val p = plan("q64_interval_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range predicate must ride the bin equi-join, not a cross product:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("vocabulary top-k is TakeOrderedAndProject over the term aggregate") {
    val p = plan("q66_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    // partial aggregation combines map-side before the term exchange
    assert(p.contains("HashAggregate"), p)
  }

  test("int8 quantization is a pure narrow map (no exchange at all)") {
    val p = plan("q67_quantize_int8")
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("pivot is one hash aggregation — no distinct-collect pre-pass, no window") {
    val p = plan("q74_pivot")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
    // conditional aggregation: exactly one exchange (the day-key agg; the
    // key shows as Spark's internal _groupingexpression alias) — the
    // built-in .pivot() would plan two
    val hashExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashExchanges.size == 1,
      s"expected exactly one exchange:\n${hashExchanges.mkString("\n")}")
  }

  test("z-score broadcasts the group stats back — fact rows never re-partition") {
    val p = plan("q77_zscore")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), s"stats must be two-pass, not a whole-partition window:\n$p")
  }

  test("label centroids partial-aggregate map-side (VectorSum, no posexplode shuffle)") {
    val p = plan("q79_label_centroids")
    // the aggregation exchange must carry the label key only — a
    // (label, dim) exchange would mean the posexplode-then-agg shape that
    // shuffles d rows per vector
    val aggExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(aggExchanges.exists(l => l.contains("label") && !l.contains("dim_idx")),
      s"expected the VectorSum agg exchange on label only:\n${aggExchanges.mkString("\n")}")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("resample shuffles the event log once; the grid explode runs on the extent frame") {
    val p = plan("q81_resample")
    // both consumers (grid extent + gap-fill join) read the persisted
    // per-(key, bin) aggregate — the event log is scanned once, into the
    // cache build. (A textual FileScan count would double-count: the
    // cached relation's plan is PRINTED under every InMemoryTableScan.)
    val cacheReads = p.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(cacheReads >= 2, s"expected both branches on the cached perBin:\n$p")
    assert(p.contains("Generate explode(sequence"), p)
    spark.catalog.clearCache()
  }

  test("full-outer cohort join aggregates BOTH sides before joining") {
    val p = plan("q82_full_outer")
    val joinLine = p.linesIterator.indexWhere(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(joinLine >= 0, s"no join operator found (guard would be vacuous):\n$p")
    assert(p.contains("FullOuter"), p)
    // every HashAggregate pair sits BELOW the join (inputs pre-aggregated
    // to user cardinality); no aggregate above it
    val lines = p.linesIterator.toSeq
    val aggIdxs = lines.zipWithIndex.collect {
      case (l, i) if l.contains("HashAggregate") => i }
    assert(aggIdxs.nonEmpty && aggIdxs.forall(_ > joinLine),
      s"aggregates must be below (after) the outer join in the tree:\n$p")
  }

  test("observed funnel keeps CollectMetrics below the survivor filter (counts see all rows)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val labeled = docs.withColumn("drop_stage",
      when(col("doc_id") % 2 === 0, "quality"))
    val (framed, _) = graft.ops.CorpusPipeline.observed(labeled)
    val survivors = framed.filter(col("drop_stage").isNull)
    val opt = survivors.queryExecution.optimizedPlan.toString
    // the Filter must sit ABOVE CollectMetrics — pushdown through it would
    // make the funnel count only survivors
    val filterIdx = opt.linesIterator.indexWhere(_.contains("Filter"))
    val metricsIdx = opt.linesIterator.indexWhere(_.contains("CollectMetrics"))
    assert(metricsIdx >= 0, opt)
    assert(filterIdx >= 0 && filterIdx < metricsIdx,
      s"filter was pushed below CollectMetrics:\n$opt")
  }

  test("cluster-survivor selection aggregates, never windows over the corpus") {
    import org.apache.spark.sql.functions._
    // isolate the rep-selection stage (q103 minus the iterative clustering,
    // whose jobs run eagerly and hide the stage under test)
    val labels = Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), (col("doc_id") % 7).as("cluster_id"))
    val p = graft.ops.Dedup.clusterRepresentatives(
      Tables.documents(spark, sf), "doc_id", labels,
      col("n_chars").cast("long")).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"rep selection must not plan a window:\n$p")
    assert(p.contains("partial_max") || p.contains("partial max"),
      s"argmax must partial-aggregate map-side:\n$p")
  }

  test("repeated-span detection: kernel in the scan stage, two narrow-key exchanges") {
    import org.apache.spark.sql.functions._
    val p = graft.ops.Dedup.repeatedSpans(
      Tables.documents(spark, sf), "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    // positional kernel runs in the same stage as the scan (no exchange
    // between Scan and Generate), and text never shuffles: the only
    // exchanges carry (doc_id, pos, g)
    assert(p.contains("graft_shingle_hash_seq"), p)
    val exchanges = p.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("Reused")).toSeq
    assert(exchanges.size == 2, s"want gram + doc_id exchanges only:\n$p")
    assert(!exchanges.exists(_.contains("text")),
      s"document text must not cross the wire:\n$p")
  }

  test("batched BM25 probes bucket-pruned postings and ranks without a window") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.ops.Terms.writeBm25Store(Tables.documents(spark, sf), "doc_id",
      "text", "psspec_bm25", numBuckets = 8)
    try {
      val workload = Seq((0L, "vector"), (1L, "data")).toDF("query_id", "term")
      val p = graft.ops.Terms.bm25BatchSearchFromStore(spark, "psspec_bm25",
        workload, k = 5).queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount"), s"postings scan must bucket-prune:\n$p")
      assert(!p.contains("Window"), s"per-query top-k must be the bounded TopK:\n$p")
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    } finally {
      spark.sql("DROP TABLE IF EXISTS psspec_bm25")
      spark.sql("DROP TABLE IF EXISTS psspec_bm25_stats")
    }
  }

  test("keep-first span detection shares the repeat marker's single gram exchange") {
    val p = graft.ops.Dedup.repeatedSpansKeepFirst(
      Tables.documents(spark, sf), "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    // the ordered row_number must ride the SAME gram-keyed exchange the
    // occurrence count uses — still exactly two exchanges, no text
    val exchanges = p.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("Reused")).toSeq
    assert(exchanges.size == 2, s"want gram + doc_id exchanges only:\n$p")
    assert(!exchanges.exists(_.contains("text")),
      s"document text must not cross the wire:\n$p")
  }

  test("fuzzy decontamination broadcasts the benchmark bands; corpus shuffles only candidates") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val p = graft.ops.Dedup.fuzzyDecontaminate(
        docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"bench side must broadcast:\n$p")
    // every exchange sits ABOVE the broadcast join (candidate pairs), so
    // none may carry the corpus text or its signature band explosion
    assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text")),
      s"corpus text must not cross the wire:\n$p")
  }

  test("span cut is one keyed join, no explode of the corpus") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val p = graft.ops.Dedup.cutSpans(docs, "doc_id", "text",
        graft.ops.Dedup.repeatedSpans(docs, "doc_id", "text", 8))
      .queryExecution.executedPlan.toString
    // the cut itself is an array filter/exists projection — the only
    // Generate in the plan belongs to the span DETECTOR subtree
    assert(p.linesIterator.count(_.matches(".*\\bGenerate (pos)?explode.*")) == 1, p)
  }

  test("PCA projection is a narrow literal-dot map: no shuffle, no window") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val model = graft.ops.Projection.fitPca(emb, "embedding", dim = 64, k = 2)
    val p = graft.ops.Projection.projectPca(emb, "embedding", model, Seq("x", "y"))
      .queryExecution.executedPlan.toString
    // the projection itself (fit already done) must be scan + project only
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("quantized IVF store carries tinyint codes and the probe bucket-prunes") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(col("vec_id") >= 20).select(col("vec_id"), col("embedding"))
    val codebook = corpus.filter(col("vec_id") < 28).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    graft.ops.Similarity.writeQuantizedIvfStore(corpus, "vec_id", "embedding",
      codebook, "plan_qivf", numBuckets = codebook.size)
    try {
      assert(spark.table("plan_qivf").schema("codes").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
        org.apache.spark.sql.types.ByteType)
      val p = graft.ops.Similarity.quantizedIvfSearchFromStore(spark, "plan_qivf",
          corpus, emb.filter(col("vec_id") < 20).select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", codebook, nProbe = 2, k = 3, rerankK = 6)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount"), p)
    } finally spark.sql("DROP TABLE IF EXISTS plan_qivf")
  }

  test("BM25 prunes to query terms before any aggregation; top-k avoids a global sort") {
    val p = plan("q116_bm25_search")
    // the isin prune must sit scan-side, BELOW the tf aggregate: the only
    // rows entering any exchange are (doc, query-term) instances
    assert(p.contains("TakeOrderedAndProject"), p)
    val aggExchanges = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning")).toSeq
    // tf (doc_id, term), df (term), score (doc_id), + docLen side reuse —
    // none of them may carry the text column
    assert(!aggExchanges.exists(_.contains("text")),
      s"corpus text must not cross the wire:\n$p")
    assert(p.contains("vector"), "query-term literals should appear in the plan")
  }

  test("shard manifest is one aggregation with a map-side partial") {
    val p = plan("q104_shard_manifest")
    // one exchange pair: partial aggregate -> shuffle on shard -> final
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused") && !l.contains("Broadcast"))
    assert(exchanges <= 2, // shard hash + the orderBy range exchange
      s"manifest should shuffle only nShards rows (+ final sort):\n$p")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"manifest aggregate must partial-combine map-side:\n$p")
  }

  test("group sample ranks via the bounded TopK aggregate, never a corpus window") {
    val p = plan("q119_group_sample")
    assert(!p.contains("Window"), s"groupSample must not plan a window:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the bounded TopK aggregate:\n$p")
  }

  test("z-order key is a narrow map over the scan plus a broadcast min/max") {
    val p = plan("q120_zorder_key")
    // the only corpus-sized exchange is the final orderBy's range
    // partitioning — binning + interleave must not shuffle the corpus
    // (the min/max aggregate's SinglePartition exchange carries one row)
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused") &&
        !l.contains("Broadcast") && !l.contains("SinglePartition"))
    assert(exchanges <= 1, s"z-key computation must stay narrow:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row min/max frame should broadcast:\n$p")
  }

  test("hot/cold split join plans a broadcast branch beside the shuffle join") {
    val p = plan("q121_hot_split_join")
    assert(p.contains("BroadcastHashJoin"),
      s"hot branch must broadcast the right slice:\n$p")
    assert(p.contains("Union"), s"expected the hot/cold union:\n$p")
  }

  test("PQ ADC ranks via the bounded TopK aggregate; codes never window") {
    val p = plan("q122_pq_ann")
    assert(!p.contains("Window"), s"PQ rank paths must not plan a window:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the bounded TopK aggregate:\n$p")
  }

  test("brand-affinity pair mining: no self-join, pairs explode map-side") {
    val p = plan("q95_brand_affinity")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"pair mining must not shuffle-join the order-brand table:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim must broadcast:\n$p")
    assert(p.linesIterator.count(_.contains("Generate")) >= 2,
      s"expected the double posexplode pair generation:\n$p")
  }

  test("cross-source overlap: one gram-keyed aggregation, no join at all") {
    val p = plan("q108_source_overlap")
    assert(!p.contains("Join"), s"overlap matrix must not plan any join:\n$p")
    // the only wide exchange carries gram digests; pair agg keys are
    // bounded by sources^2 (both hashpartitioning exchanges present)
    assert(p.contains("collect_set"), s"expected the per-gram source set:\n$p")
  }

  test("greedy packing shuffles 4 longs per doc on shard, never text") {
    val p = plan("q145_seq_pack")
    val hashExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashExchanges.nonEmpty && hashExchanges.forall(_.contains("shard")),
      s"the one hash exchange must be the shard repartition:\n${hashExchanges.mkString("\n")}")
    assert(!hashExchanges.exists(_.contains("text#")),
      s"document text must be projected away before the shuffle:\n${hashExchanges.mkString("\n")}")
  }

  test("k-means sweep: map-side partial vector sums, one exchange on cell") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val cents = graft.ops.Cluster.initCentroids(emb, "vec_id", "embedding",
      k = 4, scale = 10000L)
    val vecSum = org.apache.spark.sql.functions.udaf(
      new graft.ops.Aggregators.LongVectorSum(cents.head._2.length))
    val sweep = emb
      .select(col("vec_id"),
        graft.ops.Cluster.quantized(col("embedding"), 10000L).as("qv"))
      .withColumn("cell", graft.ops.Similarity.nearestCell(
        col("qv").cast("array<double>"), cents))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), vecSum(col("qv")).as("s"))
    val p = sweep.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("cell")),
      s"the only exchange is the k-row cell merge:\n${exchanges.mkString("\n")}")
    // partial aggregation BEFORE the exchange — the shuffle carries one
    // k x (d+1) buffer set per partition, not one row per vector
    assert(p.contains("partial_longvectorsum") ||
      p.toLowerCase.contains("partial"), s"expected map-side partials:\n$p")
  }

  test("popularity baseline: candidate pool broadcasts, no cartesian over the catalog") {
    val p = plan("q179_pop_baseline")
    // the per-user candidate leg is users x BROADCAST pool; a cartesian or
    // a shuffled nested loop over the catalog is the scale failure
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"pool must broadcast:\n$p")
  }

  test("userKNN small-cohort mode broadcasts the similarity matrix and norms") {
    val p = plan("q184_userknn_recs")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), s"sim/norm frames must broadcast:\n$p")
  }

  test("rank metrics add no catalog-sized leg: one user-keyed aggregate after the hits join") {
    val p = plan("q177_rank_metrics")
    // the metric tail must not sort globally or window over the catalog;
    // the only window below the model subtree is the per-user hit index
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject") || !p.contains("GlobalLimit"), p)
  }

  test("markov serving: transition matrix broadcasts below the catalog threshold") {
    val p = plan("q189_markov_next_basket")
    // the serving join is last-basket x truncated transitions: small
    // catalogs must broadcast the matrix; a cartesian or a
    // catalog-unbounded leg is the scale failure
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"),
      s"truncated transition matrix must broadcast:\n$p")
  }

  test("rrf fusion adds only the (u,i) fold and the per-user top-k window") {
    val p = plan("q186_rrf_hybrid")
    assert(!p.contains("CartesianProduct"), p)
    // the fusion tail runs on materialized |users|*k rec frames: both
    // model subtrees must read from the cache, not rebuild the co-walk
    val scans = p.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(scans >= 2, s"fusion must read the persisted rec frames:\n$p")
  }

  test("ALS half-sweep under co-location + broadcast runs with ZERO exchange") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the trainTraced fast path: ratings pre-partitioned by the sweep's
    // entity key, factor frames broadcast — the whole join + Gramian
    // aggregation must reuse that partitioning (alias-aware), so the
    // executed plan contains NO shuffle exchange at all (measured: this
    // is what turns the 25M-rating sweep from 14 GB shuffle + 4.3 GB
    // spill into 0.7 GB one-time / zero spill — ALS_BENCH.json)
    // persist + force the pre-partitioned frame (as trainTraced does) so
    // the sweep plan reads the cached layout — the one-time repartition
    // exchange lives in the cached subtree, not in the per-sweep plan
    val ratings = (1 to 60).map(i => (i % 12, i % 7, (i % 9 + 1) * 0.5))
      .toDF("u", "m", "r")
      .repartition(col("u"))
      .persist()
    ratings.count()
    val p = graft.model.AlsBias.Params(rank = 3, maxIter = 1, tol = 0.0)
    val users = graft.model.AlsBias.initFactors(ratings, "u", p, 1L)
      .localCheckpoint()
    val items = graft.model.AlsBias.initFactors(ratings, "m", p, 2L)
      .localCheckpoint()
    val sweep = graft.model.AlsBias.halfSweep(ratings, users, items,
      "u", "m", "r", p, broadcastOther = true, broadcastSelf = true)
    sweep.collect() // force AQE to finalize the executed plan
    val plan = sweep.queryExecution.executedPlan.toString
    // REPARTITION_BY_COL lines are the one-time cached layout echoed
    // inside the InMemoryRelation's stored plan — they do not re-execute;
    // any ENSURE_REQUIREMENTS hash exchange would be a real per-sweep
    // shuffle the planner added because co-location failed to propagate
    val shuffles = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filterNot(_.contains("REPARTITION_BY_COL")).toSeq
    assert(shuffles.isEmpty,
      s"co-located broadcast sweep must be exchange-free:\n${shuffles.mkString("\n")}")
    spark.catalog.clearCache()
  }

  test("ALS above-threshold sweeps: neither mid nor routed huge mode ever exchanges the fact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // walk the adaptive executed plan, descending into materialized query
    // stages, so exchange ancestry is checked on the REAL tree (the
    // string form hides stage nesting)
    def expand(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => expand(q.plan)
      case other => other.children.flatMap(expand)
    })
    def nodeIs(p: SparkPlan, name: String) = p.getClass.getSimpleName.contains(name)
    // ancestry walk that stops at aggregates: an exchange above a PARTIAL
    // aggregate carries one packed buffer per (entity, partition) — the
    // mode's intended entity-sized movement — never raw fact rows, so an
    // aggregate node clears the fact from the exchange's cargo
    def expandBelowAgg(p: SparkPlan): Seq[SparkPlan] =
      if (nodeIs(p, "Aggregate")) Seq(p)
      else p +: (p match {
        case a: AdaptiveSparkPlanExec => expandBelowAgg(a.executedPlan)
        case q: QueryStageExec => expandBelowAgg(q.plan)
        case other => other.children.flatMap(expandBelowAgg)
      })
    // the production recommender shape: users ABOVE the threshold, items
    // below — ONE fact copy partitioned by the big side (user) serves
    // both sweeps (AlsBias.sweepPlans mid mode); neither sweep may put a
    // shuffle exchange anywhere above the cached ratings scan — only
    // entity-sized factor frames move (the round-11 measured
    // scale-killer: the old fallback re-shuffled the 25M-row fact twice
    // per half-sweep, 14-37 GB + 4.3 GB spill)
    // at probe scale AQE would auto-broadcast the 400-row fact and flip
    // the join build side — a shape that cannot occur at the mode's real
    // scale (the fact is the 100 TB side); pin the at-scale planner by
    // allowing only EXPLICIT broadcast hints for the test's duration
    val abKeys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = (abKeys :+ "spark.sql.requireAllClusterKeysForCoPartition")
      .map(k => k -> spark.conf.getOption(k))
    abKeys.foreach(spark.conf.set(_, "-1"))
    try {
    val ratings = (1 to 400).map(i => (i % 40, i % 7, (i % 9 + 1) * 0.5))
      .toDF("u", "m", "r")
      .repartition(col("u"))
      .persist()
    ratings.count()
    val p = graft.model.AlsBias.Params(rank = 3, maxIter = 1, tol = 0.0,
      broadcastEntities = 10) // 40 users > 10 >= 7 items
    val users = graft.model.AlsBias.initFactors(ratings, "u", p, 1L).localCheckpoint()
    val items = graft.model.AlsBias.initFactors(ratings, "m", p, 2L).localCheckpoint()
    // big-side sweep: small factors broadcast, the grouped aggregation
    // rides the fact partitioning; small-side sweep: the fact is already
    // partitioned by the join key, so only the big factor frame shuffles
    val userSweep = graft.model.AlsBias.halfSweep(ratings, users, items,
      "u", "m", "r", p, broadcastOther = true, broadcastSelf = false)
    val itemSweep = graft.model.AlsBias.halfSweep(ratings, items, users,
      "m", "u", "r", p, broadcastOther = false, broadcastSelf = true)
    for ((sweep, tag) <- Seq((userSweep, "user(big)"), (itemSweep, "item(small)"))) {
      sweep.collect()
      val nodes = expand(sweep.queryExecution.executedPlan)
      val badExchanges = nodes
        .filter(nodeIs(_, "ShuffleExchange"))
        .filter(e => expandBelowAgg(e).exists(nodeIs(_, "InMemoryTableScan")))
      assert(nodes.exists(nodeIs(_, "InMemoryTableScan")),
        s"$tag sweep must read the cached fact")
      assert(badExchanges.isEmpty,
        s"$tag sweep re-shuffles the ratings fact:\n${badExchanges.mkString("\n")}")
    }
    // the small-side sweep DOES shuffle the big factor frame — the plan
    // has exchanges, just none over the fact (guards the guard)
    itemSweep.collect()
    assert(expand(itemSweep.queryExecution.executedPlan)
      .exists(nodeIs(_, "ShuffleExchange")),
      "item sweep should shuffle the (entity-sized) big factor frame")
    // HUGE mode (both sides above the threshold): ROUTED-FACTOR sweeps.
    // The fact sits on a self-derived bucket layout and NEVER moves —
    // other-side factor rows route onto it via the once-per-training
    // (other-id, bucket) table, the join runs subset-key co-partitioned
    // on (bucket, oid), and the aggregation rides the bucket layout via
    // groupBy(bucket, self). ANY fact-rooted exchange = the pre-round-13
    // repartition-by-self fallback (or worse) crept back in. Mirrors
    // AlsBias.sweepPlans' huge branch, with the routing table
    // lineage-truncated (localCheckpoint) instead of cached so the
    // fact-below-exchange walk can't mistake the routing cache's scan
    // for the fact's.
    val bCount = 64
    val byBucket = (1 to 400).map(i => (i % 40, i % 7, (i % 9 + 1) * 0.5))
      .toDF("u", "m", "r")
      .withColumn(graft.model.AlsBias.BucketCol,
        pmod(hash(col("u")), lit(bCount)))
      .repartition(col(graft.model.AlsBias.BucketCol))
      .persist()
    byBucket.count()
    val routing = byBucket.select(col("m"), col(graft.model.AlsBias.BucketCol))
      .distinct().repartition(col("m")).localCheckpoint()
    // the subset-key co-partition the production trainer scopes via
    // withTrainingConfs — without it the planner re-shuffles BOTH join
    // sides on the full (bucket, oid) key set, i.e. moves the fact
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val hugeSweep = graft.model.AlsBias.halfSweep(byBucket, users, items,
      "u", "m", "r", p, broadcastOther = false, broadcastSelf = false,
      routing = Some(routing))
    hugeSweep.collect()
    val hugeFactExchanges = expand(hugeSweep.queryExecution.executedPlan)
      .filter(nodeIs(_, "ShuffleExchange"))
      .filter(e => expandBelowAgg(e).exists(nodeIs(_, "InMemoryTableScan")))
    assert(hugeFactExchanges.isEmpty,
      s"routed huge-mode sweep must NEVER move the fact, found " +
        s"${hugeFactExchanges.size}:\n" + hugeFactExchanges.mkString("\n"))
    // the routed plan DOES move the factor frame + its routed copies —
    // exchanges exist, just none fact-rooted (guards the guard)
    assert(expand(hugeSweep.queryExecution.executedPlan)
      .exists(nodeIs(_, "ShuffleExchange")),
      "routed sweep should shuffle the (factor-sized) routed copies")
    // and the routed plan is numerically the plain plan: same sweep on
    // the same inputs through the non-routed path, compared exactly
    val plainSweep = graft.model.AlsBias.halfSweep(ratings, users, items,
      "u", "m", "r", p, broadcastOther = false, broadcastSelf = false)
    val routedRows = hugeSweep.orderBy("id").collect()
    val plainRows = plainSweep.orderBy("id").collect()
    assert(routedRows.length == plainRows.length)
    routedRows.zip(plainRows).foreach { case (a, b) =>
      assert(a.getInt(0) == b.getInt(0))
      val fa = a.getSeq[Double](1); val fb = b.getSeq[Double](1)
      fa.zip(fb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9,
        s"factor mismatch at id ${a.getInt(0)}: $x vs $y") }
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-9)
    }
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.catalog.clearCache()
    }
  }

  test("digest-store probe: store side distincts on its bucket layout, no store exchange") {
    val q = "q146_digest_store"
    val p = plan(q) // builds the store, returns the probe
    val hashExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    // batch-side exchanges key on text_hash/doc_id; a store-side exchange
    // would key on the renamed column h
    assert(!hashExchanges.exists(_.contains("(h#")),
      s"store-side distinct must ride the bucketed layout:\n${hashExchanges.mkString("\n")}")
    assert(!hashExchanges.exists(_.contains("text#")),
      s"raw text never shuffles:\n${hashExchanges.mkString("\n")}")
  }
}
