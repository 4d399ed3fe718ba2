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

  test("LSH signature store: exchange-free bucket join, same candidates") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then some more text"),
      (2L, "the quick brown fox jumps over the lazy dog and then some more text"),
      (3L, "the quick brown fox jumps over the lazy cat and then some more text"),
      (4L, "completely different content about distributed query engines at scale"),
      (5L, "yet another unrelated document talking about streaming watermarks"))
      .toDF("doc_id", "text")
    Dedup.writeLshSignatureStore(docs, "doc_id", "text", "lsh_store", numBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the plan shows the AT-SCALE shape (at corpus
      // scale the store is far beyond any broadcast threshold): the bucket
      // prune window and the band self-join are co-located — the ONLY
      // shuffle left is the final pair-dedup aggregation
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fromStore = Dedup.minHashLshCandidatesFromStore(spark, "lsh_store")
      val exchanges = fromStore.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
      assert(exchanges == 1, fromStore.queryExecution.executedPlan.toString)
      val direct = Dedup.minHashLshCandidates(docs, "doc_id", "text")
        .select("id_a", "id_b", "est_sim").as[(Long, Long, Double)].collect().toSet
      val stored = fromStore
        .select("id_a", "id_b", "est_sim").as[(Long, Long, Double)].collect().toSet
      assert(stored == direct)
      assert(stored.exists { case (a, b, s) => a == 1L && b == 2L && s == 1.0 })
      // est_sim denominator comes from the STORED signature length: a store
      // written with numHashes=32 still reports exact dups at 1.0
      Dedup.writeLshSignatureStore(docs, "doc_id", "text", "lsh_store32",
        numHashes = 32, bands = 8, numBuckets = 4)
      val stored32 = Dedup.minHashLshCandidatesFromStore(spark, "lsh_store32")
        .select("id_a", "id_b", "est_sim").as[(Long, Long, Double)].collect()
      assert(stored32.exists { case (a, b, s) => a == 1L && b == 2L && s == 1.0 },
        stored32.mkString(", "))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS lsh_store")
      spark.sql("DROP TABLE IF EXISTS lsh_store32")
    }
  }

  test("LSH store append + probe: incremental dedup without re-signing the corpus") {
    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then some more text"),
      (2L, "completely different content about distributed query engines at scale"))
      .toDF("doc_id", "text")
    val batch2 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and then some more text"), // dup of 1
      (11L, "yet another unrelated document talking about streaming watermarks"))
      .toDF("doc_id", "text")
    Dedup.writeLshSignatureStore(batch1, "doc_id", "text", "lsh_inc", numBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // probe BEFORE appending: batch2 vs the existing corpus only
      val probed = Dedup.lshProbeStore(spark, "lsh_inc", batch2, "doc_id", "text")
        .as[(Long, Long, Double)].collect().toSet
      assert(probed == Set((10L, 1L, 1.0))) // the dup found; 11 matches nothing
      // store side reads bucketed (its scan feeds the join sort directly,
      // no exchange); the probe side pays its band shuffle + the
      // Layout.spread single-split repartition (a local-input artifact),
      // and the pair aggregation pays the third — so <= 3 total, with the
      // store scan explicitly bucketed
      val p = Dedup.lshProbeStore(spark, "lsh_inc", batch2, "doc_id", "text")
        .queryExecution.executedPlan.toString
      val exchanges = p.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("BroadcastExchange") &&
          !l.contains("ReusedExchange"))
      assert(exchanges <= 3, p)
      assert(p.contains("Bucketed: true"), s"store scan must be bucketed:\n$p")

      // append batch2: candidates over the grown store == one-shot store
      // over the full corpus
      Dedup.appendToLshSignatureStore(batch2, "doc_id", "text", "lsh_inc",
        numBuckets = 4)
      val incremental = Dedup.minHashLshCandidatesFromStore(spark, "lsh_inc")
        .as[(Long, Long, Double)].collect().toSet
      Dedup.writeLshSignatureStore(batch1.unionByName(batch2), "doc_id", "text",
        "lsh_full", numBuckets = 4)
      val oneShot = Dedup.minHashLshCandidatesFromStore(spark, "lsh_full")
        .as[(Long, Long, Double)].collect().toSet
      assert(incremental == oneShot)
      assert(incremental.contains((1L, 10L, 1.0)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS lsh_inc")
      spark.sql("DROP TABLE IF EXISTS lsh_full")
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
    // content-derived salt: hot-key rows spread over many sub-keys, and
    // the assignment is identical on a different input partitioning
    val saltOf = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("__salt",
          pmod(xxhash64(lit(42L) +: df.columns.map(col): _*), lit(8)).cast("int"))
        .select("lv", "__salt").as[(String, Int)].collect().toMap
    val a = saltOf(left)
    val b = saltOf(left.repartition(13))
    assert(a == b) // partition-layout independent
    assert(a.filter(_._1.startsWith("hot")).values.toSet.size >= 4) // actually spreads
  }

  test("detectHotKeys finds exactly the >= support keys (false positives killed)") {
    // one key at 95%, one at ~3%, the rest singletons: support 0.05 must
    // return exactly the 95% key — the 3% key may be PROPOSED by
    // freqItems' one-sided sweep, but the exact pass filters it
    val df = ((0 until 9500).map(_ => 1L) ++ (0 until 300).map(_ => 2L) ++
      (0 until 200).map(i => i.toLong + 10)).toDF("k")
    val hot = ScaleJoins.detectHotKeys(df, "k", support = 0.05)
    assert(hot == Seq(1L))
    // no key reaches 96% — empty result, not an error (the 95% key is
    // proposed by the sweep, the exact pass rejects it)
    assert(ScaleJoins.detectHotKeys(df, "k", support = 0.96).isEmpty)
  }

  test("hotKeySplitJoin equals the plain join; hot side broadcasts, cold side shuffles") {
    val left = ((0 until 9500).map(i => (1L, s"hot$i")) ++
      (0 until 500).map(i => (i.toLong + 2, s"cold$i"))).toDF("k", "lv")
    val right = (0 until 600).map(i => (i.toLong, i * 10)).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(Long, String, Int)].collect().sorted.toSeq
    val hot = ScaleJoins.detectHotKeys(left, "k", support = 0.5)
    assert(hot == Seq(1L))
    val split = ScaleJoins.hotKeySplitJoin(left, right, "k", hot)
    val got = split.select("k", "lv", "rv")
      .as[(Long, String, Int)].collect().sorted.toSeq
    assert(got == plain && plain.nonEmpty)
    // plan shape: the hot branch is a broadcast join (hot rows never
    // shuffle); with no hot keys the call degrades to the plain join
    val planStr = split.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin"), s"no broadcast branch:\n$planStr")
    val degenerate = ScaleJoins.hotKeySplitJoin(left, right, "k", Nil)
      .select("k", "lv", "rv").as[(Long, String, Int)].collect().sorted.toSeq
    assert(degenerate == plain)
  }

  test("AQE splits a skewed join partition at runtime (the moderate-skew path)") {
    // salting is the explicit fallback for PATHOLOGICAL keys known in
    // advance (saltedJoin above); for moderate skew the engine relies on
    // AQE's OptimizeSkewedJoin — this pins that reliance to a real plan
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try {
      // one key carries ~95% of the left rows, with fat payloads so the
      // skewed partition crosses the byte threshold
      val pad = "x" * 200
      val left = ((0 until 20000).map(i => (1L, s"$pad$i")) ++
        (0 until 1000).map(i => (i.toLong + 2, s"c$i"))).toDF("k", "lv")
      val right = (0 until 1200).map(i => (i.toLong, i * 10)).toDF("k", "rv")
      val joined = left.join(right, Seq("k"))
      // materialize THIS DataFrame (count() would execute a separate
      // QueryExecution and leave this one's adaptive plan unfinalized)
      assert(joined.collect().length == 21000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the join skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
