package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog", "en", 43L),
    (2L, "The quick brown fox jumps over the lazy dog", "en", 43L), // exact dup of 1
    (3L, "The quick brown fox jumps over the lazy cat", "en", 43L), // near dup of 1
    (4L, "Completely different text about spark engines and shuffles here", "en", 63L),
    (5L, "the QUICK brown fox, jumps over the lazy dog!!", "en", 46L), // fingerprint-dup of 1
    (6L, "word", "en", 4L)) // shorter than one shingle
    .toDF("doc_id", "text", "lang", "n_chars")

  test("exactDupGroups groups identical texts and keeps min id") {
    val out = Dedup.exactDupGroups(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
    val dupGroup = out.filter(_._3 == 2)
    assert(dupGroup.length == 1 && dupGroup.head._2 == 1L)
    assert(out.map(_._3).sum == 6)
  }

  test("shingleRows matches the array-based shingles() semantics") {
    val viaRows = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().toSet
    val viaArray = docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("shingle"))
      .as[(Long, String)].collect().toSet
    assert(viaRows == viaArray)
    // short doc yields its single partial shingle
    assert(viaRows.filter(_._1 == 6L) == Set((6L, "word")))
  }

  test("minHashLshCandidates surfaces exact and near duplicates") {
    val cands = Dedup.minHashLshCandidates(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(cands.contains((1L, 2L)) && cands((1L, 2L)) == 1.0)
    assert(cands.contains((1L, 3L)) && cands((1L, 3L)) > 0.3)
    assert(!cands.contains((1L, 4L)) || cands((1L, 4L)) < 0.3)
  }

  test("minhash est_sim is deterministic across runs") {
    val a = Dedup.minHashLshCandidates(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val b = Dedup.minHashLshCandidates(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("simHash: identical texts equal, near-dups close, distinct texts far") {
    val hs = Dedup.simHash(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(hs(a) ^ hs(b))
    assert(ham(1L, 2L) == 0)
    assert(ham(1L, 3L) < ham(1L, 4L))
  }

  test("ngramJaccardPairs finds blocked near-dup pairs with exact jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        Seq(col("lang"), floor(col("n_chars") / 50.0).cast("long")), 3, 0.1)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((1L, 2L)) == 1.0)
    // doc1 vs doc3: 7 shingles each, 6 shared -> J = 6/8 = 0.75
    assert(math.abs(pairs((1L, 3L)) - 0.75) < 1e-9)
    assert(!pairs.contains((1L, 4L)))
  }

  test("ngramJaccardPairs: block-DF cap prunes a planted hot shingle") {
    // one block; 10 docs share a hot 5-token filler phrase (its 3 hot
    // shingles have block-DF 10) plus per-doc unique tails; docs 100/101 are
    // a true duplicate pair sharing only rare (DF 2) shingles
    val skewed = ((0 until 10).map { i =>
      (i.toLong, s"common filler phrase right here unique$i tail$i end$i", "en", 10L)
    } ++ Seq(
      (100L, "alpha beta gamma delta epsilon", "en", 10L),
      (101L, "alpha beta gamma delta epsilon", "en", 10L)))
      .toDF("doc_id", "text", "lang", "n_chars")
    def run(cap: Int) = Dedup.ngramJaccardPairs(skewed, "doc_id", "text",
        Seq(col("lang"), floor(col("n_chars") / 50.0).cast("long")), 3, 0.1, cap)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val unpruned = run(Int.MaxValue)
    // hot docs pair via the 3 shared hot shingles: J = 3/(6+6-3) = 1/3
    // (operator output is rounded to 6 decimals)
    assert(math.abs(unpruned((0L, 1L)) - 1.0 / 3) < 1e-6)
    assert(unpruned.size == 45 + 1)
    // default cap (500) far above every DF here: output EXACTLY unchanged
    assert(run(500) == unpruned)
    // cap 5 prunes the DF-10 hot shingles: the filler-only pairs vanish,
    // the rare-shingle duplicate pair survives with exact Jaccard
    val pruned = run(5)
    assert(pruned == Map((100L, 101L) -> 1.0))
  }

  test("simHashNearPairs: exact duplicates pair at distance 0, cap refuses blowup") {
    val pairs = Dedup.simHashNearPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((1L, 2L)) == 0) // identical texts
    assert(pairs.values.forall(_ <= 3))
    // every reported pair must satisfy the exact distance on the raw hashes
    val hs = Dedup.simHash(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    pairs.foreach { case ((a, b), d) =>
      assert(java.lang.Long.bitCount(hs(a) ^ hs(b)) == d)
    }
    // degenerate corpus (all identical): every chunk bucket holds all docs;
    // a cap below the corpus size refuses the B^2 blowup
    val dup = (0 until 12).map(i => (i.toLong, "same text every time", "en", 20L))
      .toDF("doc_id", "text", "lang", "n_chars")
    assert(Dedup.simHashNearPairs(dup, "doc_id", "text", 3, maxBucketSize = 5)
      .count() == 0)
    assert(Dedup.simHashNearPairs(dup, "doc_id", "text", 3, maxBucketSize = 20)
      .count() == 12L * 11 / 2)
  }

  test("simHash chunk split covers all 62 bits with non-empty chunks") {
    for (chunks <- 1 to 62) {
      val ranges = Dedup.chunkRanges(chunks)
      assert(ranges.length == chunks)
      assert(ranges.forall(_._2 >= 1), s"empty chunk at chunks=$chunks")
      // disjoint cover of [0, 62)
      val covered = ranges.flatMap { case (lo, w) => lo until (lo + w) }
      assert(covered == (0 until 62), s"bad cover at chunks=$chunks")
    }
    // the high-chunk regime that broke a uniform-ceil split: identical docs
    // must still pair at distance 0 with maxHamming = 9 (10 chunks)
    val pairs = Dedup.simHashNearPairs(docs, "doc_id", "text", maxHamming = 9)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((1L, 2L)) == 0)
  }

  test("duplicateClusters refuses to return non-converged labels") {
    val nodes = (1L to 5L).toDF("doc_id")
    val chain = Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      // driverEdgeCap = 0 forces the distributed propagation path (the
      // driver union-find needs no rounds and cannot fail to converge)
      Dedup.duplicateClusters(nodes, "doc_id", chain, maxRounds = 1,
        driverEdgeCap = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("decontaminate flags docs sharing shingles with the benchmark set") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha beta gamma delta more tail"), // shares 4-gram
      (2L, "alpha beta gamma delta epsilon something else"), // shares two 4-grams
      (3L, "totally clean text with no benchmark overlap here"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
    // minOverlap raises the bar
    val strict = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 4,
      minOverlap = 2).as[(Long, Long)].collect().toMap
    assert(strict == Map(2L -> 2L))
  }

  test("fuzzyDecontaminate flags near-duplicates of benchmark docs, best match first") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "the quick brown fox jumps over the lazy dog"), // duplicate bench item
      (102L, "entirely separate benchmark question about planets and orbits"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // exact copy → sim 1.0
      (2L, "the QUICK brown fox — jumps over the lazy dog"), // normalizes to a copy
      (3L, "unrelated corpus text discussing spark shuffles and joins at length"))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyDecontaminate(corpus, bench, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // docs 1 and 2 flagged against the SMALLER of the two tied bench ids
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((1L, 100L), (2L, 100L)))
    assert(out.forall(_._3 == 1.0))
  }

  test("fuzzyDecontaminate: sub-threshold similarity does not flag") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares a couple of shingles only — banding may or may not collide,
      // but est_sim stays far below 0.5 either way
      (1L, "alpha beta gamma completely different continuation of words here"),
      (2L, "no shared vocabulary at all in this document"))
      .toDF("doc_id", "text")
    assert(Dedup.fuzzyDecontaminate(corpus, bench, "doc_id", "text",
      threshold = 0.5).collect().isEmpty)
  }

  test("decontaminateBloom equals exact decontamination (false positives die in verify)") {
    val docs = graft.Tables.documents(spark, sf0001)
    // every ~97th doc doubles as "benchmark" — same split q59/q80 use
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    for (fpp <- Seq(0.3, 0.01)) { // high fpp stresses the verify join
      val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 8)
        .as[(Long, Long)].collect().toSet
      val bloomed = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text",
        n = 8, fpp = fpp).as[(Long, Long)].collect().toSet
      assert(bloomed == exact, s"fpp=$fpp")
      assert(exact.nonEmpty, "fixture must actually contaminate")
    }
    spark.catalog.clearCache()
  }

  test("dedupSegments drops corpus-wide duplicate lines and reassembles") {
    val lined = Seq(
      (1L, "unique one\nSHARED BOILERPLATE\nunique two"),
      (2L, "other text\nSHARED BOILERPLATE\nmore text"),
      (3L, "SHARED BOILERPLATE"), // nothing left: doc disappears
      (4L, "fully original document"))
      .toDF("doc_id", "text")
    val segs = TextOps.lineSpans(lined, "doc_id", "text")
    val out = Dedup.dedupSegments(segs, "doc_id", "seg_idx", "seg",
        minDupCount = 2, sep = "\n")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "unique one\nunique two", 2L, 1L),
      (2L, "other text\nmore text", 2L, 1L),
      (4L, "fully original document", 1L, 0L)))
  }

  test("dedupSegments counts duplicates within one document too") {
    val rep = Seq((1L, "a b\nc d\na b\nx y"), (2L, "z z")).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(TextOps.lineSpans(rep, "doc_id", "text"),
        "doc_id", "seg_idx", "seg", minDupCount = 2, sep = "\n")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // "a b" occurs twice in doc 1: both dropped
    assert(out == Seq((1L, "c d\nx y", 2L, 2L), (2L, "z z", 1L, 0L)))
  }

  test("duplicateClusters labels components with the min reachable id") {
    // components: {1,2,3} via chain 1-2, 2-3 (1-3 NOT a direct pair),
    // {10,11}, and singletons 20, 21 (no pairs at all)
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 21L)
    // both execution paths — driver union-find (default: edges under the
    // cap) and distributed frontier propagation (cap = 0) — must agree
    val fast = Dedup.duplicateClusters(nodes, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.duplicateClusters(nodes, "doc_id", pairs, driverEdgeCap = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == expected)
    assert(dist == expected)
    // chain needing multiple propagation rounds: 5-4, 4-3, 3-2, 2-1
    val chainNodes = (1L to 5L).toDF("doc_id")
    val chain = Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)).toDF("id_a", "id_b")
    for (cap <- Seq(0L, 1000000L)) {
      val chained = Dedup.duplicateClusters(chainNodes, "doc_id", chain,
          driverEdgeCap = cap)
        .as[(Long, Long)].collect().toMap
      assert(chained.values.toSet == Set(1L), s"cap=$cap")
    }
  }

  test("clusterRepresentatives keeps the best-ranked copy per cluster") {
    // cluster {1,2,3}: doc 2 has the highest rank → it is the survivor;
    // cluster {10,11}: rank TIE → the smaller id (10) wins;
    // singleton 20 represents itself
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L),
      (20L, 1L)).toDF("doc_id", "quality")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L)).toDF("id", "cluster_id")
    val out = Dedup.clusterRepresentatives(docs, "doc_id", labels, col("quality"))
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L, 2L, 0), (2L, 1L, 2L, 1), (3L, 1L, 2L, 0),
      (10L, 10L, 10L, 1), (11L, 10L, 10L, 0),
      (20L, 20L, 20L, 1)))
    // a NULL rank never beats a ranked copy; an all-null cluster still
    // elects exactly one representative (smallest id)
    val nullDocs = Seq((1L, Some(3L)), (2L, None), (30L, None), (31L, None))
      .toDF("doc_id", "quality")
    val nullLabels = Seq((1L, 1L), (2L, 1L), (30L, 30L), (31L, 30L))
      .toDF("id", "cluster_id")
    val nOut = Dedup.clusterRepresentatives(nullDocs, "doc_id", nullLabels,
        col("quality")).select("doc_id", "rep_id", "keep")
      .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(nOut == Seq((1L, 1L, 1), (2L, 1L, 0), (30L, 30L, 1), (31L, 30L, 0)))
  }

  test("repetitionRatio measures within-doc duplicate shingles") {
    val docs2 = Seq(
      (1L, "a b c d e"),             // 3 shingles, all distinct -> 0
      (2L, "x y z x y z x y z"),     // 7 shingles, 3 distinct -> 4/7
      (3L, "w"))                     // short doc: 1 partial shingle -> 0
      .toDF("doc_id", "text")
    val r = docs2.select(col("doc_id"), TextOps.repetitionRatio(col("text"), 3))
      .as[(Long, Double)].collect().toMap
    assert(r(1L) == 0.0)
    assert(r(2L) == 1.0 - 3.0 / 7.0)
    assert(r(3L) == 0.0)
  }

  test("fingerprint is invariant to case/punctuation/whitespace") {
    val fps = docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(5L))
    assert(fps(1L) != fps(4L))
  }

  test("boilerplateShingleRatio flags corpus-frequent phrases per doc") {
    // "click here now" rides 4 of 5 docs (80% >= 50% threshold); each
    // doc's filler trigrams are unique to it (DF 1 -> not boilerplate)
    val corpus = Seq(
      (1L, "click here now alpha beta gamma delta"),
      (2L, "epsilon zeta click here now eta theta"),
      (3L, "iota kappa lambda click here now mu"),
      (4L, "click here now nu xi omicron pi"),
      (5L, "sigma tau upsilon phi chi psi omega"))
      .toDF("doc_id", "text")
    val out = Dedup.boilerplateShingleRatio(corpus, "doc_id", "text",
        n = 3, minDocPct = 50)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // every doc has 5 distinct trigrams (7 tokens); only the planted
    // phrase clears 50% document frequency
    (1L to 4L).foreach { id =>
      val (nSh, nBp, ratio) = out(id)
      assert(nSh == 5L, s"doc $id shingles: $nSh")
      assert(nBp == 1L, s"doc $id boiler count: $nBp")
      assert(ratio == 0.2, s"doc $id ratio: $ratio")
    }
    assert(out(5L) == ((5L, 0L, 0.0)))
  }

  test("crossSourceNgramOverlap counts shared grams per source pair with cap") {
    // sources A and B share one planted 6-gram; C shares nothing; a
    // universal gram sits in all three and must die under the cap
    val shared = "one two three four five six"
    val universal = "u1 u2 u3 u4 u5 u6"
    val corpus = Seq(
      (1L, "A", s"$shared alpha beta $universal"),
      (2L, "B", s"gamma $shared delta $universal"),
      (3L, "C", s"epsilon zeta eta theta iota kappa $universal"))
      .toDF("doc_id", "source", "text")
    def matrix(cap: Int): Map[(String, String), Long] =
      Dedup.crossSourceNgramOverlap(corpus, "doc_id", "text",
          "source", n = 6, maxSourcesPerGram = cap)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    // cap 2: the universal gram (3 sources) dies; only the planted pair
    assert(matrix(2) == Map(("A", "B") -> 1L))
    // uncapped: the universal gram contributes one shared gram to every pair
    assert(matrix(1000) == Map(
      ("A", "B") -> 2L, ("A", "C") -> 1L, ("B", "C") -> 1L))
  }

  test("clusterSafeSplit: clusters never straddle the split; draw replays the shared LCG") {
    import spark.implicits._
    val nodes = (0L to 30L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val out = Dedup.clusterSafeSplit(nodes, "doc_id", pairs, valPct = 30)
      .as[(Long, Long, String)].collect()
    assert(out.length == 31)
    // every cluster maps to exactly one split; linked docs share both
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byCluster.values.forall(_.size == 1))
    val m = out.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L) == m(2L) && m(2L) == m(3L))
    assert(m(10L) == m(11L) && m(20L) == m(21L))
    // both splits occur, and every decision replays the shared LCG on the
    // cluster label (singletons: cluster_id == own id)
    assert(out.map(_._3).toSet == Set("train", "val"))
    out.foreach { case (_, cid, split) =>
      val draw = ((((cid % 2147483648L) * 1103515245L + 12345L) % 2147483648L) >> 16) % 100L
      assert((draw < 30) == (split == "val"), s"cluster $cid draw $draw split $split")
    }
  }
}
