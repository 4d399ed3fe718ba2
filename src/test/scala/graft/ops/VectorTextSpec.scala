package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VectorTextSpec extends SparkTestBase {
  import spark.implicits._

  test("dot / norm / cosine / l2Dist match hand values") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.norm(col("a")).as("na"),
      VectorOps.cosine(col("a"), col("b")).as("c"),
      VectorOps.l2Dist(col("a"), col("b")).as("e")).head()
    assert(math.abs(r.getDouble(0) - 12.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 12.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(9 + 49 + 9)) < 1e-12)
  }

  test("groupCentroids computes per-group elementwise means") {
    val df = Seq((0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)), (1, Seq(-1.0f, 0.5f)))
      .toDF("label", "embedding")
    val got = Similarity.groupCentroids(df, "label", "embedding", 2)
      .as[(Int, Seq[Double], Long)].collect().map(r => r._1 -> r).toMap
    assert(got(0)._2 == Seq(2.0, 3.0) && got(0)._3 == 2L)
    assert(got(1)._2 == Seq(-1.0, 0.5) && got(1)._3 == 1L)
  }

  test("groupCentroids fails loudly (not NPE) on a null embedding") {
    val df = Seq((0, Some(Seq(1.0f, 2.0f))), (0, None: Option[Seq[Float]]))
      .toDF("label", "embedding")
    val e = intercept[Exception] {
      Similarity.groupCentroids(df, "label", "embedding", 2).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("null embedding"),
      s"expected the assert_true contract message, got: $msgs")
  }

  test("codegen DotProduct matches the built-ins-only formulation bit-for-bit") {
    val rng = new scala.util.Random(17)
    val rows = (0 until 200).map { _ =>
      (Seq.fill(64)(rng.nextFloat() * 2 - 1), Seq.fill(64)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
    val diffs = df.select((VectorOps.dot(col("a"), col("b")) -
        VectorOps.dotHof(col("a"), col("b"))).as("d"))
      .as[Double].collect()
    assert(diffs.forall(_ == 0.0))
    // double arrays too
    val dd = Seq((Seq(1.5, -2.5, 3.0), Seq(2.0, 0.5, -1.0))).toDF("a", "b")
    assert(dd.select(VectorOps.dot(col("a"), col("b"))).as[Double].head() == 3.0 - 1.25 - 3.0)
    // SQL registration path
    graft.functions.GraftFunctions.register(spark)
    dd.createOrReplaceTempView("dd_vecs")
    assert(spark.sql("SELECT graft_dot(a, b) FROM dd_vecs").as[Double].head() == -1.25)
    // l2sq: (1.5-2)^2 + (-2.5-0.5)^2 + (3+1)^2 = 0.25 + 9 + 16
    assert(spark.sql("SELECT graft_l2sq(a, b) FROM dd_vecs").as[Double].head() == 25.25)
    assert(dd.select(graft.functions.GraftFunctions.l2sq(col("a"), col("b")))
      .as[Double].head() == 25.25)
  }

  test("axpy and scale") {
    val df = Seq((Seq(1.0, 2.0), Seq(10.0, 20.0))).toDF("a", "b")
    val r = df.select(VectorOps.axpy(lit(2.0), col("a"), col("b")).as("x"),
      VectorOps.scale(lit(3.0), col("a")).as("s")).head()
    assert(r.getSeq[Double](0) == Seq(21.0, 42.0))
    assert(r.getSeq[Double](1) == Seq(3.0, 6.0))
  }

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("Hello, world! x2  spaces").toDF("text")
    val r = df.select(TextOps.wsTokenCount(col("text")).as("ws"),
      TextOps.bpeishTokenCount(col("text")).as("bpe")).head()
    assert(r.getInt(0) == 4)
    // Hello , world ! x 2 spaces -> 7
    assert(r.getInt(1) == 7)
  }

  test("normalizeText collapses case, punctuation, whitespace") {
    val df = Seq("  The QUICK,   brown-fox!! ").toDF("text")
    val r = df.select(TextOps.normalizeText(col("text"))).as[String].head()
    assert(r == "the quick brownfox")
  }

  test("langId picks max score with fixed priority ties") {
    val scores = Seq("en" -> lit(3), "de" -> lit(3), "es" -> lit(5),
      "fr" -> lit(1), "zh" -> lit(0)).map { case (l, c) => l -> c.cast("int") }
    val df = Seq(1).toDF("x")
    assert(df.select(TextOps.langId(scores)).as[String].head() == "es")
    val tied = Seq("en" -> lit(2), "de" -> lit(2), "es" -> lit(1),
      "fr" -> lit(0), "zh" -> lit(0)).map { case (l, c) => l -> c.cast("int") }
    assert(df.select(TextOps.langId(tied)).as[String].head() == "en")
  }

  test("langScore counts stopword hits") {
    val df = Seq("the cat and the dog of war").toDF("text")
    val s = df.select(TextOps.langScore(col("text"), TextOps.LangMarkers.head._2))
      .as[Int].head()
    assert(s == 4) // the, and, the, of
  }

  test("cosineTopK matches brute force on a small corpus") {
    val vecs = (0 until 30).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 31 + j * 7).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 3)
    val corpus = df.filter(col("vec_id") >= 3)
    val got = Similarity.cosineTopK(queries, corpus, "vec_id", "embedding", 4)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    for (q <- 0 until 3) {
      val expected = vecs.filter(_._1 >= 3)
        .map(v => (v._1, cos(vecs(q)._2, v._2)))
        .sortBy(t => (-t._2, t._1)).take(4).map(_._1)
      assert(got(q.toLong) == expected, s"query $q")
    }
  }

  test("chunkSpans splits docs into token windows with exact spans") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, cap 4 -> 3 chunks
      (2L, "only three tokens"))                      // shorter than cap -> 1 chunk
      .toDF("doc_id", "text")
    val out = TextOps.chunkSpans(docs, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, 8L, "t5 t6 t7 t8"),
      (1L, 2L, 8L, 10L, "t9 t10"),
      (2L, 0L, 0L, 3L, "only three tokens")))
  }

  test("stratifiedSample keeps per-stratum rates deterministically") {
    val docs = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "zz"))
      .toDF("doc_id", "lang")
    val kept = TextOps.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 50), defaultPct = 10)
      .as[(Long, String)].collect()
    val en = kept.count(_._2 == "en")
    val zz = kept.count(_._2 == "zz")
    // LCG draw is uniform-ish: en ~ 250 of 500, zz ~ 50 of 500
    assert(en > 200 && en < 300, s"en kept $en")
    assert(zz > 25 && zz < 75, s"zz kept $zz")
    // bit-identical on re-run (no RNG state)
    val again = TextOps.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 50), defaultPct = 10).as[(Long, String)].collect()
    assert(again.toSeq == kept.toSeq)
  }

  test("groupSample keeps exactly min(k, |stratum|) rows, the k smallest draws") {
    val docs = (0L until 300L).map(i => (i, if (i < 295) "big" else "small"))
      .toDF("doc_id", "src")
    val got = TextOps.groupSample(docs, "doc_id", "src", k = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.count(_._1 == "big") == 10)
    // a stratum smaller than k returns whole (all 5 rows)
    assert(got.count(_._1 == "small") == 5)
    // picks are the k smallest LCG draws of the stratum (window replay)
    def lcg(id: Long) = ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L
    val expectBig = (0L until 295L).map(i => (lcg(i), i)).sorted.take(10)
      .map { case (d, i) => ("big", i, d) }.toSet
    assert(got.filter(_._1 == "big").toSet == expectBig)
    // partition-layout independent
    val re = TextOps.groupSample(docs.repartition(13), "doc_id", "src", k = 10)
      .as[(String, Long, Long)].collect().toSet
    assert(re == got.toSet)
  }

  test("stratifiedSample is exact for ids past the 2^53 double mantissa") {
    // Corpus-scale ids: the LCG must stay all-integer (no ANSI overflow,
    // no double rounding). Keep decision must equal the mod-2^31 reduction
    // of the id computed on the driver.
    val big = Seq(Long.MaxValue, Long.MaxValue - 1, (1L << 53) + 1, 8400000001L)
    val docs = big.map(i => (i, "en")).toDF("doc_id", "lang")
    val kept = TextOps.stratifiedSample(docs, "doc_id", "lang",
        Map.empty[String, Int], defaultPct = 50)
      .as[(Long, String)].collect().map(_._1).toSet
    val expected = big.filter { id =>
      val m = 2147483648L
      val x = (((id % m) * 1103515245L + 12345L) % m + m) % m
      (x >> 16) % 100 < 50
    }.toSet
    assert(kept == expected)
  }

  test("ppsSampleDocs keeps each doc iff its LCG draw is under the weight-proportional rate") {
    // weights 1..50 over ids 0..199, target 20 docs: replay every draw
    val rows = (0L until 200L).map(i => (i, (i % 50) + 1))
    val docs = rows.toDF("doc_id", "w")
    val kept = TextOps.ppsSampleDocs(docs, "doc_id", col("w"), targetDocs = 20L)
      .select("doc_id").as[Long].collect().toSet
    val tot = rows.map(_._2).sum
    val expected = rows.filter { case (id, w) =>
      val m = 2147483648L
      val x = (((id % m) * 1103515245L + 12345L) % m + m) % m
      val draw = (x >> 5) % 1000000L
      draw < math.min(1000000L, 20L * 1000000L * w / tot)
    }.map(_._1).toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < 60) // ~20 expected, not everything
    // a weight heavy enough to cap at p=1 is always kept
    val heavy = (Seq((999L, 1000000L)) ++ rows).toDF("doc_id", "w")
    val keptHeavy = TextOps.ppsSampleDocs(heavy, "doc_id", col("w"), 20L)
      .select("doc_id").as[Long].collect().toSet
    assert(keptHeavy.contains(999L))
    // a NULL weight drops the row — explicitly, since least() would
    // otherwise skip the null rate and keep the doc with p = 1
    val withNull = (Seq((998L, None: Option[Long])) ++ rows.map { case (i, w) => (i, Some(w)) })
      .toDF("doc_id", "w")
    val keptNull = TextOps.ppsSampleDocs(withNull, "doc_id", col("w"), 20L)
      .select("doc_id").as[Long].collect().toSet
    assert(!keptNull.contains(998L))
    assert(keptNull == kept) // the non-null draws are unchanged
  }

  test("packSequences fills fixed-capacity sequences in (doc, chunk) order") {
    val docs = Seq(
      (0L, (1 to 10).map(i => s"a$i").mkString(" ")),  // grp 0: ntoks 4,4,2
      (32L, (1 to 5).map(i => s"b$i").mkString(" ")),  // grp 0: ntoks 4,1
      (1L, "x y z"))                                   // grp 1: ntok 3
      .toDF("doc_id", "text")
    val out = TextOps.packSequences(
        TextOps.chunkSpans(docs, "doc_id", "text", 4), capacity = 8, numGroups = 32)
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(t => (t._1, t._3, t._4)).toSeq
    // (pack_group, seq_id, doc_id, chunk_idx, ntok); cum starts 0,4,8,10,14
    assert(out == Seq(
      (0L, 0L, 0L, 0L, 4L), (0L, 0L, 0L, 1L, 4L), (0L, 1L, 0L, 2L, 2L),
      (0L, 1L, 32L, 0L, 4L), (0L, 1L, 32L, 1L, 1L),
      (1L, 0L, 1L, 0L, 3L)))
  }

  test("redactPii scrubs emails, IPs, phones and counts each substitution") {
    val docs = Seq(
      (1L, "contact john.doe@example.com or 10.0.0.1 or +1 555 123 4567"),
      (2L, "digit-heavy email 12345678@x.com must count once, not as a phone"),
      (3L, "nothing sensitive here"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), TextOps.redactPii(col("text")),
        TextOps.piiCount(col("text")))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "contact <email> or <ipv4> or <phone>", 3L),
      (2L, "digit-heavy email <email> must count once, not as a phone", 1L),
      (3L, "nothing sensitive here", 0L)))
  }

  test("RedactPii kernel matches the composed redactPii/piiCount chain exactly") {
    // adversarial shapes: adjacent matches, digit runs bordering emails,
    // multiple matches per pattern, empty text, null text, no matches,
    // a phone whose greedy span only resolves after the email is redacted
    val texts = Seq(
      "contact john.doe@example.com or 10.0.0.1 or +1 555 123 4567",
      "digit-heavy email 12345678@x.com must count once, not as a phone",
      "a@b.io c@d.io 1.2.3.4 5.6.7.8 +44 (0)20 7946 0958 and 020 7946 0958",
      "call 123456789 9foo@bar.com", // greedy phone overlapping an email start
      "", "no pii at all", null,
      "edge 999.999.999.999 still redacts as ipv4 by the simple pattern",
      "<email> literal placeholder is left alone; real one x@y.zz is not")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val r = graft.functions.TextFunctions.redact_pii(col("text"))
    val kernel = docs.select(col("doc_id"),
        r.getField("clean_text"), r.getField("n_pii"))
      .as[(Long, Option[String], Option[Long])].collect().sortBy(_._1).toSeq
    val composed = docs.select(col("doc_id"),
        TextOps.redactPii(col("text")), TextOps.piiCount(col("text")))
      .as[(Long, Option[String], Option[Long])].collect().sortBy(_._1).toSeq
    assert(kernel == composed)
  }

  test("LangQualityStats kernel matches the composed regex columns exactly") {
    // adversarial shapes: every \s char, leading/trailing spaces vs tabs
    // (Spark trim strips 0x20 only), empty text, null text, marker words
    // shared across languages (la/que/en), markers glued to digits or
    // underscores (\w run continues -> no hit), CJK chars, Unicode
    // one-to-many lowercase (U+0130), Kelvin sign (U+212A -> k)
    val texts = Seq(
      "The and THE der la que en y _the the9 9the the_ the",
      " \t le la les \n est unedes \f dans \r pour que  ",
      "", "   ", "\t\t", null,
      "中文文本 the 中",
      "İstanbul Kelvin the",
      "punct!!! ##$% und--nicht; mit,ein.eine: den?")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val s = graft.functions.TextFunctions.lang_quality_stats(col("text"))
    val kernel = docs.select(col("doc_id"), s.getField("n_ws_tokens"),
        s.getField("n_nonalnum"), s.getField("n_chars"),
        s.getField("en"), s.getField("de"), s.getField("es"),
        s.getField("fr"), s.getField("zh"))
      .collect().map(r => (r.getLong(0), Seq.tabulate(8)(i =>
        if (r.isNullAt(i + 1)) -1L else r.getLong(i + 1)))).sortBy(_._1).toSeq
    val composed = docs.select(col("doc_id"),
        TextOps.wsTokenCount(col("text")).cast("long"),
        TextOps.nonAlnumCount(col("text")).cast("long"),
        length(col("text")).cast("long"),
        TextOps.langScore(col("text"), TextOps.LangMarkers(0)._2).cast("long"),
        TextOps.langScore(col("text"), TextOps.LangMarkers(1)._2).cast("long"),
        TextOps.langScore(col("text"), TextOps.LangMarkers(2)._2).cast("long"),
        TextOps.langScore(col("text"), TextOps.LangMarkers(3)._2).cast("long"),
        TextOps.langScore(col("text"), TextOps.LangMarkers(4)._2).cast("long"))
      .collect().map(r => (r.getLong(0), Seq.tabulate(8)(i =>
        if (r.isNullAt(i + 1)) -1L else r.getLong(i + 1)))).sortBy(_._1).toSeq
    assert(kernel == composed)
    // and on the real corpus
    val corpus = graft.Tables.documents(spark, sf0001)
    val ks = graft.functions.TextFunctions.lang_quality_stats(col("text"))
    val diff = corpus.select(
        ks.getField("n_ws_tokens") =!= TextOps.wsTokenCount(col("text")).cast("long") ||
        ks.getField("n_nonalnum") =!= TextOps.nonAlnumCount(col("text")).cast("long") ||
        ks.getField("n_chars") =!= length(col("text")).cast("long") ||
        ks.getField("en") =!= TextOps.langScore(col("text"), TextOps.LangMarkers(0)._2).cast("long") ||
        ks.getField("zh") =!= TextOps.langScore(col("text"), TextOps.LangMarkers(4)._2).cast("long"))
      .as[Boolean].collect()
    assert(diff.forall(!_), s"${diff.count(identity)} corpus docs diverge")
  }

  test("cosineTopK drops NaN-scoring (zero-norm) candidates deterministically") {
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f)), (11L, Seq(0.0f, 0.0f)), // zero vector: NaN cosine
      (12L, Seq(0.5f, 0.5f)), (13L, Seq(-1.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, Seq(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val got = Similarity.cosineTopK(queries, corpus, "vec_id", "embedding", 3)
      .select("cand_id").as[Long].collect().toSeq
    // the zero vector never appears; the 3 finite candidates all do
    assert(got.toSet == Set(10L, 12L, 13L))
  }

  test("srpNearPairs returns only pairs above threshold, deterministic") {
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Seq.tabulate(8)(j => (base * (1.0 + j) + math.sin(i + j) * 0.1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val pairs = Similarity.srpNearPairs(df, "vec_id", "embedding", 4, 0.9, dim = 8)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 >= 0.9))
    // same parity (same direction) only
    assert(pairs.forall(p => (p._1 % 2) == (p._2 % 2)))
  }

  test("gopherRules: hand-computed per-rule statistics") {
    def rules(text: String) = Seq(Tuple1(text)).toDF("text")
      .select(TextOps.gopherRules(col("text")).as("g"))
      .select(col("g.n_words"), col("g.mean_word_len"), col("g.symbol_ratio"),
        col("g.bullet_frac"), col("g.ellipsis_frac"), col("g.alpha_frac"),
        col("g.n_stop"), col("g.keep"))
      .as[(Int, Double, Double, Double, Double, Double, Int, Boolean)]
      .collect().head
    val a = rules("the cat sat")
    assert(a._1 == 3 && a._2 == 3.0 && a._3 == 0.0 && a._6 == 1.0)
    assert(a._7 == 1 && !a._8) // only 'the'; too short to keep
    val b = rules("- a\n* b\n• c\nplain")
    assert(b._4 == 0.75) // 3 of 4 lines bullet-led
    val c = rules("wait...\nok")
    assert(c._5 == 0.5 && c._3 == 0.5) // 1 of 2 lines; 1 '...' over 2 words
    val d = rules("The, cat of. dog")
    assert(d._7 == 2) // punctuation-attached stopwords count via normalization
    // a genuinely keepable doc: 50+ plain English words
    val e = rules(Seq.fill(10)("the quick brown fox jumps over that lazy dog daily").mkString(" "))
    assert(e._1 == 100 && e._8)
  }

  test("gopherRules kernel == composed HOF formulation on corpus docs and edges") {
    val edges = Seq(
      "", " ", "   ", "\t", "a\tb", "\tleading tab", "trailing tab\t",
      "the cat", "The, cat of. dog", "a # b ... c .... d .....",
      "- a\n* b\n• c\nplain\n  - indented\n\t* tabbed",
      "wait...\nok...  \ndots....x\n...",
      "one\r\ntwo\r\n- crlf bullet\r\nend...\r",
      "don't st-op the-and", "of of of of", "##", "...", "..", "#...#",
      "multi  space   runs", "line\n\nempty\n\n\nlines",
      "ab-cd joins", "THE AND THAT HAVE WITH BE TO OF")
    val docs = graft.Tables.documents(spark, sf0001).select(col("text"))
      .union(edges.map(Tuple1(_)).toDF("text"))
    val both = docs.select(
      TextOps.gopherRules(col("text")).as("k"),
      TextOps.gopherRulesComposed(col("text")).as("c"))
    val diff = both.filter(not(col("k") <=> col("c"))).count()
    assert(diff == 0L, {
      val ex = both.filter(not(col("k") <=> col("c"))).limit(3).collect()
      s"kernel != composed on $diff rows, e.g. ${ex.mkString("; ")}"
    })
  }

  test("shardAssign is deterministic, in-range, and fails loudly on a NULL id") {
    val df = (0L until 400L).map(i => Tuple1(i)).toDF("doc_id")
    val shards = df.select(TextOps.shardAssign(col("doc_id"), 8).as("s"))
      .as[Int].collect()
    assert(shards.forall(s => s >= 0 && s < 8))
    // every shard is populated at this size (the LCG draw spreads)
    assert(shards.toSet == (0 until 8).toSet)
    // NULL id: in-flight assert, not a silent NULL shard
    val withNull = Seq(Some(1L), None).toDF("doc_id")
    val e = intercept[Exception] {
      withNull.select(TextOps.shardAssign(col("doc_id"), 8)).collect()
    }
    assert(e.getMessage != null)
  }
}
