package graft.functions

import graft.SparkTestBase
import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Cross-checks the single-pass codegen kernels against the composable
  * DataFrame formulations they replaced (posexplode + window + aggregate),
  * which remain in Dedup as the reference semantics. */
class TextKernelsSpec extends SparkTestBase {
  import spark.implicits._

  private val texts = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "the QUICK   brown fox, jumps over the lazy dog!!"),   // spaces + case + punct
    (8L, "tabs\tand\nnewlines glue tokens"),                    // \t \n REMOVED, not spacified
    (9L, "100K temp in İstanbul"),                    // Unicode lowercase -> ASCII (K->k, İ->i)
    (3L, "Wörter mit Umlauten über straße"),                    // non-ascii stripped
    (4L, "word"),                                               // shorter than a shingle
    (5L, ""),                                                   // empty
    (6L, "中文 文本 with mixed 中文 tokens"),                     // CJK stripped
    (7L, "a  b   c d e f g h i j"))
  private val docs = texts.toDF("doc_id", "text")

  test("kernel normalize matches TextOps.normalizeText column semantics") {
    val viaCol = docs.select($"doc_id", TextOps.normalizeText($"text"))
      .as[(Long, String)].collect().toMap
    texts.foreach { case (id, t) =>
      assert(TextKernels.normalize(t) == viaCol(id), s"doc $id")
    }
  }

  test("NormalizeText expression equals the composed column, NULL-safe") {
    val both = docs.select($"doc_id",
        TextFunctions.normalize_text($"text").as("k"),
        TextOps.normalizeText($"text").as("c"))
      .as[(Long, String, String)].collect()
    both.foreach { case (id, k, c) => assert(k == c, s"doc $id") }
    // NULL in -> NULL out, like every null-intolerant string expression
    val n = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(TextFunctions.normalize_text($"text")).collect()
    assert(n.head.isNullAt(0))
    // fingerprint (md5 over the kernel) equals md5 over the composed column
    val fp = docs.select($"doc_id",
        TextOps.fingerprint($"text").as("k"),
        md5(TextOps.normalizeText($"text").cast("binary")).as("c"))
      .as[(Long, String, String)].collect()
    fp.foreach { case (id, k, c) => assert(k == c, s"fingerprint doc $id") }
  }

  test("shingle hash sets reproduce string-shingle distinct sets and jaccard") {
    val strSets = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .groupBy("id").agg(collect_set($"shingle").as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val hashSets = docs
      .select($"doc_id", TextFunctions.shingle_hashes($"text", 3))
      .as[(Long, Seq[Long])].collect().toMap
    assert(hashSets.keySet == strSets.keySet)
    for (id <- strSets.keys) {
      assert(hashSets(id).length == strSets(id).distinct.length, s"doc $id set size")
      assert(hashSets(id) == hashSets(id).sorted, s"doc $id sorted determinism")
    }
    for (a <- strSets.keys; b <- strSets.keys if a < b) {
      val (sa, sb) = (strSets(a).toSet, strSets(b).toSet)
      val (ha, hb) = (hashSets(a).toSet, hashSets(b).toSet)
      val js = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val jh = ha.intersect(hb).size.toDouble / ha.union(hb).size
      assert(math.abs(js - jh) < 1e-12, s"jaccard($a,$b)")
    }
  }

  test("minhash signature matches a direct reimplementation from string shingles") {
    val strSets = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .groupBy("id").agg(collect_set($"shingle").as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val sigs = docs.select($"doc_id", TextFunctions.minhash_sig($"text", 3, 16))
      .as[(Long, Seq[Long])].collect().toMap
    def polyPair(s: String): (Long, Long) = {
      var h1 = TextKernels.Seed1; var h2 = TextKernels.Seed2
      s.foreach { c =>
        h1 = (h1 * TextKernels.Base1 + c) % TextKernels.P
        h2 = (h2 * TextKernels.Base2 + c) % TextKernels.P
      }
      (h1, h2)
    }
    for ((id, shingles) <- strSets) {
      val expected = (0 until 16).map { j =>
        shingles.map { sh =>
          val (h1, h2) = polyPair(sh)
          (TextKernels.coefA(j) * h1 + TextKernels.coefB(j) * h2 + j) % TextKernels.P
        }.min
      }
      assert(sigs(id) == expected, s"doc $id signature")
    }
  }

  test("identical minhash signatures estimate jaccard 1 for identical docs") {
    val same = Seq((1L, "alpha beta gamma delta"), (2L, "alpha  BETA gamma, delta"))
      .toDF("doc_id", "text")
    val s = same.select(TextFunctions.minhash_sig($"text", 3, 32))
      .as[Seq[Long]].collect()
    assert(s(0) == s(1)) // same normalized text -> identical signature
  }

  test("simhash62: case/punct invariance, near-dup proximity, distinct distance") {
    val hs = docs.select($"doc_id", TextFunctions.simhash62($"text"))
      .as[(Long, Long)].collect().toMap
    assert(hs(1L) == hs(2L)) // normalization-invariant
    assert((hs(1L) | hs(2L)) >> 62 == 0L) // only 62 bits used
    val near = java.lang.Long.bitCount(
      hs(1L) ^ spark.range(1).select(
        TextFunctions.simhash62(lit("The quick brown fox jumps over the lazy cat")))
        .as[Long].head())
    val far = java.lang.Long.bitCount(hs(1L) ^ hs(7L))
    assert(near < far, s"near=$near far=$far")
  }

  test("SQL registration exposes every kernel and enforces literal sketch params") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("tk_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_text_hash62(text) AS h, graft_simhash62(text) AS sh,
         graft_shingle_hashes(text, 3) AS sg, graft_minhash_sig(text, 3, 16) AS mh
         FROM tk_docs""")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3), r.getSeq[Long](4))).toMap
    val viaCol = docs.select(col("doc_id"),
        TextFunctions.text_hash62(col("text")),
        TextFunctions.simhash62(col("text")),
        TextFunctions.shingle_hashes(col("text"), 3),
        TextFunctions.minhash_sig(col("text"), 3, 16))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3), r.getSeq[Long](4))).toMap
    assert(viaSql == viaCol)
    // sketch params shape the kernel: non-literal n must fail at analysis
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(text, CAST(doc_id AS INT)) FROM tk_docs")
        .collect()
    }
    assert(e.getMessage.contains("INTEGER literal"), e.getMessage)
  }

  test("interpreted eval matches codegen output and null propagates") {
    texts.foreach { case (_, t) =>
      val viaEval = TextKernels.simHash62(UTF8String.fromString(t))
      val viaDf = Seq(t).toDF("text").select(TextFunctions.simhash62($"text")).as[Long].head()
      assert(viaEval == viaDf)
    }
    val withNull = Seq[(Long, Option[String])]((1L, Some("x")), (2L, None))
      .toDF("doc_id", "text")
    val out = withNull.select(
      TextFunctions.shingle_hashes($"text", 3),
      TextFunctions.minhash_sig($"text", 3, 4),
      TextFunctions.simhash62($"text")).collect()
    assert(out(1).isNullAt(0) && out(1).isNullAt(1) && out(1).isNullAt(2))
  }
}
