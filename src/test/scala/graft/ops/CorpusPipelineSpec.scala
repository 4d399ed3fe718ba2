package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkTestBase {
  import spark.implicits._

  // one planted document per drop stage + two survivors
  private val enBase = "the cat and the dog sat with the mouse in a house for a while and was happy"
  private val docs = Seq(
    // 0: survivor (en, long enough, unique, clean, sampled in)
    (0L, enBase + " alpha beta gamma delta", "en", "src0"),
    // 1: quality drop — under 5 words
    (1L, "too short here", "en", "src0"),
    // 2: lang drop — German stopwords dominate
    (2L, "der hund und die katze ist nicht mit ein eine den haus und der garten", "de", "src0"),
    // 3: exact dup of 0 (loses the min-id race)
    (3L, enBase + " alpha beta gamma delta", "en", "src0"),
    // 4: near-dup of 0 (same block, high 3-gram Jaccard, not byte-equal)
    (4L, enBase + " alpha beta gamma epsilon", "en", "src0"),
    // 5: contaminated — shares a 4-shingle with the benchmark doc
    (5L, "the secret benchmark answer key is here and the cat sat with the dog", "en", "src0"),
    // 6: survivor in src1
    (6L, "the bird and the fish swam with the otter in a river for a day and was calm", "en", "src1"))
    .toDF("doc_id", "text", "lang", "source")
    // same blocking the q54/q80 queries use
    .withColumn("n_chars", length(col("text")))

  private val bench = Seq(
    (100L, "the secret benchmark answer key is here today", "en", "src9"))
    .toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")))

  private def cfg(ratesPct: Map[String, Int] = Map.empty, defaultPct: Int = 100) =
    CorpusPipeline.Config(
      allowedLangs = Seq("en"),
      blockCols = Seq(col("lang"), floor(col("n_chars") / 1000.0).cast("long")),
      shingleLen = 3, minJaccard = 0.5,
      decontamN = 4, minOverlap = 1,
      strataCol = "source", ratesPct = ratesPct, defaultPct = defaultPct)

  test("curate labels each planted doc with its first dropping stage") {
    val labeled = CorpusPipeline.curate(docs, bench, "doc_id", "text", cfg())
      .select(col("doc_id"), col("drop_stage"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(labeled(0L) == null)
    assert(labeled(1L) == "quality")
    assert(labeled(2L) == "lang")
    assert(labeled(3L) == "exact_dup")
    assert(labeled(4L) == "near_dup")
    assert(labeled(5L) == "contaminated")
    assert(labeled(6L) == null)
    spark.catalog.clearCache()
  }

  test("funnel is one row per stage and accounts for every document") {
    val labeled = CorpusPipeline.curate(docs, bench, "doc_id", "text", cfg())
    val f = CorpusPipeline.funnel(labeled)
      .as[(String, Long)].collect().toMap
    assert(f == Map("kept" -> 2L, "quality" -> 1L, "lang" -> 1L,
      "exact_dup" -> 1L, "near_dup" -> 1L, "contaminated" -> 1L))
    assert(f.values.sum == docs.count())
    spark.catalog.clearCache()
  }

  test("sampling stage applies only to docs that survived everything else") {
    // defaultPct = 0: every would-be survivor is sampled out instead;
    // docs dropped earlier keep their original stage labels
    val labeled = CorpusPipeline.curate(docs, bench, "doc_id", "text",
        cfg(defaultPct = 0))
      .select(col("doc_id"), col("drop_stage"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(labeled(0L) == "sampled")
    assert(labeled(6L) == "sampled")
    assert(labeled(1L) == "quality" && labeled(3L) == "exact_dup")
    spark.catalog.clearCache()
  }

  test("observed() yields the funnel counts from the consuming action's own pass") {
    val labeled = CorpusPipeline.curate(docs, bench, "doc_id", "text", cfg())
    val (framed, obs) = CorpusPipeline.observed(labeled)
    // the action a real run performs: write the curated corpus; the funnel
    // metrics ride along on the same job
    val out = java.nio.file.Files.createTempDirectory("curated").toString
    framed.filter(col("drop_stage").isNull).write.mode("overwrite").parquet(out)
    val got = obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
    val expected = CorpusPipeline.funnel(labeled)
      .as[(String, Long)].collect().toMap
    (CorpusPipeline.Stages :+ "kept").foreach { s =>
      assert(got(s) == expected.getOrElse(s, 0L), s"stage $s")
    }
    // and the written corpus is exactly the survivors
    assert(spark.read.parquet(out).count() == expected("kept"))
    spark.catalog.clearCache()
  }

  test("curated corpus equals the stage-by-stage sequential pipeline") {
    val labeled = CorpusPipeline.curate(docs, bench, "doc_id", "text", cfg())
    val kept = labeled.filter(col("drop_stage").isNull)
      .select("doc_id").as[Long].collect().toSet
    // sequential reference: filter stage by stage with the same operators
    val c = cfg()
    val s2 = docs.filter(
      TextOps.wsTokenCount(col("text")) >= c.minWords &&
        TextOps.wsTokenCount(col("text")) <= c.maxWords &&
        TextOps.nonAlnumCount(col("text")).cast("double") / length(col("text"))
          < c.maxPunctRatio &&
        TextOps.langId(TextOps.LangMarkers.map { case (l, p) =>
          l -> TextOps.langScore(col("text"), p)
        }).isin(c.allowedLangs: _*))
    val reps = s2.groupBy(md5(col("text").cast("binary")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val s3 = s2.join(reps.select("doc_id"), Seq("doc_id"))
    val s4 = Dedup.duplicateClusters(s3, "doc_id",
        Dedup.ngramJaccardPairs(s3, "doc_id", "text", c.blockCols,
          c.shingleLen, c.minJaccard))
      .filter(col("cluster_id") === col("id"))
      .select(col("id").as("doc_id"))
      .join(s3, Seq("doc_id"))
    val s5 = s4.join(
      Dedup.decontaminate(s4, bench, "doc_id", "text", c.decontamN, c.minOverlap)
        .select("doc_id"),
      Seq("doc_id"), "left_anti")
    val sequential = s5.select("doc_id").as[Long].collect().toSet
    assert(kept == sequential)
    spark.catalog.clearCache()
  }
}
