package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pipeline a training-data run
  * executes over raw documents, built entirely from this engine's operators:
  *
  *   1. `quality`       — word-count bounds + punctuation-ratio cut
  *                        (the q46 keep rule; narrow codegen map)
  *   2. `lang`          — [[TextOps.langId]] guess must be in the allowlist
  *                        (narrow codegen map)
  *   3. `exact_dup`     — md5 duplicate groups keep the min-id
  *                        representative ([[Dedup.exactDupGroups]] rule)
  *   4. `near_dup`      — [[Dedup.ngramJaccardPairs]] +
  *                        [[Dedup.duplicateClusters]]; cluster reps survive
  *   5. `contaminated`  — [[Dedup.decontaminate]] against the benchmark set
  *   6. `sampled`       — [[TextOps.sampleKeep]] deterministic stratified
  *                        downsampling
  *
  * Returns the FULL corpus labeled with `drop_stage` (null = kept, else the
  * FIRST stage that dropped the doc) plus the `lang_guess` the decision
  * used. Labeling instead of filtering is deliberate: the funnel report —
  * the per-stage attrition a curation run must publish — falls out of ONE
  * aggregation over the labels ([[funnel]]), and the curated corpus is
  * `filter(drop_stage IS NULL)` with the filter collapsing into the same
  * scan.
  *
  * Stage semantics: each expensive stage is computed ONLY over the
  * survivors of the previous stages (its candidate set) — exactly what a
  * stage-by-stage filtering run would see, so labels equal the sequential
  * pipeline's behavior while the narrow stages (1, 2, 6) cost one map over
  * the corpus.
  *
  * Scale shape: quality/lang/sample flags are narrow column expressions (no
  * shuffle). The dedup/decontamination stages run their own documented
  * shapes (blocked pair join with the hot-shingle DF prune, frontier label
  * propagation, broadcast benchmark set) over the shrinking survivor sets,
  * and rejoin to the corpus by id — exchanges carry (id, flag) pairs, never
  * text. The benchmark set must be small (eval suites are MBs against TBs);
  * it is broadcast inside [[Dedup.decontaminate]].
  *
  * Cache lifecycle: the quality+lang survivor frame persists
  * MEMORY_AND_DISK (it feeds the exact-dup aggregate, the near-dup pair
  * pipeline, and the decontamination scan); same contract as the pair
  * generators — `spark.catalog.clearCache()` between corpora. */
object CorpusPipeline {

  final case class Config(
      minWords: Int = 5,
      maxWords: Int = 100000,
      maxPunctRatio: Double = 0.3,
      allowedLangs: Seq[String] = Seq("en"),
      blockCols: Seq[Column],
      shingleLen: Int = 3,
      minJaccard: Double = 0.1,
      decontamN: Int = 8,
      minOverlap: Int = 1,
      strataCol: String,
      ratesPct: Map[String, Int] = Map.empty,
      defaultPct: Int = 100)

  /** Label every document with the first pipeline stage that drops it
    * (`drop_stage`, null = survives curation). */
  def curate(docs: DataFrame, bench: DataFrame, idCol: String,
             textCol: String, cfg: Config): DataFrame = {
    val text = col(textCol)
    // ONE kernel pass computes every flag statistic (token count, punct
    // count, length, 5 language scores) — the composed column form paid
    // ~10 regex scans per document, and showed up twice in the plan (once
    // under `base`, once in the final label chain). See
    // [[graft.functions.TextKernels.langQualityStats]]; semantics parity
    // with the composed form is spec'd in VectorTextSpec.
    val stats = graft.functions.TextFunctions.lang_quality_stats(text)
    val words = col("__s").getField("n_ws_tokens")
    val qualityOk = words >= cfg.minWords && words <= cfg.maxWords &&
      col("__s").getField("n_nonalnum").cast("double") /
        col("__s").getField("n_chars").cast("double") < cfg.maxPunctRatio
    val langGuess = TextOps.langId(
      TextOps.LangMarkers.map { case (l, _) => l -> col("__s").getField(l) })

    // Persisted MEMORY_AND_DISK: `flagged` feeds FOUR plan branches (the
    // three expensive stages through `base` below, plus the final label
    // join) — un-persisted, the final chain re-ran the flag kernel over the
    // whole corpus. Cache carries the corpus + 3 flag columns, the same
    // storage class the survivor set already paid.
    val flagged = docs
      .withColumn("__s", stats)
      .withColumn("__quality_ok", qualityOk)
      .withColumn("lang_guess", langGuess)
      .withColumn("__lang_ok", col("lang_guess").isin(cfg.allowedLangs: _*))
      .drop("__s")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // survivors of the narrow stages: candidate set for the expensive
    // ones — a cheap cache-read filter for each consumer
    val base = flagged.filter(col("__quality_ok") && col("__lang_ok"))

    // 3. exact dedup: survivors whose id is the min of their md5 group
    val exactFlags = base
      .select(col(idCol), md5(text.cast("binary")).as("__h"))
      .withColumn("__keep_id", min(col(idCol))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))))
      .select(col(idCol), (col(idCol) === col("__keep_id")).as("__exact_ok"))
    // persisted like base: three consumers (the pair generator, the cluster
    // propagation's node list, and the decontamination candidate set) would
    // otherwise each re-run the md5 window + id join above
    val baseExact = base.join(exactFlags.filter(col("__exact_ok")), Seq(idCol))
      .select(base.columns.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 4. near-dup clusters over exact survivors; cluster reps survive
    val pairs = Dedup.ngramJaccardPairs(baseExact, idCol, textCol,
      cfg.blockCols, cfg.shingleLen, cfg.minJaccard)
    val nearFlags = Dedup.duplicateClusters(baseExact, idCol, pairs)
      .select(col("id").as(idCol), (col("cluster_id") === col("id")).as("__near_ok"))
    val baseNear = baseExact.join(nearFlags.filter(col("__near_ok")), Seq(idCol))
      .select(baseExact.columns.map(col): _*)

    // 5. decontamination over near-dup survivors
    val contaminated = Dedup.decontaminate(baseNear, bench, idCol, textCol,
        cfg.decontamN, cfg.minOverlap)
      .select(col("doc_id").as(idCol), lit(true).as("__contaminated"))

    // 6. sampling is a pure predicate — evaluated narrow on the full frame;
    // the when-chain applies it only to docs that survived stages 1-5
    val sampleOk = TextOps.sampleKeep(col(idCol), col(cfg.strataCol),
      cfg.ratesPct, cfg.defaultPct)

    flagged
      .join(exactFlags, Seq(idCol), "left")
      .join(nearFlags, Seq(idCol), "left")
      .join(contaminated, Seq(idCol), "left")
      .withColumn("drop_stage",
        // coalesce(.., false): a NULL quality/lang verdict (null text) must
        // drop HERE, not fall through to the later branches
        when(not(coalesce(col("__quality_ok"), lit(false))), "quality")
          .when(not(coalesce(col("__lang_ok"), lit(false))), "lang")
          // null flags (doc not in the stage's candidate set) fall through:
          // an earlier branch already claimed the doc
          .when(!col("__exact_ok"), "exact_dup")
          .when(!col("__near_ok"), "near_dup")
          .when(col("__contaminated"), "contaminated")
          .when(!sampleOk, "sampled"))
      .drop("__quality_ok", "__lang_ok", "__exact_ok", "__near_ok", "__contaminated")
  }

  /** Per-stage attrition report over [[curate]] output: one aggregation,
    * one row per stage (plus `kept`). */
  def funnel(labeled: DataFrame): DataFrame =
    labeled
      .groupBy(coalesce(col("drop_stage"), lit("kept")).as("stage"))
      .agg(count(lit(1)).as("n_docs"))

  /** The stages [[curate]] can assign, in pipeline order. */
  val Stages: Seq[String] =
    Seq("quality", "lang", "exact_dup", "near_dup", "contaminated", "sampled")

  /** Attach single-pass funnel metrics to a labeled frame: the returned
    * `Observation` accumulates per-stage drop counts WHILE whatever action
    * consumes the frame runs (typically the curated-corpus write), so the
    * attrition report costs zero extra scans — [[funnel]] as a separate
    * aggregation re-reads the corpus. `obs.get` blocks until the first
    * action on the returned frame completes; metrics are accumulator-side,
    * exactly-once per successful action. */
  def observed(labeled: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("curation_funnel")
    val metrics = Stages.map(s =>
      count(when(col("drop_stage") === s, 1)).as(s)) :+
      count(when(col("drop_stage").isNull, 1)).as("kept")
    (labeled.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
