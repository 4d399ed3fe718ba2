package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregations — the diagnostics a 100-TB run
  * uses where exact answers would shuffle corpus-sized state:
  *
  *  - [[approxDistinct]]: HyperLogLog++ distinct counts. The sketch buffer
  *    is a few KB per group REGARDLESS of cardinality and merges
  *    associatively, so partial aggregation combines map-side and the
  *    exchange carries one sketch per (group, partition) — exact
  *    `countDistinct` re-shuffles every distinct value.
  *  - [[approxQuantiles]]: Greenwald-Khanna quantile summaries, same
  *    bounded-buffer partial-merge story vs an exact `percentile` sort.
  *
  * These are deliberately NOT declared as oracle queries: sketch internals
  * (HLL register layout, GK compression) are engine-specific, so an
  * external SQL engine cannot replay the value bit-for-bit. Their contract
  * is an ERROR BOUND against the exact operator, which is what
  * `SketchSpec` verifies — alongside the plan shape (partial aggregation
  * present) that makes them cheap. The exact counterparts (q11 distinct
  * count, q14/q34 percentiles) remain the declared queries. */
object Sketches {

  /** Approximate distinct count per group (HLL++, `rsd` relative standard
    * deviation — Spark's default 0.05 ≈ ±5%). */
  def approxDistinct(df: DataFrame, keyCols: Seq[Column], valueCol: Column,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(approx_count_distinct(valueCol, rsd).as("approx_distinct"))

  /** Single-pass frequent items (heavy hitters) per column — the
    * "which sources/hosts/templates dominate this corpus" diagnostic.
    * Karp-Schenker-Papadimitriou counting: each partition keeps at most
    * 1/support candidate counters and partials merge associatively, so
    * the job is one narrow pass + a counter merge — an exact groupBy-count
    * would shuffle every distinct value. Guarantee is one-sided: every
    * item with frequency > support IS in the result; infrequent false
    * positives may accompany it (filter with an exact count over just the
    * returned candidates — candidate-set sized, cheap — if exactness
    * matters downstream). */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double): DataFrame = {
    require(support > 1e-4 && support < 1.0, "support must be in (1e-4, 1)")
    df.stat.freqItems(cols.toArray, support)
  }

  /** PROVABLY-EXACT top-k keys from the sketch pass — the exception to
    * this object's approximate-only rule, and the 100-TB answer to "top
    * 1000 domains/templates/terms" that q66's full-shuffle vocabulary
    * pays |distinct keys| exchange rows for:
    *
    *  1. a [[frequentItems]] sweep (KSP counters, ≤1/support per
    *     partition, associative merge — no corpus shuffle) proposes
    *     candidates; its one-sided guarantee means every key with
    *     frequency > support·N is proposed;
    *  2. ONE exact aggregation whose groups are `key if candidate else
    *     null` — the exchange is bounded by the candidate count, and the
    *     null bucket's count closes the total N without a second job;
    *  3. the top-k of the exact candidate counts (count desc, key asc) is
    *     returned IFF the k-th count exceeds support·N — then every key
    *     tied-or-above it was necessarily proposed in (1), so the result
    *     provably equals the full-shuffle top-k. Below the bar the data
    *     has no provable top-k at this support and the call throws
    *     (lower `support` and retry) rather than silently approximating.
    *
    * Same two-bounded-passes pattern as [[ScaleJoins.detectHotKeys]],
    * pointed at ranked top-k with an exactness certificate instead of a
    * threshold key set. Null keys count toward N but never rank. Output
    * (key STRING, cnt, rank) — the key stringifies for a stable schema
    * across key types. */
  def exactTopKeys(df: DataFrame, keyCol: String, k: Int,
                   support: Double): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(support > 1e-4 && support < 1.0, "support must be in (1e-4, 1)")
    val keyed = df.select(col(keyCol).as("key"))
    val cands = keyed.stat.freqItems(Array("key"), support)
      .head().getSeq[Any](0).filter(_ != null)
    // exact pass: candidate keys group individually, everything else —
    // including true nulls — folds into the null bucket (rest count)
    val counts = keyed
      .groupBy(when(col("key").isin(cands: _*), col("key")).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.get(0)), r.getLong(1)))
    val total = counts.map(_._2).sum
    val ranked = counts.collect { case (Some(key), n) => (key, n) }
      .sortBy { case (key, n) => (-n, String.valueOf(key)) }
      .take(k)
    if (ranked.size < k || ranked.last._2 <= support * total)
      throw new IllegalStateException(
        s"top-$k not provable at support=$support: " +
          (if (ranked.size < k) s"only ${ranked.size} candidates"
           else s"k-th count ${ranked.last._2} <= ${support * total}") +
          "; lower support and retry")
    val spark = df.sparkSession
    import spark.implicits._
    ranked.zipWithIndex
      .map { case ((key, n), i) => (String.valueOf(key), n, (i + 1).toLong) }
      .toSeq.toDF("key", "cnt", "rank")
  }

  /** Approximate quantiles per group (Greenwald-Khanna, `accuracy` =
    * 1/relative-error; 10000 ≈ 1e-4 rank error). */
  def approxQuantiles(df: DataFrame, keyCols: Seq[Column], valueCol: Column,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be within [0, 1]")
    df.groupBy(keyCols: _*)
      .agg(percentile_approx(valueCol, lit(probs.toArray), lit(accuracy))
        .as("approx_quantiles"))
  }

  /** Persist one Apache-Datasketches HLL sketch per group for THIS batch
    * (`path/batch=B` directories of (group, sketch-binary) rows) — the
    * incremental-cardinality sibling of
    * [[Layout.mergedShardManifest]]'s monoid manifest: distinct counts
    * over a growing corpus without ever rescanning it. Each batch pays
    * one KB-per-group sketch aggregation over ITS OWN rows; the corpus
    * answer is [[mergedDistinct]] over the stored sketches. HLL union
    * takes register maxima, so merging per-batch sketches yields the
    * IDENTICAL sketch state (and therefore estimate) a one-shot
    * aggregation of the union would build — not an approximation OF an
    * approximation (spec'd). Overwrite per batch directory = the
    * replay-idempotence contract of every store in this engine. */
  def writeDistinctSketches(df: DataFrame, groupCol: String, valueCol: Column,
                            path: String, batchId: Long,
                            lgK: Int = 12): Unit =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("sketch"))
      .write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** Fold every per-batch sketch directory into corpus-wide distinct
    * estimates: (group, approx_distinct). Input is batches × groups
    * KB-sized sketch rows — trivially small at any corpus size. */
  def mergedDistinct(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)
      .groupBy(col(keyOf(spark, path)))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_distinct"))

  // the group column is whatever non-(sketch, batch) column the store has
  private def keyOf(spark: org.apache.spark.sql.SparkSession,
                    path: String): String =
    spark.read.option("basePath", path).parquet(path)
      .columns.filterNot(c => c == "sketch" || c == "batch").head

  /** Incremental QUANTILES, the rank sibling of the HLL store: per-batch
    * value histograms (`path/batch=B` of (group, bin, cnt) rows) whose
    * bin counts form a monoid — merging batches is a plain count sum, so
    * quantiles over a growing corpus never rescan it. For integral-valued
    * columns the identity binning makes the merged answer EXACT (the
    * declared-query contract); continuous columns pick a binning and get
    * bin-width-bounded error, the standard trade. Each batch pays one
    * (group, bin)-keyed aggregation over its own rows, map-side combined;
    * the stored frame is groups × bins — corpus-size-independent.
    * Overwrite per batch directory = the replay-idempotence contract of
    * every store in this engine. */
  def writeValueHistograms(df: DataFrame, groupCol: String, valueCol: Column,
                           path: String, batchId: Long): Unit =
    // NULL values are EXCLUDED (quantile_disc/percentile_disc semantics —
    // the contract [[mergedQuantiles]] documents): a NULL bin would sort
    // first in the cumulative window and count into N, skewing every
    // quantile relative to the oracle
    df.select(col(groupCol), valueCol.cast("long").as("bin"))
      .filter(col("bin").isNotNull)
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** Fold every per-batch histogram into corpus-wide bin counts:
    * (group, bin, cnt). Input is batches × groups × bins rows — tiny. */
  def mergedHistogram(spark: org.apache.spark.sql.SparkSession, path: String,
                      groupCol: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)
      .groupBy(col(groupCol), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Discrete (type-1 / percentile_disc) quantiles from the merged store:
    * for each group and probability p, the smallest bin whose cumulative
    * count reaches ceil(p·N) — exactly DuckDB/PostgreSQL
    * `quantile_disc`/`percentile_disc` semantics (NULL values never enter
    * the store — [[writeValueHistograms]] drops them — so N counts only
    * non-NULL rows, matching those functions' NULL handling), so the
    * declared query replays bit-for-bit at the identity-binning exactness
    * point. All
    * windows/aggregates here run over the groups × bins histogram, never
    * the corpus. */
  def mergedQuantiles(spark: org.apache.spark.sql.SparkSession, path: String,
                      groupCol: String, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      "probs must be within (0, 1]")
    val h = mergedHistogram(spark, path, groupCol)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("bin"))
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    h.withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wTot))
      .select(col(groupCol), col("bin"), col("cum"), col("n"),
        explode(typedLit(probs)).as("p"))
      .filter(col("cum") >= ceil(col("p") * col("n")))
      .groupBy(col(groupCol), col("p"))
      .agg(min(col("bin")).as("q"))
  }
}
