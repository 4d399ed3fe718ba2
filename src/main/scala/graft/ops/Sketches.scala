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
}
