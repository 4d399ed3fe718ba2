package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over event tables: as-of join (latest matching
  * row at-or-before each probe time) and bounded-gap interval self-pairs.
  *
  * Both are designed around the one-shape-that-scales for their semantics:
  *
  *  - [[asofJoin]] is the UNION + running-window form — one shuffle on the
  *    join key, no join operator at all. The classic join formulation
  *    (equi-join on key + per-row "latest earlier" range filter) either
  *    explodes to the full |left|×|right| per-key product before its
  *    filter, or needs a range-join strategy Spark lacks natively; the
  *    union form exchanges each row exactly once and the "latest at or
  *    before" is a running `last(ignoreNulls)` over the merged time order —
  *    the same partial-state shape a 1000-executor sort-merge handles
  *    without skew (state per key is one struct, not a buffer).
  *  - [[intervalPairs]] blocks time into `maxGap`-wide bins so the
  *    quadratic pair generation is confined to (key, adjacent-bin) buckets:
  *    each left row is exploded to its own bin and the next (a pair within
  *    the gap spans at most one bin boundary — the pigeonhole argument of
  *    the SimHash chunk blocking, in time), the join is a plain equi-join
  *    on (key, bin), and each qualifying pair is produced exactly once
  *    (the right row sits in ONE bin). No cross product, no range-join
  *    fallback to BroadcastNestedLoopJoin.
  */
object TimeJoins {

  /** As-of join: for every `left` row, the single `right` row with the
    * largest (time, id) at-or-before the left row's time, per join key.
    * Inclusive at equal times (a right row AT the probe time matches);
    * among right ties on time, the largest id wins — deterministic on any
    * partitioning.
    *
    * Output: `keys..., tsCol, idCol` from the left row, plus `r_ts`/`r_id`
    * (the matched right row's time and id) and the requested `payload`
    * columns from the matched right row — all NULL when the key has no
    * right row at or before the probe time (left-outer semantics).
    *
    * Both inputs must carry `keys`, `tsCol` and `idCol`; `payload` names
    * right-side columns. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, idCol: String, payload: Seq[String]): DataFrame = {
    val reserved = Set("r_ts", "r_id") ++ keys + tsCol + idCol
    require(!payload.exists(reserved),
      s"payload columns ${payload.filter(reserved).mkString(", ")} collide " +
        "with the as-of output columns (r_ts, r_id, keys, time, id)")
    val rp = right.select(
      keys.map(col) ++ Seq(col(tsCol), col(idCol), lit(0).as("__side"),
        struct(col(tsCol).as("r_ts") +: col(idCol).as("r_id") +:
          payload.map(col): _*).as("__r")): _*)
    // the left side carries a NULL match-struct of the same type, so the
    // running last(ignoreNulls) only ever picks up right-side rows
    val rType = rp.schema("__r").dataType
    val lp = left.select(
      keys.map(col) ++ Seq(col(tsCol), col(idCol), lit(1).as("__side"),
        lit(null).cast(rType).as("__r")): _*)
    // right rows sort BEFORE left rows at equal time (side 0 < 1): inclusive
    // at-or-before semantics fall out of the merge order
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rp.unionByName(lp)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col(tsCol), col(idCol),
        col("__m.r_ts").as("r_ts"), col("__m.r_id").as("r_id")) ++
        payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Bounded-gap pairs: all ordered pairs of rows sharing `keys` whose
    * times differ by at most `maxGapSec` seconds. Orientation: the pair is
    * emitted once, with (a) the (time, id)-smaller row — so self-pairs and
    * double counting are impossible. Gap compared in exact integer
    * microseconds.
    *
    * Output: `keys..., id_a, id_b, gap_us`.
    *
    * Scale shape: rows land in floor(t / gap) bins; the left branch
    * explodes each row to (bin, bin+1) — a pair within the gap spans at
    * most one bin boundary, so the (keys, bin) equi-join sees every
    * qualifying pair exactly once (the right row sits in exactly one bin).
    * The quadratic term is confined to same-(key, bin) groups, i.e. to
    * genuinely bursty keys; everything else is one shuffle per side. */
  def intervalPairs(df: DataFrame, keys: Seq[String], tsCol: String,
                    idCol: String, maxGapSec: Long): DataFrame = {
    require(maxGapSec > 0, "maxGapSec must be positive")
    val gapUs = maxGapSec * 1000000L
    // all-integer binning (`div`, not a double division) so the bin edges
    // are exact and a SQL oracle replays them bit-for-bit
    val binned = df.select(
        keys.map(col) ++ Seq(unix_micros(col(tsCol)).as("__t"),
          col(idCol).as("__id")): _*)
      .withColumn("__bin", expr(s"__t div ${gapUs}L"))
    val a = binned.select(
      keys.map(col) ++ Seq(col("__t").as("__ta"), col("__id").as("id_a"),
        explode(array(col("__bin"), col("__bin") + 1L)).as("__bin")): _*)
    val b = binned.select(
      keys.map(col) ++ Seq(col("__t").as("__tb"), col("__id").as("id_b"),
        col("__bin")): _*)
    a.join(b, keys :+ "__bin")
      .filter(col("__tb") - col("__ta") <= gapUs &&
        (col("__ta") < col("__tb") ||
          (col("__ta") === col("__tb") && col("id_a") < col("id_b"))))
      .select(keys.map(col) ++ Seq(col("id_a"), col("id_b"),
        (col("__tb") - col("__ta")).as("gap_us")): _*)
  }
}
