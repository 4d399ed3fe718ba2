package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the 100-TB design point that local-mode correctness
  * tests can't motivate but cluster economics demand (SURVEY §2.3 note, §4):
  *
  *  - bucketed co-located joins: pre-shuffle both fact tables once at write
  *    time; every subsequent equi-join on the bucket key is exchange-free;
  *  - salted joins: spread a skewed hot key over `saltFactor` sub-keys by
  *    replicating the (small) build side, bounding the largest task. AQE's
  *    skew-join splitting handles moderate skew at runtime; salting is the
  *    explicit fallback for pathological keys known in advance.
  */
object ScaleJoins {

  /** Write `df` bucketed+sorted by `key` into `numBuckets` buckets as a
    * managed table — the write-time shuffle that later joins amortize. */
  def writeBucketed(df: DataFrame, key: String, numBuckets: Int,
                    table: String): Unit =
    Stores.bucketAligned(df, numBuckets, key)
      .write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * Exchange (verified in ScaleJoinsSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Salted equi-join for a skewed LEFT side: the left key gains a salt in
    * [0, saltFactor); the right side is replicated across all salt values.
    * Result is identical to `left.join(right, key)` — the shuffle just
    * spreads each hot key across `saltFactor` reducers.
    *
    * The salt is a CONTENT hash of the left row (seeded xxhash64), not
    * `monotonically_increasing_id`: id-derived salt varies with partition
    * layout, so task-level row placement — and therefore spill/skew
    * behavior — would differ run to run even though results don't.
    * Content-derived salt is reproducible on any partitioning.
    *
    * `saltCols` picks which columns feed the hash; Nil (default) hashes
    * the whole row. Pass a small set of cheap columns that DIFFER between
    * rows sharing a hot key (a fact-side line number, a secondary id) to
    * keep the hash off the wide strings — hashing a 16-column row with a
    * long comment costs ~20% of the whole join at sf0.1. Rows identical
    * on the salt columns co-locate on one sub-key — acceptable, since
    * skew comes from hot KEYS whose rows differ off-key, not from
    * byte-identical row floods. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, seed: Long = 42L,
                 saltCols: Seq[String] = Nil): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val hashed = (if (saltCols.nonEmpty) saltCols else left.columns.toSeq).map(col)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(lit(seed) +: hashed: _*), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Exact hot-key detection in two bounded passes: a single narrow
    * `freqItems` sweep (KSP counters, at most 1/support candidates per
    * partition, associative merge — no corpus shuffle) proposes
    * candidates, then ONE aggregation over just the candidate rows counts
    * them exactly and keeps keys with frequency >= support. freqItems'
    * guarantee is one-sided (every key above support is proposed, false
    * positives possible) — the exact pass kills the false positives, so
    * the result is precisely the >= support key set. Both jobs are
    * candidate-bounded: nothing corpus-sized shuffles or collects. */
  def detectHotKeys(df: DataFrame, key: String, support: Double): Seq[Any] = {
    require(support > 1e-4 && support < 1.0, "support must be in (1e-4, 1)")
    val cands = df.stat.freqItems(Array(key), support)
      .head().getSeq[Any](0).filter(_ != null)
    if (cands.isEmpty) return Nil
    // candidate-bounded collect: at most 1/support rows
    val counts = df.filter(col(key).isin(cands: _*))
      .groupBy(col(key)).agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.get(0), r.getLong(1)))
    val rest = df.filter(!col(key).isin(cands: _*) || col(key).isNull).count()
    val total = counts.map(_._2).sum + rest
    counts.filter { case (_, n) => n >= support * total }.map(_._1).toSeq
  }

  /** Skew join by hot/cold split: rows with a key in `hotKeys` join
    * against a BROADCAST slice of the right side restricted to those keys
    * — the hot rows never shuffle at all, the one task-size bomb is
    * defused at the source; everything else takes the plain shuffle join.
    * Result == `left.join(right, key)` for non-null-key rows (inner join;
    * null keys match nothing on either path).
    *
    * This is the production alternative to [[saltedJoin]] when the hot
    * set is KNOWN (or detected via [[detectHotKeys]]): salting pays
    * saltFactor× replication of the ENTIRE right side through the
    * shuffle, the split replicates only the hot slice — and to every
    * executor once, not to saltFactor reducers. The cold join's AQE skew
    * handling stays available for moderate residual skew. Requires the
    * hot slice of the RIGHT side to fit in a broadcast (hot KEYS are few
    * by construction; a right side with corpus-sized payload per hot key
    * is the one shape this cannot help — that's a different join, not a
    * skew problem). */
  def hotKeySplitJoin(left: DataFrame, right: DataFrame, key: String,
                      hotKeys: Seq[Any]): DataFrame = {
    if (hotKeys.isEmpty) return left.join(right, Seq(key))
    val cold = left.filter(!col(key).isin(hotKeys: _*))
      .join(right.filter(!col(key).isin(hotKeys: _*)), Seq(key))
    val hot = left.filter(col(key).isin(hotKeys: _*))
      .join(broadcast(right.filter(col(key).isin(hotKeys: _*))), Seq(key))
    cold.unionByName(hot)
  }

  /** Shuffle-exchange count in a frame's executed plan (plan-shape
    * assertions). Counts only real shuffles: broadcast exchanges and
    * ReusedExchange references (which also print the word "Exchange") are
    * excluded. String-based because AQE hides pre-execution exchanges
    * inside AdaptiveSparkPlanExec, which a tree collect can't see. */
  def countExchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange")
        && !l.contains("ReusedExchange"))
}
