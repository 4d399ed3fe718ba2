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
    df.write.mode("overwrite")
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
