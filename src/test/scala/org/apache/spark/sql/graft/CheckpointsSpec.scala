package org.apache.spark.sql.graft

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Direct contract spec for [[Checkpoints.truncate]] — the fix for the
  * compounding-stats driver-CPU bomb in iterative self-joining loops
  * (localCheckpoint copies the ESTIMATED sizeInBytes onto the
  * checkpointed plan; a loop whose output joins the previous iteration's
  * checkpoint then SQUARES the estimate per iteration, and by ~30
  * iterations the stats walk grinds million-bit BigInteger multiplies).
  * The trainers pin this only indirectly (AlsWarmStartSpec's 23-sweep
  * cold runs would effectively hang on a regression); this spec makes the
  * contract explicit, so a Spark upgrade that changes
  * rewriteStatsAndConstraints semantics or the LogicalRDD constructor
  * fails HERE by name.
  *
  * Lives in the org.apache.spark.sql.graft TEST package to read the
  * session's defaultSizeInBytes (the documented fallback when the block
  * measurement is unavailable or incomplete). */
class CheckpointsSpec extends SparkTestBase {
  import spark.implicits._

  private def stats(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** One loop step: self-join on id (the shape that squares a carried
    * estimate), doubling x. */
  private def step(df: DataFrame): DataFrame = {
    val l = df.select(col("id"), col("x").as("xl"))
    val r = df.select(col("id"), col("x").as("xr"))
    l.join(r, "id").select(col("id"), (col("xl") + col("xr")).as("x"))
  }

  test("truncate pins stats at measured-block magnitude across a self-join loop") {
    val defaultSize = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    val base = (1 to 150).map(i => (i, i.toDouble)).toDF("id", "x")
    var cur = Checkpoints.truncate(base)
    val sizes = scala.collection.mutable.ArrayBuffer(stats(cur))
    for (_ <- 1 to 4) {
      cur = Checkpoints.truncate(step(cur))
      sizes += stats(cur)
    }
    // contract: every iteration's stats are either the MEASURED block
    // size (a 150-row frame — megabyte magnitude at most) or, when the
    // async status store hasn't caught up / reports incomplete caching,
    // the CONSTANT session default — never the compounded join estimate,
    // which is strictly larger than the default after two steps
    sizes.foreach { s =>
      assert(s <= BigInt(10L << 20) || s == defaultSize,
        s"stats $s is neither measured-magnitude nor the constant default $defaultSize")
    }
    // semantics unharmed: 150 rows survive, x doubled per step (16x)
    assert(cur.count() == 150)
    assert(cur.filter(col("id") === 3).head().getDouble(1) == 48.0)

    // the poison truncate removes: the PLAIN localCheckpoint loop carries
    // the squared estimate — after 4 steps it exceeds even Long.MaxValue
    var plain = base.localCheckpoint()
    for (_ <- 1 to 4) plain = step(plain).localCheckpoint()
    assert(stats(plain) > BigInt(Long.MaxValue),
      s"expected the un-truncated loop to compound its estimate, got ${stats(plain)}")
    spark.catalog.clearCache()
  }

  test("truncateLazy stamps a constant (default) estimate before blocks exist") {
    val defaultSize = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    val base = (1 to 50).map(i => (i, i.toDouble)).toDF("id", "x")
    var cur = Checkpoints.truncateLazy(base)
    assert(stats(cur) == defaultSize)
    cur = Checkpoints.truncateLazy(step(cur))
    assert(stats(cur) == defaultSize) // constant, not compounded
    assert(cur.count() == 50)
    spark.catalog.clearCache()
  }
}
