package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.col

/** Physical-layout helpers. */
object Layout {

  /** Spread rows across the session's shuffle parallelism BEFORE an
    * expensive per-row projection (sketch kernels, multi-regex scoring) —
    * but only when needed: a single-split local file would otherwise
    * serialize the whole map onto one core (AQE only coalesces, never
    * splits a stage's input). On a real corpus with >= nPart input splits
    * this is a no-op, so the at-scale plan pays NO extra shuffle.
    *
    * Shuffle-rooted frames (aggregate/join/window/... anywhere in the plan)
    * are returned unchanged WITHOUT probing: their parallelism already
    * comes from the shuffle, and probing `df.rdd` on such a plan would
    * eagerly execute the upstream stages under AQE (the final-plan
    * resolution materializes query stages) only to read a partition count.
    * For the remaining narrow-over-scan plans the probe is free — no
    * exchanges means no jobs run. */
  def spread(df: DataFrame, idCol: String): DataFrame = {
    val hasShuffle = df.queryExecution.analyzed.collectFirst {
      case _: Aggregate | _: Join | _: Window | _: Sort | _: Distinct |
           _: RepartitionOperation | _: GlobalLimit => true
    }.isDefined
    if (hasShuffle) df
    else {
      val n = df.sparkSession.sessionState.conf.numShufflePartitions
      if (df.rdd.getNumPartitions >= n) df
      else df.repartition(n, col(idCol))
    }
  }
}
