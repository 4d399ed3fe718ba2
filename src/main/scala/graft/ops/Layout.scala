package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical-layout helpers. */
object Layout {

  /** Spread rows across the session's shuffle parallelism BEFORE an
    * expensive per-row projection (sketch kernels, multi-regex scoring) —
    * but only when the upstream plan has fewer partitions than that: a
    * single-split local file would otherwise serialize the whole map onto
    * one core (AQE can't help — it only coalesces, never splits a stage's
    * input). On a real corpus with >= nPart input splits this is a no-op,
    * so the at-scale plan pays NO extra shuffle. */
  def spread(df: DataFrame, idCol: String): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= n) df
    else df.repartition(n, col(idCol))
  }
}
