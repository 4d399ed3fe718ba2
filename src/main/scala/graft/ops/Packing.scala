package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy sequence packing — documents placed, in a deterministic order,
  * into consecutive fixed-token-budget blocks (the training-batch
  * construction step of an LLM data pipeline: blocks become context
  * windows; fill rate is the metric that decides token waste at trainer
  * time).
  *
  * Semantics, stated once and replayed exactly by the oracle's recursive
  * CTE: within a shard, walk documents in `orderCol` order keeping a
  * running fill; a document whose tokens would push fill past `budget`
  * starts the next block (so a single oversize document occupies a block
  * of its own — flagged downstream by fill > budget, never dropped
  * silently here; dropping is a curation decision, not a packing one).
  *
  * This is an honest sequential recurrence — block boundaries depend on
  * every earlier document in the shard — so it CANNOT be a window
  * function (a running-sum bucketing `floor(cumsum/budget)` mis-splits
  * whenever a document straddles a boundary). The scale unit is the
  * shard: `repartition(shardCol)` then `sortWithinPartitions(shard,
  * order)` puts whole shards, in order, inside single partitions, and a
  * streaming per-partition fold packs each shard in O(1) memory —
  * mapPartitions used for what it is for: per-partition imperative logic
  * Catalyst cannot express. Shard count is the parallelism knob: pick
  * ~#cores shards locally, thousands on a cluster; the fold never holds
  * more than one (shard, block, fill) triple of state.
  *
  * Determinism on any cluster: hash partitioning by shard puts each
  * shard's rows in exactly one task, the within-partition sort fixes the
  * walk order, and the fold is a pure function of that order — the same
  * packing on any executor count.
  */
object Packing {

  /** Per-document block assignment: (id, shard, block, off, n_tok) with
    * `block` numbered from 0 within each shard and `off` the token offset
    * of the document inside its block. */
  def greedyPack(df: DataFrame, idCol: String, shardCol: Column,
                 orderCol: Column, tokCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // NULL or negative token counts would silently corrupt every later
    // block boundary in the shard — reject them in-flight, loudly (the
    // addTombstones pattern), instead of coercing.
    val prepared = df.select(
        shardCol.cast("long").as("shard"), orderCol.cast("long").as("ord"),
        col(idCol).cast("long").as("id"), tokCol.cast("long").as("n_tok"))
      .withColumn("n_tok",
        when(col("n_tok").isNull || col("n_tok") < 0L,
          raise_error(concat(lit("greedyPack: NULL or negative token count for id "),
            col("id").cast("string"))))
          .otherwise(col("n_tok")))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .as[(Long, Long, Long, Long)]
    prepared.mapPartitions { it =>
      var shard = Long.MinValue
      var block = -1L
      var fill = 0L
      it.map { case (s, _, id, tok) =>
        if (s != shard || fill + tok > budget) {
          block = if (s != shard) 0L else block + 1L
          shard = s; fill = 0L
        }
        val off = fill
        fill += tok
        (id, s, block, off, tok)
      }
    }.toDF("id", "shard", "block", "off", "n_tok")
  }

  /** Block-level fill accounting over a [[greedyPack]] assignment:
    * (shard, block, n_docs, fill, waste) — waste is clamped at 0 for the
    * oversize-document blocks the packer deliberately lets exceed the
    * budget. */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("block"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("fill"))
      .withColumn("waste", greatest(lit(budget) - col("fill"), lit(0L)))
}
