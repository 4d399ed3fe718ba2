package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-replayable distributed k-means (Lloyd's) over integer-quantized
  * embeddings — the clustering layer of the curation pipeline (semantic
  * grouping for cluster-balanced sampling, IVF codebook refresh, corpus
  * diversity audits).
  *
  * [[Similarity.kmeansCodebook]] already fits production codebooks via
  * `ml.clustering.KMeans`; what that path cannot give is a value-exact
  * oracle — MLlib's float accumulation is partition-order dependent, so a
  * reference system can only check it statistically (the q114 problem all
  * over again). This operator makes the FIT itself oracle-checkable:
  *
  *   - vectors are quantized up front: `floor(v · scale)` as BIGINT — an
  *     IEEE-deterministic map every engine replays bit-for-bit;
  *   - the seed codebook is the k lowest-id vectors — no RNG to mirror;
  *   - assignment is squared-L2 argmin with ties toward the lowest cell
  *     (the [[Similarity.nearestCell]] contract, exact on integers: the
  *     distance doubles are exact while dim·(2·scale·max|v|)² < 2⁵³);
  *   - the update is an integer mean, `floorDiv(Σq, n)` — grouped long
  *     sums are associative, hence bit-identical under ANY partitioning
  *     (spec'd by running the fit under different repartitions);
  *   - cells that receive no vectors are dropped from the codebook (the
  *     deterministic analogue of MLlib's empty-cluster reseeding).
  *
  * Scale shape: one narrow scan per sweep; the aggregation is a typed
  * [[Aggregators.LongVectorSum]] with primitive-array buffers, so the
  * shuffle carries one k×d long buffer per partition and the driver holds
  * exactly k×(d+1) longs of state per sweep — MLlib's movement, none of
  * its nondeterminism. Centroids enter the plan as literal arrays (the
  * IVF-family contract), so k is bounded by plan size — the documented
  * k ≲ 4096 cap shared with [[Similarity.ivfSearch]]; beyond that,
  * clustering IS the IVF store build.
  *
  * Exactness bounds, stated once: quantized coordinates |q| ≤ scale·max|v|;
  * grouped sums are exact while n_cell·scale·max|v| < 2⁶³ (longs), and the
  * oracle's double replay of the division is floor-exact while
  * n_cell < ~2⁴⁰. The engine itself uses [[java.lang.Math#floorDiv]] —
  * exact at any n.
  */
object Cluster {

  /** Centroids in quantized units, integer-valued doubles so the whole
    * IVF expression family ([[Similarity.nearestCell]]) applies verbatim;
    * `counts` are the final-sweep assignment sizes (cell → n). */
  final case class KmeansFit(centroids: Seq[(Long, Seq[Double])],
                             counts: Map[Long, Long], scale: Long)

  /** `floor(v·scale)` per coordinate as BIGINT. Deterministic: the float
    * widens to double exactly, one IEEE multiply, one floor. */
  def quantized(vecCol: Column, scale: Long): Column =
    transform(vecCol.cast("array<double>"),
      v => floor(v * lit(scale.toDouble)).cast("long"))

  private def quantizedInput(df: DataFrame, idCol: String, vecCol: String,
                             scale: Long): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        quantized(col(vecCol), scale).as("qv"))

  /** Seed codebook: the k lowest-id vectors, cell ids 0..k-1 in id order.
    * A deterministic, SQL-trivial init — Lloyd's converges from any seed;
    * what the engine owes the oracle is replayability, not seed quality
    * (production fits seeking better seeds sample ids by xxhash64 first —
    * same contract, still replayable). */
  def initCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
                    scale: Long): Seq[(Long, Seq[Double])] = {
    require(k > 0, "k must be positive")
    require(scale > 0, "scale must be positive")
    seedFromQuantized(quantizedInput(df, idCol, vecCol, scale), k)
  }

  private def seedFromQuantized(q: DataFrame, k: Int): Seq[(Long, Seq[Double])] = {
    val rows = q.orderBy(col("id")).limit(k).collect()
    require(rows.nonEmpty,
      "k-means seed: input has no non-NULL vectors — nothing to cluster")
    rows.zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Long](1).map(_.toDouble)) }
      .toSeq
  }

  /** One Lloyd sweep against a fixed codebook: returns the post-update
    * codebook (empty cells dropped) and the assignment counts that
    * produced it. ≤ k rows ever reach the driver. */
  private def sweep(q: DataFrame, cents: Seq[(Long, Seq[Double])],
                    dim: Int): (Seq[(Long, Seq[Double])], Map[Long, Long]) = {
    val vecSum = udaf(new Aggregators.LongVectorSum(dim))
    val rows = q
      .withColumn("cell",
        Similarity.nearestCell(col("qv").cast("array<double>"), cents))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), vecSum(col("qv")).as("s"))
      .collect()
    val next = rows.map { r =>
      val n = r.getLong(1)
      (r.getLong(0), r.getSeq[Long](2).map(Math.floorDiv(_, n).toDouble))
    }.sortBy(_._1).toSeq
    (next, rows.map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  /** Fit: `iters` Lloyd sweeps from the lowest-id seed codebook. The
    * returned counts are the FINAL sweep's assignment sizes — i.e. the
    * sizes of the cells whose means became the returned centroids. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
          scale: Long = 10000L): KmeansFit = {
    require(iters >= 1, "need at least one sweep (init alone has no counts)")
    require(k > 0, "k must be positive")
    // centroids enter the plan as literal arrays (the IVF-family
    // contract): k x d literals. Past ~4096 cells the expression tree
    // itself becomes the bottleneck — at that size clustering IS the IVF
    // store build: fit a codebook with Similarity.kmeansCodebook /
    // autoCodebook and partition through writeIvfStore instead.
    require(k <= 4096,
      s"k=$k exceeds the literal-codebook plan bound (4096); use " +
        "Similarity.kmeansCodebook/autoCodebook + writeIvfStore at this scale")
    require(scale > 0, "scale must be positive")
    val q = quantizedInput(df, idCol, vecCol, scale).persist()
    try {
      var cents = seedFromQuantized(q, k) // seeds read the cached input
      val dim = cents.head._2.length
      var counts = Map.empty[Long, Long]
      var it = 0
      while (it < iters) {
        val (c, n) = sweep(q, cents, dim); cents = c; counts = n; it += 1
      }
      KmeansFit(cents, counts, scale)
    } finally { q.unpersist(); () }
  }

  /** Assign every vector to its nearest fitted centroid: (id, cell). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             fitted: KmeansFit): DataFrame =
    quantizedInput(df, idCol, vecCol, fitted.scale)
      .select(col("id"),
        Similarity.nearestCell(col("qv").cast("array<double>"),
          fitted.centroids).as("cell"))

  /** The fit as a DataFrame — one row per (cell, dim): the quantized
    * centroid coordinate and the cell's final assignment size. This is the
    * oracle surface: every value is exact integer algebra. */
  def fitStats(spark: SparkSession, fitted: KmeansFit): DataFrame = {
    import spark.implicits._
    fitted.centroids.flatMap { case (cell, cv) =>
      cv.zipWithIndex.map { case (c, i) =>
        (cell, i.toLong, c.toLong, fitted.counts(cell)) }
    }.toDF("cell", "dim", "centroid_q", "n_assigned")
  }

  /** Cluster-balanced subsample: per cell, keep the first `quota(n_cell)`
    * rows in `orderBy` order — the curation move that caps dominant
    * semantic clusters while keeping the tail (a sqrt quota is the usual
    * temperature between "uniform over docs" and "uniform over topics").
    * `orderBy` must be a deterministic total order per cell; oracles use
    * the id itself, production calls pass a seeded hash for an unbiased
    * draw. Plans as a rank-limit window (WindowGroupLimit at k known
    * quota) — no driver state. */
  def balancedSample(assigned: DataFrame, cellCol: String, orderBy: Column,
                     quota: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    assigned
      .withColumn("n_cell", count(lit(1)).over(
        Window.partitionBy(col(cellCol))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(cellCol)).orderBy(orderBy)))
      .filter(col("rn") <= quota)
      .drop("rn", "n_cell")
  }

  // ------------------------------------------------ mergeable moment store

  /** Per-batch k-means moments against a FIXED codebook: one row per cell
    * — (cell, n, s: Σq as array<long>) — written under `path/batch=<id>`.
    * The monoid twin of [[graft.ops.Projection.writeFitBatch]]: moments
    * are long sums, so folding batches in any order equals the one-shot
    * sweep bit-for-bit, and a centroid refresh after new data lands reads
    * k rows per batch instead of rescanning the corpus. */
  def writeMomentBatch(df: DataFrame, idCol: String, vecCol: String,
                       cents: Seq[(Long, Seq[Double])], scale: Long,
                       path: String, batchId: Long): Unit = {
    val dim = cents.head._2.length
    val vecSum = udaf(new Aggregators.LongVectorSum(dim))
    quantizedInput(df, idCol, vecCol, scale)
      .withColumn("cell",
        Similarity.nearestCell(col("qv").cast("array<double>"), cents))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), vecSum(col("qv")).as("s"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/batch=$batchId")
  }

  /** Fold the moment store into refreshed centroids + counts — exactly
    * the [[fit]] sweep the batches jointly describe. Reads ≤ k rows per
    * batch; long addition makes the fold order-independent. */
  def centroidsFromMoments(spark: SparkSession, path: String,
                           scale: Long): KmeansFit = {
    val rows = spark.read.option("basePath", path).parquet(path)
      .select(col("cell"), col("n"), col("s")).collect()
    require(rows.nonEmpty, s"centroidsFromMoments: no batches under $path")
    val byCell = rows.groupBy(_.getLong(0))
    val cents = byCell.toSeq.map { case (cell, rs) =>
      val n = rs.map(_.getLong(1)).sum
      val dim = rs.head.getSeq[Long](2).length
      val s = new Array[Long](dim)
      rs.foreach { r =>
        val v = r.getSeq[Long](2)
        var i = 0; while (i < dim) { s(i) += v(i); i += 1 }
      }
      (cell, n, s.toSeq.map(Math.floorDiv(_, n).toDouble))
    }.sortBy(_._1)
    KmeansFit(cents.map(c => (c._1, c._3)),
      cents.map(c => c._1 -> c._2).toMap, scale)
  }
}
