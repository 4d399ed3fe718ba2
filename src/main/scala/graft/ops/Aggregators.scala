package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed Aggregators for per-entity vector/Gramian accumulation —
  * the one genuinely custom Catalyst-adjacent component the reference's ALS
  * math needs (SURVEY.md §4: per-user `Σ vₙvₙᵀ` and `Σ (r−b_n−b_m)·vₙ`,
  * /root/reference/explicit_ratings/prac_1.py:79-87).
  *
  * Buffers are primitive double arrays; merge is elementwise add, so Spark
  * runs these with map-side partial aggregation — the shuffle carries one
  * d(d+1)/2-length buffer per (entity, partition), not one per rating.
  */
object Aggregators {

  private def enc: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()

  /** Elementwise sum of double arrays (Σ v). */
  class VectorSum(dim: Int) extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    def zero: Array[Double] = new Array[Double](dim)
    def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
      var i = 0; while (i < dim) { b(i) += a(i); i += 1 }; b
    }
    def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0; while (i < dim) { x(i) += y(i); i += 1 }; x
    }
    def finish(b: Array[Double]): Seq[Double] = b.toSeq
    def bufferEncoder: Encoder[Array[Double]] = enc
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Upper-triangle Gramian accumulation: Σ v·vᵀ packed row-major as
    * d(d+1)/2 doubles. */
  class GramianSum(dim: Int) extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    private val len = dim * (dim + 1) / 2
    def zero: Array[Double] = new Array[Double](len)
    def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
      var k = 0; var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { b(k) += v(i) * v(j); j += 1; k += 1 }
        i += 1
      }
      b
    }
    def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0; while (i < len) { x(i) += y(i); i += 1 }; x
    }
    def finish(b: Array[Double]): Seq[Double] = b.toSeq
    def bufferEncoder: Encoder[Array[Double]] = enc
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }
}
