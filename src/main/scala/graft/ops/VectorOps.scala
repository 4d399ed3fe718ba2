package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT/DOUBLE> columns using codegen'd higher-order
  * functions (no UDFs — stays inside whole-stage codegen).
  *
  * Reference ops covered: dot product / full-catalog scoring
  * (/root/reference/explicit_ratings/functions.py:599-647, L9),
  * BPR predict x(u,i)=u·v (/root/reference/implicit_feedback/functions.py:33-45, L10),
  * vector norms in the regularized log-likelihood
  * (/root/reference/explicit_ratings/functions.py:49-116, A11).
  *
  * Elements are cast to double BEFORE multiplying so results are exact
  * float32→float64 promotions — keeps parity with any f64 oracle and avoids
  * f32 rounding drift at 100-TB aggregate scale.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ — left-to-right sum (deterministic). Backed by the codegen'd
    * [[graft.functions.DotProduct]] expression; `dotHof` keeps the pure
    * built-in higher-order-function formulation (CodegenFallback, ~20×
    * slower per call) as the cross-check reference. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_product(a, b)

  /** Built-ins-only dot product (SURVEY §4: expressible without custom
    * Catalyst work). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Σ aᵢ² */
  def normSq(a: Column): Column = dot(a, a)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** cos(a,b) = a·b / (‖a‖‖b‖). A zero-norm vector has no defined cosine:
    * the denominator is NULLIF-guarded, so degenerate vectors yield NULL —
    * which threshold filters and the TopK rank paths then exclude — instead
    * of an ANSI DIVIDE_BY_ZERO killing the whole job (one corrupt
    * embedding must not fail a corpus-scale query). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** [[cosine]] assembled from a dot column and PRECOMPUTED per-side norms —
    * the pair-scoring shape: inside a cross/pair join, `cosine(va, vb)`
    * evaluates three dot kernels PER PAIR (the dot plus both norms), but
    * each side's norm depends only on its own row — computing it in the
    * join-side projection costs once per ROW and rides the join. Same
    * expressions in the same order as [[cosine]] (sqrt-of-dot, NULLIF
    * guard), so results are bit-identical. */
  def cosineFromParts(dp: Column, na: Column, nb: Column): Column =
    dp / nullif(na * nb, lit(0.0))

  /** a + s·b (axpy), used by fold-in updates. */
  def axpy(s: Column, a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") + s * y.cast("double"))

  /** Elementwise scale. */
  def scale(s: Column, a: Column): Column =
    transform(a, x => x.cast("double") * s)

  /** Euclidean distance. */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, x) => acc + x))

  /** max |aᵢ| — the symmetric-quantization range statistic. Order-insensitive
    * fold (max), exact f32→f64 promotion. */
  def maxAbs(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Per-vector symmetric int8 scale: max|a| / 127 (0.0 for an all-zero
    * vector — [[quantizeInt8]] maps it to all-zero codes). */
  def int8Scale(a: Column): Column = maxAbs(a) / 127.0

  /** Symmetric int8 scalar quantization — the 4× embedding-compression step
    * an ANN store runs before writing vectors at corpus scale. Codes are
    * round-half-up of aᵢ/scale, clamped to [-127, 127]; an all-zero vector
    * (scale 0) maps to all-zero codes (the division is NULLIF-guarded, not
    * an ANSI DIVIDE_BY_ZERO).
    *
    * Rounding is `floor(x + 0.5)` ON PURPOSE, not `round()`: floor is an
    * exact IEEE operation every engine agrees on, while round() semantics
    * differ across engines (shortest-decimal HALF_UP vs binary) — this
    * keeps quantized codes bit-identical everywhere, including any SQL
    * oracle. Narrow codegen map, no shuffle. */
  def quantizeInt8(a: Column, scale: Column): Column =
    transform(a, x =>
      greatest(lit(-127L), least(lit(127L),
        // coalesce INSIDE the clamp: Spark's least/greatest SKIP nulls, so
        // a NULL from the guarded division would otherwise clamp to ±127
        // instead of 0
        coalesce(floor(x.cast("double") / nullif(scale, lit(0.0)) + 0.5d),
          lit(0L)))).cast("int"))

  /** max |aᵢ − codeᵢ·scale| — worst-case reconstruction error of
    * [[quantizeInt8]] codes. Order-insensitive max fold. */
  def dequantMaxErr(a: Column, codes: Column, scale: Column): Column =
    aggregate(
      zip_with(a, codes, (x, q) => abs(x.cast("double") - q.cast("double") * scale)),
      lit(0.0),
      (acc, x) => greatest(acc, x))
}
