package graft.linalg

/** Tiny dense linear algebra for the per-entity ridge solves (d ≈ 12).
  * Plain-array Cholesky — runs once per ENTITY (not per rating) inside the
  * post-aggregation map, so no BLAS dependency is worth the dispatch cost.
  *
  * Math mirrors the reference's cho_factor/cho_solve usage
  * (/root/reference/explicit_ratings/prac_1.py:88-93) — standard
  * Cholesky-based SPD solve, as in MLlib's CholeskyDecomposition.
  */
object Linalg {

  /** Unpack an upper-triangle row-major packed matrix into a full symmetric
    * d×d array. */
  def unpackSymmetric(packed: Seq[Double], d: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](d, d)
    var k = 0; var i = 0
    while (i < d) {
      var j = i
      while (j < d) { m(i)(j) = packed(k); m(j)(i) = packed(k); j += 1; k += 1 }
      i += 1
    }
    m
  }

  /** Solve A x = b for SPD A via Cholesky (A = L·Lᵀ, forward+back substitution).
    * Mutates nothing; returns x. */
  def choleskySolve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val d = b.length
    val l = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        var s = a(i)(j)
        var k = 0
        while (k < j) { s -= l(i)(k) * l(j)(k); k += 1 }
        if (i == j) {
          require(s > 0, s"matrix not positive definite (pivot $s at $i)")
          l(i)(i) = math.sqrt(s)
        } else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    // forward: L y = b
    val y = new Array[Double](d)
    i = 0
    while (i < d) {
      var s = b(i)
      var k = 0
      while (k < i) { s -= l(i)(k) * y(k); k += 1 }
      y(i) = s / l(i)(i)
      i += 1
    }
    // back: Lᵀ x = y
    val x = new Array[Double](d)
    i = d - 1
    while (i >= 0) {
      var s = y(i)
      var k = i + 1
      while (k < d) { s -= l(k)(i) * x(k); k += 1 }
      x(i) = s / l(i)(i)
      i -= 1
    }
    x
  }

  /** Ridge normal-equation solve: (λ·G + τI) x = λ·rhs, with G the packed
    * Gramian. */
  def ridgeSolve(packedGram: Seq[Double], rhs: Array[Double],
                 lambda: Double, tau: Double): Array[Double] =
    ridgeSolveWithPrior(packedGram, rhs, new Array[Double](rhs.length), lambda, tau)

  /** Genre-prior variant: (λ·G + τI) x = λ·rhs + prior
    * (/root/reference/explicit_ratings/incl_genre.py:188-193). */
  def ridgeSolveWithPrior(packedGram: Seq[Double], rhs: Array[Double],
                          prior: Array[Double], lambda: Double, tau: Double): Array[Double] = {
    val d = rhs.length
    val a = unpackSymmetric(packedGram, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { a(i)(j) *= lambda; j += 1 }
      a(i)(i) += tau
      i += 1
    }
    choleskySolve(a, Array.tabulate(d)(i => lambda * rhs(i) + prior(i)))
  }
}
