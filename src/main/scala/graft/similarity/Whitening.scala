package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** ZCA whitening of an embedding column — the standard pre-processing that
  * decorrelates dimensions and equalizes their variance before cosine /
  * dot-product retrieval (anisotropic embedding spaces concentrate energy
  * in a few directions, which both distorts similarity and starves LSH /
  * IVF partitions; see the q_isotropy metric this transform repairs).
  * ZCA (W = U·(Λ+ε)^-1/2·Uᵀ) is the unique symmetric whitener — whitened
  * vectors stay maximally close to the originals, unlike plain PCA
  * rotation.
  *
  * Fit is ONE distributed pass: [[graft.expressions.GramMatrixAgg]]
  * accumulates n / Σx / upper-tri Σxxᵀ as a ~17 KB mergeable buffer
  * (map-side partial — the corpus never reshuffles), then the d×d
  * eigen-decomposition runs on the driver with a cyclic Jacobi sweep
  * (deterministic rotation order, no randomness; d is embedding-sized, so
  * driver O(d³) is microseconds). Apply is map-only: one fused
  * [[graft.expressions.ZcaWhiten]] centered mat-vec per row, W and μ
  * riding as referenced arrays (constant codegen size in d) — zero joins,
  * zero shuffles.
  */
object Whitening {

  /** Fitted whitener: per-dim mean, the symmetric ZCA matrix W (row-major),
    * and the covariance eigenvalues (descending) for diagnostics.
    */
  final case class Whitener(mean: Array[Double], w: Array[Array[Double]],
                            eigenvalues: Array[Double])

  /** One-pass covariance fit + driver-side eigen-decomposition.
    *
    * `eps` regularizes near-null directions (Λ+ε); keep it far below the
    * smallest meaningful eigenvalue — at the default 1e-12 a direction
    * with variance 1e-4 still whitens to 1 − 1e-8, which rounds clean at
    * the 6-dp invariant gates. A genuinely degenerate direction (λ ≤ eps)
    * would whiten toward zero rather than exploding — stated, not hidden.
    */
  def fitZca(df: DataFrame, vecCol: String, eps: Double = 1e-12): Whitener = {
    val gram = df.select(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.GramMatrixAgg(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            VF.toDouble(col(vecCol))))).as("g"))
      .head().getSeq[Double](0).toArray
    val d = ((math.sqrt(8.0 * (gram.length - 1) + 9) - 3) / 2).round.toInt
    require(1 + d + d * (d + 1) / 2 == gram.length,
      s"malformed gram buffer of length ${gram.length}")
    val n = gram(0)
    require(n >= 2, s"whitening needs >= 2 vectors, got $n")
    val mean = Array.tabulate(d)(i => gram(1 + i) / n)
    // covariance (population, 1/n) from the packed upper triangle
    val cov = Array.ofDim[Double](d, d)
    var k = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = gram(k) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; k += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    // W = U (Λ+ε)^-1/2 Uᵀ — symmetric by construction
    val scale = eigVals.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
    val w = Array.ofDim[Double](d, d)
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        var s = 0.0
        var m = 0
        while (m < d) { s += eigVecs(i)(m) * scale(m) * eigVecs(j)(m); m += 1 }
        w(i)(j) = s; w(j)(i) = s
        j += 1
      }
      i += 1
    }
    Whitener(mean, w, eigVals.sorted(Ordering[Double].reverse))
  }

  /** Map-only application: (idCol, `whitened` array<double>) — one fused
    * [[graft.expressions.ZcaWhiten]] mat-vec node per row. The previous
    * formulation (zip_with centering + d separate DotProduct columns, each
    * against a d-double literal row) embedded O(d²) literals in a single
    * projection — fine at the gated d=64, but at production embedding dims
    * (512–1024) that risks the 64 KB JVM method limit / constant-pool
    * blowup inside WholeStageCodegen and quadratic codegen time. W and μ
    * now ride as referenced arrays; arithmetic is the identical
    * left-to-right IEEE loop, so outputs are bit-for-bit unchanged
    * (d=512 compile-and-match pinned in WhiteningSpec).
    */
  def whiten(df: DataFrame, idCol: String, vecCol: String,
             model: Whitener): DataFrame =
    df.select(col(idCol), org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.ZcaWhiten(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          VF.toDouble(col(vecCol))),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(model.mean),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(
          model.w.flatten))).as("whitened"))

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix —
    * deterministic sweep order (row-major upper triangle), converges to
    * machine precision in a handful of sweeps for embedding-sized d.
    * Returns (eigenvalues, eigenvectors as COLUMNS m of `vec(i)(m)`),
    * unsorted (the ZCA product is basis-order invariant).
    */
  private[similarity] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    while (off > 1e-14 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta + (if (theta == 0) 1.0 else 0.0)) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
