package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-side PCA basis extraction from the q222 covariance — the
  * embedding-preprocessing rung the ANN ladder consumes (whitening /
  * dimensionality reduction before IVF/PQ).
  *
  * Scale shape (the Lloyd/collect precedent): the distributed pass
  * computes only the dims² covariance (q222, one two-phase aggregate);
  * the eigen-solve runs on the DRIVER over that dims²-sized matrix —
  * at dims = 6 (or 4096) this is microseconds — and the resulting
  * basis is BROADCAST back as literals, so the projection pass is a
  * zero-shuffle codegen'd projection over the corpus.
  *
  * Determinism contract (the oracle replays this bit-for-bit): the
  * eigensolver is CYCLIC JACOBI with a fixed sweep order — 6 sweeps
  * over pairs (1,2),(1,3),…,(5,6) — using the TRIG-FREE rotation
  *
  *   θ = (a_qq − a_pp)/(2·a_pq),
  *   t = 1/(θ + √(θ²+1)) for θ ≥ 0, 1/(θ − √(θ²+1)) otherwise,
  *   c = 1/√(t²+1),  s = t·c
  *
  * so the only libm call is IEEE-correctly-rounded sqrt (no sin/cos/
  * atan, whose last-ulp behavior differs across libms), and every
  * update expression is a fixed left-associative chain. Jacobi's
  * QUADRATIC convergence is what makes this viable on this data: the
  * embedding covariance is near-isotropic (λ₂/λ₁ ≈ 0.97 at sf0.1),
  * where power iteration's (λ₂/λ₁)ᵏ rate would need hundreds of
  * rounds; 6 sweeps of Jacobi reach machine precision regardless of
  * the eigengap (PcaSpec asserts the residual).
  */
object Pca {

  val Dims = 6
  val Sweeps = 6

  /** The fixed rotation schedule: `Sweeps` passes over the upper
    * triangle in row-major order — the oracle generator walks the
    * SAME list.
    */
  def schedule: Seq[(Int, Int)] =
    for { _ <- 1 to Sweeps; p <- 1 to Dims - 1; q <- p + 1 to Dims } yield (p, q)

  /** (n, means, cov): cov is the symmetric matrix assembled from the
    * ROUNDED q222 `cov_val`s (hash-green, so both engines hold the
    * same doubles).
    *
    * Means deliberately AVOID the decimal-sum route: cross-engine
    * float→decimal casts are NOT bit-reliable (DuckDB renders the
    * float's 7-significant-digit shortest representation before
    * scaling; Spark widens through the exact double — measured ~1e-7
    * relative drift on this data, which q222 survives only because
    * its output rounds at 1e-6). Instead each component is quantized
    * by floor(x·2³⁰) — float→double widening is exact and unique, the
    * ·2³⁰ and floor are IEEE ops, so both engines produce the SAME
    * BIGINT — summed exactly, and the mean is the fixed-order double
    * chain (S/n)/2³⁰. A ≤2⁻³⁰ quantization of the centering point is
    * semantically free; bit-identical means are not.
    */
  def momentsFromCov(cov: DataFrame, embeddings: DataFrame): (Long, Array[Double], Array[Array[Double]]) = {
    val c = Array.ofDim[Double](Dims + 1, Dims + 1)
    cov.collect().foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(3))
      c(i)(j) = v
      c(j)(i) = v
    }
    val aggs = count(lit(1)).as("n") +:
      (1 to Dims).map(i =>
        sum(floor(element_at(col("embedding"), lit(i)).cast("double") * lit(1073741824.0))).as(s"s$i")
      )
    val st = embeddings.agg(aggs.head, aggs.tail: _*).head()
    val n = st.getLong(0)
    val m = Array.ofDim[Double](Dims + 1)
    (1 to Dims).foreach(i => m(i) = st.getLong(i).toDouble / n / 1073741824.0)
    (n, m, c)
  }

  /** One trig-free Jacobi rotation on (A, V) in place, snapshotting the
    * touched rows/columns first so every new value is computed from
    * PRE-rotation state — the semantics a from-previous-CTE SQL replay
    * gets for free.
    */
  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]], p: Int, q: Int): Unit = {
    val apq = a(p)(q)
    val (c, s) =
      if (apq == 0.0) (1.0, 0.0)
      else {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t =
          if (theta >= 0.0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
        val cc = 1.0 / math.sqrt(t * t + 1.0)
        (cc, t * cc)
      }
    val ap = (0 to Dims).map(k => a(p)(k)).toArray
    val aq = (0 to Dims).map(k => a(q)(k)).toArray
    (1 to Dims).foreach { k =>
      if (k != p && k != q) {
        val npk = c * ap(k) - s * aq(k)
        val nqk = s * ap(k) + c * aq(k)
        a(p)(k) = npk; a(k)(p) = npk
        a(q)(k) = nqk; a(k)(q) = nqk
      }
    }
    a(p)(p) = c * c * ap(p) - 2.0 * s * c * ap(q) + s * s * aq(q)
    a(q)(q) = s * s * ap(p) + 2.0 * s * c * ap(q) + c * c * aq(q)
    a(p)(q) = 0.0; a(q)(p) = 0.0
    (1 to Dims).foreach { k =>
      val vp = v(k)(p); val vq = v(k)(q)
      v(k)(p) = c * vp - s * vq
      v(k)(q) = s * vp + c * vq
    }
  }

  /** Cyclic Jacobi over the fixed schedule: returns (diagonalized A,
    * accumulated V whose COLUMNS are the eigenvectors).
    */
  def jacobi(cIn: Array[Array[Double]]): (Array[Array[Double]], Array[Array[Double]]) = {
    val a = Array.tabulate(Dims + 1, Dims + 1)((i, j) => cIn(i)(j))
    val v = Array.tabulate(Dims + 1, Dims + 1)((i, j) => if (i == j && i > 0) 1.0 else 0.0)
    schedule.foreach { case (p, q) => rotate(a, v, p, q) }
    (a, v)
  }

  /** Left-associative matvec: w_i = ((m_i1·v1 + m_i2·v2) + …) + m_i6·v6. */
  def matvec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val w = Array.ofDim[Double](Dims + 1)
    (1 to Dims).foreach(i => w(i) = (1 to Dims).map(j => m(i)(j) * v(j)).reduceLeft(_ + _))
    w
  }

  final case class Basis(
      n: Long,
      means: Array[Double],
      v1: Array[Double],
      lam1: Double,
      v2: Array[Double],
      lam2: Double,
      cov: Array[Array[Double]]
  )

  final case class Eigen(
      n: Long,
      means: Array[Double],
      pairs: Seq[(Double, Array[Double])],
      cov: Array[Array[Double]]
  )

  /** ALL eigenpairs of the q222 covariance ordered by descending
    * eigenvalue (index tie break — the oracle's ORDER BY ev DESC, idx),
    * plus the per-dim means.
    */
  def eigenAll(cov: DataFrame, embeddings: DataFrame): Eigen = {
    val (n, m, c) = momentsFromCov(cov, embeddings)
    val (a, v) = jacobi(c)
    def column(j: Int): Array[Double] = (0 to Dims).map(i => if (i == 0) 0.0 else v(i)(j)).toArray
    val pairs = (1 to Dims).sortBy(i => (-a(i)(i), i)).map(i => (a(i)(i), column(i)))
    Eigen(n, m, pairs, c)
  }

  /** Top-2 eigenpairs (q239's basis). */
  def topTwo(cov: DataFrame, embeddings: DataFrame): Basis = {
    val e = eigenAll(cov, embeddings)
    Basis(e.n, e.means, e.pairs(0)._2, e.pairs(0)._1, e.pairs(1)._2, e.pairs(1)._1, e.cov)
  }

  /** The driver twin of the oracle's `away()` rounding. */
  def roundAway6(x: Double): Double =
    math.signum(x) * (math.floor(math.abs(x) * 1000000.0 + 0.5) / 1000000.0)
}
