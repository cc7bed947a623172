package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q239's eigensolver quality gates: oracle parity only proves the
  * bit-replay; PcaSpec is where convergence and reconstruction are
  * actually proven. Jacobi's quadratic convergence matters on this
  * data — the embedding covariance is near-isotropic (λ₂/λ₁ ≈ 0.86 at
  * sf0.001), where a fixed-round power iteration stalls (measured:
  * residual 2e-4 and v₁·v₂ ≈ 0.02 after 40 rounds); 6 Jacobi sweeps
  * hit machine precision regardless of the eigengap.
  */
class PcaSpec extends SparkSpec {

  private lazy val basis: Pca.Basis = {
    val cov = graft.Queries.embeddingCovariance(spark, sfDir)
    val emb = graft.sources.Tables.parquet(spark, sfDir, "embeddings")
    Pca.topTwo(cov, emb)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double =
    (1 to Pca.Dims).map(i => a(i) * b(i)).sum

  test("basis is orthonormal to machine precision") {
    assert(math.abs(dot(basis.v1, basis.v1) - 1.0) < 1e-12)
    assert(math.abs(dot(basis.v2, basis.v2) - 1.0) < 1e-12)
    assert(math.abs(dot(basis.v1, basis.v2)) < 1e-10, s"eigenvectors must be orthogonal: ${dot(basis.v1, basis.v2)}")
  }

  test("eigenpairs converged: Cv = lambda v residual at machine precision, ordered, positive") {
    val r1 = Pca.matvec(basis.cov, basis.v1)
    val res1 = (1 to Pca.Dims).map(i => math.abs(r1(i) - basis.lam1 * basis.v1(i))).max
    assert(res1 < 1e-10, s"Jacobi did not converge for v1: residual $res1")
    val r2 = Pca.matvec(basis.cov, basis.v2)
    val res2 = (1 to Pca.Dims).map(i => math.abs(r2(i) - basis.lam2 * basis.v2(i))).max
    assert(res2 < 1e-10, s"Jacobi did not converge for v2: residual $res2")
    assert(basis.lam1 >= basis.lam2 && basis.lam2 > 0.0, s"eigenvalues must be ordered positive: ${basis.lam1}, ${basis.lam2}")
  }

  test("reconstruction error bound: E||x - x_hat||^2 = trace(C) - lam1 - lam2, checked empirically") {
    val trace = (1 to Pca.Dims).map(i => basis.cov(i)(i)).sum
    val expected = trace - basis.lam1 - basis.lam2
    assert(expected >= -1e-9, "top-2 variance cannot exceed total variance")
    // empirical mean squared reconstruction error of the rank-2 projection
    val rows = graft.sources.Tables
      .parquet(spark, sfDir, "embeddings")
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val mse = rows.map { x =>
      val cx = (1 to Pca.Dims).map(i => x(i - 1) - basis.means(i)).toArray
      val p1 = (1 to Pca.Dims).map(i => cx(i - 1) * basis.v1(i)).sum
      val p2 = (1 to Pca.Dims).map(i => cx(i - 1) * basis.v2(i)).sum
      (1 to Pca.Dims).map { i =>
        val e = cx(i - 1) - p1 * basis.v1(i) - p2 * basis.v2(i)
        e * e
      }.sum
    }.sum / rows.length
    assert(
      math.abs(mse - expected) < 5e-4,
      s"empirical reconstruction MSE $mse must match trace-minus-kept $expected (cov rounding tolerance)"
    )
  }

  test("projection variance equals the eigenvalue (Rayleigh identity on the data)") {
    val df = graft.Queries.pcaProjection(spark, sfDir)
    val n = basis.n.toDouble
    val Array(s1, s2, q1, q2) = df
      .agg(sum(col("pc1")), sum(col("pc2")), sum(col("pc1") * col("pc1")), sum(col("pc2") * col("pc2")))
      .head()
      .toSeq
      .map(_.asInstanceOf[Double])
      .toArray
    val var1 = q1 / n - (s1 / n) * (s1 / n)
    val var2 = q2 / n - (s2 / n) * (s2 / n)
    assert(math.abs(var1 - basis.lam1) < 5e-4, s"var(pc1)=$var1 vs lam1=${basis.lam1}")
    assert(math.abs(var2 - basis.lam2) < 5e-4, s"var(pc2)=$var2 vs lam2=${basis.lam2}")
    // eigenvalue report columns are the rounded constants
    val head = df.head()
    assert(head.getAs[Double]("eig1") === Pca.roundAway6(basis.lam1))
    assert(head.getAs[Double]("eig2") === Pca.roundAway6(basis.lam2))
  }

  test("top-2 selection beats any axis-aligned 2-dim keep (PCA optimality on this data)") {
    val bestAxes = (1 to Pca.Dims)
      .map(i => basis.cov(i)(i))
      .sorted(Ordering[Double].reverse)
      .take(2)
      .sum
    assert(basis.lam1 + basis.lam2 >= bestAxes - 1e-12, "eigenbasis must capture at least as much variance as the best two raw axes")
  }

  test("whitening (q242): the whitened sample covariance is the identity") {
    val df = graft.Queries.whitenedEmbeddings(spark, sfDir)
    val n = df.count().toDouble
    val cols = (1 to Pca.Dims).map(k => s"wc$k")
    val aggs = cols.map(c => sum(col(c)).as(s"s_$c")) ++
      (for { i <- cols.indices; j <- i until cols.length }
        yield sum(col(cols(i)) * col(cols(j))).as(s"q_${i}_$j"))
    val sums = df.agg(aggs.head, aggs.tail: _*).head()
    val mean = cols.indices.map(i => sums.getAs[Double](s"s_${cols(i)}") / n)
    for { i <- cols.indices; j <- i until cols.length } {
      val covIj = sums.getAs[Double](s"q_${i}_$j") / n - mean(i) * mean(j)
      val target = if (i == j) 1.0 else 0.0
      assert(
        math.abs(covIj - target) < 2e-3,
        s"whitened cov($i,$j)=$covIj must be $target (q222 rounding tolerance)"
      )
    }
  }
}
