package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the
  * dimensionality-reduction preprocessing step embedding pipelines run
  * before indexing/clustering (and the rotation family OPQ itself cites:
  * Jégou et al. 2011 §"PCA + PQ", Ge et al. 2013 eq. 2).
  *
  * Scale shape (the whole point): fitting never shuffles a single data
  * row. One `mapPartitions` pass accumulates per-partition sufficient
  * statistics — count, Σx (d doubles), Σxxᵀ (d² doubles) — and a
  * `reduce` combines the ~#partitions small triples; the d×d
  * eigenproblem is driver-side (d = 64 → 32 KB), solved by cyclic
  * Jacobi (Golub & Van Loan, "Matrix Computations" §8.5 — public
  * algorithm). At 100 TB this is a single scan with a 32 KB accumulator
  * per task, the same cost as a `count()`.
  *
  * Projection (`project`) is the [[Opq.rotate]] kernel shape with mean
  * subtraction: y_i = Σⱼ V[i][j]·(x[j] − μ[j]) as a sequential ascending
  * left fold from 0.0 — bit-identical to the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, …))` replay of the pinned model
  * (the q141 pinned-literal recipe).
  */
object Pca {

  /** μ, top-r eigenvectors (row-major, components(i) is the i-th
    * principal axis), and their eigenvalues (variance per component),
    * sorted descending. */
  case class PcaModel(mu: Array[Double], components: Array[Array[Double]],
                      eigenvalues: Array[Double])

  /** One-pass moment accumulation + driver-side Jacobi eigensolve.
    * `vecs` needs an `embedding: array<float>` column. */
  def fit(vecs: DataFrame, dim: Int, r: Int): PcaModel = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val (n, sum, ss) = vecs.select(col("embedding")).as[Seq[Float]]
      .mapPartitions { it =>
        val s = new Array[Double](dim)
        val m = new Array[Double](dim * dim)
        var cnt = 0L
        it.foreach { v =>
          val x = v.toArray
          var i = 0
          while (i < dim) {
            val xi = x(i).toDouble
            s(i) += xi
            var j = 0
            val row = i * dim
            while (j < dim) { m(row + j) += xi * x(j).toDouble; j += 1 }
            i += 1
          }
          cnt += 1
        }
        Iterator.single((cnt, s, m))
      }
      .reduce { (a, b) =>
        var i = 0
        while (i < dim) { a._2(i) += b._2(i); i += 1 }
        i = 0
        while (i < dim * dim) { a._3(i) += b._3(i); i += 1 }
        (a._1 + b._1, a._2, a._3)
      }
    require(n > 1, s"PCA needs >1 vector, got $n")
    val mu = sum.map(_ / n)
    // C = E[xxᵀ] − μμᵀ (population covariance; |x| ≲ 1 keeps the
    // one-pass form well-conditioned here)
    val c = Array.tabulate(dim, dim)((i, j) => ss(i * dim + j) / n - mu(i) * mu(j))
    val (eigVals, eigVecs) = jacobiEigen(c)
    // order: eigenvalue desc, original index asc on exact ties
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i)).take(r)
    val comps = order.map { idx =>
      val v = Array.tabulate(dim)(row => eigVecs(row)(idx))
      // deterministic sign: the first strictly-largest-|·| entry positive
      var m0 = 0
      var i = 1
      while (i < dim) { if (math.abs(v(i)) > math.abs(v(m0))) m0 = i; i += 1 }
      if (v(m0) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mu, comps, order.map(eigVals).toArray)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector matrix with eigenvector k in COLUMN k). Deterministic:
    * fixed (p,q) sweep order, fixed convergence bound. */
  private[ml] def jacobiEigen(c: Array[Array[Double]],
                              maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = c.length
    val a = Array.tabulate(n, n)((i, j) => c(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var trace = 0.0
    locally { var i = 0; while (i < n) { trace += math.abs(a(i)(i)); i += 1 } }
    val eps = 1e-30 * math.max(trace * trace, 1e-300)
    var sweep = 0
    while (sweep < maxSweeps && offNorm > eps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val cth = 1.0 / math.sqrt(t * t + 1.0)
            val sth = t * cth
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = cth * akp - sth * akq
              a(k)(q) = sth * akp + cth * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = cth * apk - sth * aqk
              a(q)(k) = sth * apk + cth * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = cth * vkp - sth * vkq
              v(k)(q) = sth * vkp + cth * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Bulk projection: (vec_id, proj: array<double>[r]) with
    * y_i = Σⱼ V[i][j]·(x[j] − μ[j]) folded ascending from 0.0 — the
    * [[Opq.rotate]] broadcast-GEMV kernel with mean subtraction; no
    * shuffle, scan parallelism carries through. */
  def project(vecs: DataFrame, model: PcaModel): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    vecs.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val m = bc.value
        val r = m.components.length
        val d = m.mu.length
        it.map { case (id, emb) =>
          val x = emb.toArray
          val y = new Array[Double](r)
          var i = 0
          while (i < r) {
            val row = m.components(i)
            var s = 0.0
            var j = 0
            while (j < d) { s += row(j) * (x(j).toDouble - m.mu(j)); j += 1 }
            y(i) = s
            i += 1
          }
          (id, y.toSeq)
        }
      }.toDF("vec_id", "proj")
  }
}
