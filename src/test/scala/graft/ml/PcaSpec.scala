package graft.ml

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Training-equivalence evidence for q146's pinned-artifact oracle: the
  * oracle replays only the projection, so the FIT must be proven here —
  * eigen residuals against a driver-recomputed covariance, orthonormal
  * components, variance ordering, and kernel-vs-driver projection
  * equality. */
class PcaSpec extends SparkSpec {

  private val Dim = 64
  private val R = 8

  private lazy val rows: Array[Array[Double]] = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir).select(col("embedding")).as[Seq[Float]]
      .collect().map(_.toArray.map(_.toDouble))
  }

  private lazy val model =
    Pca.fit(Tables.embeddings(spark, sfDir).select("embedding"), Dim, R)

  /** Driver-side covariance, independent arithmetic (two-pass, centered). */
  private lazy val cov: Array[Array[Double]] = {
    val n = rows.length
    val mu = Array.tabulate(Dim)(j => rows.map(_(j)).sum / n)
    Array.tabulate(Dim, Dim) { (i, j) =>
      rows.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / n
    }
  }

  test("fit: components orthonormal, eigenvalues ordered and non-negative") {
    for (i <- 0 until R; j <- i until R) {
      val d = model.components(i).zip(model.components(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"<v$i, v$j> = $d")
    }
    for (i <- 0 until R - 1)
      assert(model.eigenvalues(i) >= model.eigenvalues(i + 1), "eigenvalues not descending")
    assert(model.eigenvalues.last >= -1e-12, "negative variance")
  }

  test("fit: each component is an eigenvector of the true covariance") {
    val scale = cov.indices.map(i => math.abs(cov(i)(i))).max
    for (i <- 0 until R) {
      val v = model.components(i)
      val cv = Array.tabulate(Dim)(r => cov(r).zip(v).map { case (a, b) => a * b }.sum)
      val resid = cv.zip(v).map { case (a, b) => a - model.eigenvalues(i) * b }
      val norm = math.sqrt(resid.map(x => x * x).sum)
      assert(norm < 1e-8 * math.max(scale, 1.0), s"component $i eigen residual $norm")
    }
  }

  test("project: per-component sample variance equals its eigenvalue") {
    import spark.implicits._
    val proj = Pca.project(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"), model)
      .select(col("proj")).as[Seq[Double]].collect()
    val n = proj.length
    for (i <- 0 until R) {
      val xs = proj.map(_(i))
      val mean = xs.sum / n
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(variance - model.eigenvalues(i)) < 1e-8 * math.max(model.eigenvalues(i), 1e-6),
        s"component $i: projected variance $variance vs eigenvalue ${model.eigenvalues(i)}")
    }
  }

  test("project: kernel fold matches a driver-side replay exactly (oracle arithmetic)") {
    import spark.implicits._
    val got = Pca.project(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"), model)
      .select(col("vec_id"), col("proj")).as[(Long, Seq[Double])]
      .collect().toMap
    import spark.implicits._
    val byId = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    for ((id, p) <- got.take(50)) {
      val x = byId(id).toArray
      val expect = (0 until R).map { i =>
        var s = 0.0
        var j = 0
        while (j < Dim) { s += model.components(i)(j) * (x(j).toDouble - model.mu(j)); j += 1 }
        s
      }
      assert(p == expect, s"vec $id projection mismatch")
    }
  }

  test("jacobi: recovers a known spectrum") {
    // diag(5, 2, 1) conjugated by a fixed rotation in the (0,1) plane
    val n = 3
    val th = 0.3
    val q = Array(
      Array(math.cos(th), -math.sin(th), 0.0),
      Array(math.sin(th), math.cos(th), 0.0),
      Array(0.0, 0.0, 1.0))
    val d = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(n, n)((i, j) =>
      (0 until n).map(k => q(i)(k) * d(k) * q(j)(k)).sum)
    val (vals, vecs) = Pca.jacobiEigen(a)
    val sorted = vals.sorted(Ordering[Double].reverse)
    assert(sorted.zip(Seq(5.0, 2.0, 1.0)).forall { case (g, e) => math.abs(g - e) < 1e-10 })
    // eigenvector check: A v = λ v for the max eigenpair
    val kMax = vals.indexOf(vals.max)
    val v = Array.tabulate(n)(r => vecs(r)(kMax))
    val av = Array.tabulate(n)(r => a(r).zip(v).map { case (x, y) => x * y }.sum)
    assert(av.zip(v).forall { case (x, y) => math.abs(x - vals.max * y) < 1e-10 })
  }
}
