package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.NativeVecFns

/** OPQ — Optimized Product Quantization (Ge et al., CVPR 2013 §4, the
  * NON-PARAMETRIC alternating solver; also Norouzi & Fleet's ck-means):
  * learn an orthogonal rotation R so the m PQ subspaces see balanced,
  * decorrelated variance, then product-quantize `R·x`. Raw PQ's 8 bytes
  * are spent per fixed dimension-block; when the corpus has inter-
  * dimension correlation (real embedding corpora do — the measured
  * ladder's structured corpus is the test case), a learned rotation
  * moves that correlation INSIDE subspaces where the codebooks can
  * spend codes on it, cutting quantization error at identical index
  * size. On a perfectly isotropic corpus R converges near identity and
  * changes nothing — the advisor's explained-variance story, one level
  * down.
  *
  * The alternation (Ge Alg. 1): with R fixed, train/encode PQ on the
  * rotated sample (reusing [[ProductQuantizer]] verbatim — same argmin,
  * same tiebreaks); with the codebooks fixed, the optimal orthogonal R
  * for `min ‖R·x − b̂‖²` is the ORTHOGONAL PROCRUSTES solution
  * R = U·Vᵀ from SVD(Σ b̂·xᵀ) — computed here as the orthogonal polar
  * factor of the d×d cross matrix via the deterministic Newton
  * iteration Q ← (Q + Q⁻ᵀ)/2 (the polar factor IS U·Vᵀ; no
  * eigensolver needed, and every step is plain Gauss-Jordan on a 64×64
  * driver-side matrix).
  *
  * 100 TB shape: the expensive passes (rotate, PQ train, encode,
  * cross-matrix accumulation) are all distributed — rotation is a
  * broadcast d×d matrix applied per row in a primitive mapPartitions
  * kernel (tier d, the BlockTopK precedent: a dense per-row GEMV is a
  * compute kernel, not a relational op), and the cross matrix reduces
  * map-side to one d×d partial per partition before a treeReduce (d² =
  * 4096 doubles per partition — never a row explosion). Only the d×d
  * polar solve runs on the driver, on 32 KB of data. Everything is
  * deterministic: fixed sample, fixed partition layout, fixed Newton
  * sweep — two fits produce bit-identical R (spec-asserted). */
object Opq {

  /** Train an OPQ codec: returns (R — row-major d×d orthogonal rotation,
    * codebook — [[ProductQuantizer.train]]'s (s, code, centroid) table
    * trained in the FINAL rotated space). `sweeps` alternations; sweep 0
    * with R = I is exactly plain PQ, so `sweeps = 0` degrades to the raw
    * codec. The codebook's own 1-in-`denom` training sample matches the
    * PQ path so the two codecs differ only by the rotation. */
  def fit(vectors: DataFrame, dim: Int, m: Int, ks: Int,
          pqIters: Int = 2, sweeps: Int = 3,
          denom: Int = 4): (Array[Array[Double]], DataFrame) = {
    val spark = vectors.sparkSession
    var r = identityMatrix(dim)
    if (sweeps == 0) // degrades to plain PQ, by construction
      return (r, ProductQuantizer.train(vectors, dim, m, ks, pqIters, denom))
    var book: DataFrame = null
    var sweep = 0
    while (sweep < sweeps) {
      val bc = spark.sparkContext.broadcast(r)
      val y = rotateWith(vectors, bc).persist()
      book = ProductQuantizer.train(y, dim, m, ks, pqIters, denom)
      val recon = ProductQuantizer.withRecon(spark,
          ProductQuantizer.encode(y, book, dim, m), book, m)
        .select(col("vec_id"), col("recon"))
      // M = Σ b̂·xᵀ over the ORIGINAL vectors (Procrustes cross matrix)
      val xb = vectors
        .select(col("vec_id"), graft.functions.VecFns.toDouble(col("embedding")).as("x"))
        .join(recon, Seq("vec_id"))
      val mMat = crossMatrix(xb, dim)
      y.unpersist()
      bc.destroy()
      r = polarOrthogonal(mMat)
      sweep += 1
    }
    // the returned codebook must be the one trained in R's space: after
    // the LAST Procrustes update R moved while book stayed one sweep
    // behind, so close with one more training pass under the final R
    val bc = spark.sparkContext.broadcast(r)
    val y = rotateWith(vectors, bc).persist()
    book = ProductQuantizer.train(y, dim, m, ks, pqIters, denom)
    book.count()
    y.unpersist()
    bc.destroy()
    (r, book)
  }

  /** Apply the rotation: (vec_id, embedding: array<double> = R·x). A
    * broadcast d×d GEMV per row in a primitive kernel — no shuffle, no
    * join; the scan's parallelism carries through. */
  def rotate(vecs: DataFrame, r: Array[Array[Double]]): DataFrame = {
    val bc = vecs.sparkSession.sparkContext.broadcast(r)
    rotateWith(vecs, bc)
  }

  private def rotateWith(vecs: DataFrame,
                         bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.select(col("vec_id"),
        graft.functions.VecFns.toDouble(col("embedding")).as("embedding"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val mat = bc.value
        val d = mat.length
        it.map { case (id, v) =>
          val x = v.toArray
          val y = new Array[Double](d)
          var i = 0
          while (i < d) {
            val row = mat(i)
            var s = 0.0
            var j = 0
            while (j < d) { s += row(j) * x(j); j += 1 }
            y(i) = s
            i += 1
          }
          (id, y.toSeq)
        }
      }.toDF("vec_id", "embedding")
  }

  /** The rotation as a PLAN-LITERAL column expression — R flattened
    * row-major into a 4096-double literal riding the task binary (the
    * PQ-LUT / Bloom-literal house pattern), output[i] = Σⱼ R[i·d+j]·x[j]
    * as a sequential left fold with an explicit 0.0 init, bit-identical
    * to [[rotate]]'s mapPartitions GEMV kernel (same term order, same
    * accumulation). Used on the SEARCH probe side, where a plan literal
    * beats shuffling probes through a kernel + re-join; the bulk encode
    * path keeps the kernel. */
  def rotateColumn(spark: org.apache.spark.sql.SparkSession,
                   rFlat: org.apache.spark.sql.Column, dim: Int,
                   x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.expr.NativeVecFns.matVec(spark, rFlat, x)

  /** The pre-r15 `transform`+`aggregate` HOF formulation of
    * [[rotateColumn]], kept as the equality spec reference for the
    * native kernel (d² interpreted lambda calls per row made it the
    * dominant term of the q141 search wall — StageProbe r15). */
  private[graft] def rotateColumnHof(rFlat: org.apache.spark.sql.Column, dim: Int,
                                     x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0d), (acc, j) =>
        acc + element_at(rFlat, i * lit(dim) + j + lit(1))
          * element_at(x, j + lit(1)).cast("double")))

  /** Apply Rᵀ (the inverse rotation — R is orthogonal): maps codec
    * reconstructions of R·x back to the original space, so downstream
    * ADC scoring against UNROTATED probes needs no other change
    * (cos(a, Rᵀb̂) = cos(Ra, b̂) — the asymmetric-distance identity
    * rotation-based codecs rely on). */
  def rotateBack(vecs: DataFrame, r: Array[Array[Double]]): DataFrame =
    rotate(vecs, transpose(r))

  /** Mean squared reconstruction error of a codebook over `vectors`
    * (in whatever space `vectors` lives — rotate first for OPQ; R is
    * orthogonal, so errors in rotated space are comparable 1:1 with
    * plain-PQ errors in the original space). */
  def quantizationMse(vectors: DataFrame, book: DataFrame,
                      dim: Int, m: Int): Double = {
    val spark = vectors.sparkSession
    ProductQuantizer.withRecon(spark,
        ProductQuantizer.encode(vectors, book, dim, m), book, m)
      .join(vectors.select(col("vec_id"),
        graft.functions.VecFns.toDouble(col("embedding")).as("x")), Seq("vec_id"))
      .select(NativeVecFns.l2DistSq(spark, col("x"), col("recon")).as("e"))
      .agg(avg(col("e"))).first().getDouble(0)
  }

  /** Σ b·xᵀ accumulated map-side: one d×d partial per partition, then a
    * deterministic treeReduce — the row count never leaves the executors. */
  private def crossMatrix(xb: DataFrame, d: Int): Array[Array[Double]] = {
    val spark = xb.sparkSession
    import spark.implicits._
    xb.select(col("x"), col("recon")).as[(Seq[Double], Seq[Double])].rdd
      .mapPartitions { it =>
        val acc = Array.ofDim[Double](d, d)
        it.foreach { case (x, b) =>
          val xa = x.toArray
          val ba = b.toArray
          var i = 0
          while (i < d) {
            val bi = ba(i)
            val row = acc(i)
            var j = 0
            while (j < d) { row(j) += bi * xa(j); j += 1 }
            i += 1
          }
        }
        Iterator.single(acc)
      }
      .treeReduce { (a, b) =>
        var i = 0
        while (i < d) {
          val ra = a(i); val rb = b(i)
          var j = 0
          while (j < d) { ra(j) += rb(j); j += 1 }
          i += 1
        }
        a
      }
  }

  // ---- driver-side d×d linear algebra (deterministic, dependency-free) ----

  private def identityMatrix(d: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) { m(i)(i) = 1.0; i += 1 }
    m
  }

  private def transpose(a: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    val t = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) { var j = 0; while (j < d) { t(j)(i) = a(i)(j); j += 1 }; i += 1 }
    t
  }

  private def matMul(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    val c = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var k = 0
      while (k < d) {
        val aik = a(i)(k)
        if (aik != 0.0) {
          val rb = b(k); val rc = c(i)
          var j = 0
          while (j < d) { rc(j) += aik * rb(j); j += 1 }
        }
        k += 1
      }
      i += 1
    }
    c
  }

  /** Gauss-Jordan inverse with partial pivoting (deterministic pivot =
    * max |col| lowest index). Throws on a singular matrix — a singular
    * cross matrix means the corpus is degenerate (rank-deficient
    * reconstructions); fit would be meaningless there. */
  private def inverse(a0: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a0.length
    val a = a0.map(_.clone())
    val inv = identityMatrix(d)
    var col = 0
    while (col < d) {
      var piv = col
      var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < d) {
        val v = math.abs(a(r)(col))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      require(best > 1e-300, s"singular matrix at column $col")
      if (piv != col) {
        val t = a(piv); a(piv) = a(col); a(col) = t
        val ti = inv(piv); inv(piv) = inv(col); inv(col) = ti
      }
      val p = a(col)(col)
      var j = 0
      while (j < d) { a(col)(j) /= p; inv(col)(j) /= p; j += 1 }
      var i = 0
      while (i < d) {
        if (i != col) {
          val f = a(i)(col)
          if (f != 0.0) {
            var k = 0
            while (k < d) { a(i)(k) -= f * a(col)(k); inv(i)(k) -= f * inv(col)(k); k += 1 }
          }
        }
        i += 1
      }
      col += 1
    }
    inv
  }

  /** Orthogonal polar factor of M (= U·Vᵀ of its SVD — the Procrustes
    * rotation) via the Newton iteration Q ← (Q + Q⁻ᵀ)/2; quadratic
    * convergence for nonsingular M, stopped at ‖QᵀQ − I‖∞ < 1e-13 or
    * 100 steps. Initial scale by 1/‖M‖_F keeps the first inverses
    * well-conditioned. */
  private[ml] def polarOrthogonal(m0: Array[Array[Double]]): Array[Array[Double]] = {
    val d = m0.length
    var fro = 0.0
    m0.foreach(_.foreach(v => fro += v * v))
    fro = math.sqrt(fro)
    require(fro > 0.0, "zero cross matrix")
    var q = m0.map(_.map(_ / fro))
    var it = 0
    var done = false
    while (!done && it < 100) {
      val qi = transpose(inverse(q))
      val next = Array.ofDim[Double](d, d)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { next(i)(j) = 0.5 * (q(i)(j) + qi(i)(j)); j += 1 }
        i += 1
      }
      q = next
      // convergence: ‖QᵀQ − I‖∞
      val qtq = matMul(transpose(q), q)
      var err = 0.0
      i = 0
      while (i < d) {
        var j = 0
        while (j < d) {
          val t = math.abs(qtq(i)(j) - (if (i == j) 1.0 else 0.0))
          if (t > err) err = t
          j += 1
        }
        i += 1
      }
      done = err < 1e-13
      it += 1
    }
    q
  }

  /** ‖RᵀR − I‖∞ — the orthogonality defect (spec helper). */
  def orthogonalityDefect(r: Array[Array[Double]]): Double = {
    val d = r.length
    val qtq = matMul(transpose(r), r)
    var err = 0.0
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        val t = math.abs(qtq(i)(j) - (if (i == j) 1.0 else 0.0))
        if (t > err) err = t
        j += 1
      }
      i += 1
    }
    err
  }
}
