package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OPQ (Ge et al. 2013): the learned-rotation codec upgrade of raw PQ.
  * The claims under test: the Procrustes/polar solver really produces
  * an orthogonal matrix; the whole fit is deterministic; and on a
  * corpus with inter-dimension correlation the rotation measurably
  * cuts quantization error at identical index size — the reason OPQ
  * exists. The correlated corpus here is the structured mixture (q138's
  * pinned generator): cluster centers put shared structure across all
  * 64 dims, which fixed dimension-blocks cannot exploit but a learned
  * rotation can. */
class OpqSpec extends SparkSpec {

  private val Dim = 64
  private val M = 8

  private lazy val iso = graft.core.Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")

  // the structured-mixture corpus — inter-dim correlation via shared
  // cluster centers (EmbeddingQueries.structuredCorpus is the pinned
  // generator; private[graft], visible here)
  private lazy val corr = graft.queries.EmbeddingQueries.structuredCorpus(iso)

  test("polar solver: orthogonal to 1e-10, and recovers a known rotation") {
    // build a known orthogonal Q (Givens rotations), multiply by an SPD
    // matrix P -> polar factor of QP must be Q (up to fp noise)
    val d = 8
    def givens(i: Int, j: Int, theta: Double): Array[Array[Double]] = {
      val g = Array.tabulate(d, d)((a, b) => if (a == b) 1.0 else 0.0)
      g(i)(i) = math.cos(theta); g(j)(j) = math.cos(theta)
      g(i)(j) = -math.sin(theta); g(j)(i) = math.sin(theta)
      g
    }
    def mul(a: Array[Array[Double]], b: Array[Array[Double]]) =
      Array.tabulate(d, d)((i, j) => (0 until d).map(k => a(i)(k) * b(k)(j)).sum)
    val q = mul(givens(0, 3, 0.7), mul(givens(1, 5, -1.2), givens(2, 7, 2.1)))
    // SPD P = diag(1..d) pushed through a mild congruence
    val p = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 + i else 0.0)
    val m = mul(q, p)
    val polar = Opq.polarOrthogonal(m)
    assert(Opq.orthogonalityDefect(polar) < 1e-10)
    val err = (0 until d).flatMap(i => (0 until d).map(j => math.abs(polar(i)(j) - q(i)(j)))).max
    assert(err < 1e-8, s"polar factor must recover the planted rotation (max err $err)")
  }

  test("fit returns an orthogonal R; identical reruns are bit-identical (deterministic)") {
    val (r1, b1) = Opq.fit(corr, Dim, M, ks = 16, pqIters = 1, sweeps = 2)
    assert(Opq.orthogonalityDefect(r1) < 1e-9, "R must be orthogonal")
    val (r2, b2) = Opq.fit(corr, Dim, M, ks = 16, pqIters = 1, sweeps = 2)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq, "fit must be deterministic")
    def bookSet(b: org.apache.spark.sql.DataFrame) =
      b.collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSet
    assert(bookSet(b1) == bookSet(b2))
  }

  test("correlated corpus: OPQ's quantization MSE beats plain PQ at identical index size") {
    val ks = 16
    val plainBook = ProductQuantizer.train(corr, Dim, M, ks, 2, denom = 4)
    val msePlain = Opq.quantizationMse(corr, plainBook, Dim, M)
    val (r, opqBook) = Opq.fit(corr, Dim, M, ks, pqIters = 2, sweeps = 3)
    // orthogonal R preserves norms, so rotated-space MSE is directly
    // comparable to original-space MSE
    val mseOpq = Opq.quantizationMse(Opq.rotate(corr, r), opqBook, Dim, M)
    info(f"MSE plain PQ $msePlain%.6f -> OPQ $mseOpq%.6f (x${msePlain / mseOpq}%.2f)")
    assert(mseOpq < msePlain,
      s"rotation must not hurt on a correlated corpus: $mseOpq vs $msePlain")
    // same byte budget: codebook shapes identical
    assert(opqBook.count() == plainBook.count())
  }

  test("isotropic corpus: OPQ stays within a few percent of plain PQ (no harm where it cannot help)") {
    val ks = 16
    val plainBook = ProductQuantizer.train(iso, Dim, M, ks, 2, denom = 4)
    val msePlain = Opq.quantizationMse(iso, plainBook, Dim, M)
    val (r, opqBook) = Opq.fit(iso, Dim, M, ks, pqIters = 2, sweeps = 2)
    val mseOpq = Opq.quantizationMse(Opq.rotate(iso, r), opqBook, Dim, M)
    info(f"isotropic MSE plain $msePlain%.6f vs OPQ $mseOpq%.6f")
    assert(mseOpq < msePlain * 1.05,
      s"OPQ must not regress materially on isotropic data: $mseOpq vs $msePlain")
  }
}
