package graft.ml

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")

  test("Lloyd inertia is monotonically non-increasing (opt-in tracking)") {
    val (cents, inertia) = KMeans.fit(vecs, k = 8, iters = 4, trackInertia = true)
    info(s"inertia: ${inertia.map(x => f"$x%.1f").mkString(" → ")}")
    assert(inertia.size == 4)
    inertia.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-6) }
    assert(cents.count() == 8)
    // centroids have the right dimensionality
    assert(cents.select(size(col("centroid"))).distinct().collect()(0).getInt(0) == 64)
  }

  test("default (collect-free) fit trains the same centroids as the tracked path") {
    val (lazyCents, lazyInertia) = KMeans.fit(vecs, k = 6, iters = 2)
    assert(lazyInertia.isEmpty, "default path must not compute inertia")
    def quantized(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cid"), transform(col("centroid"), x => round(x, 6)).as("c"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val (tracked, _) = KMeans.fit(vecs, k = 6, iters = 2, trackInertia = true)
    assert(quantized(lazyCents) == quantized(tracked),
      "lazy-chain training must produce the tracked path's centroids")
    lazyCents.unpersist(); tracked.unpersist()
  }

  test("assignment covers every vector exactly once") {
    val (cents, _) = KMeans.fit(vecs, k = 5, iters = 2)
    val assigned = KMeans.assign(vecs, cents)
    assert(assigned.count() == vecs.count())
    assert(assigned.select("vec_id").distinct().count() == vecs.count())
    assert(assigned.select("cid").distinct().count() <= 5)
  }

  test("IVF top-k with full probe count equals brute-force top-k") {
    val (cents, _) = KMeans.fit(vecs, k = 4, iters = 2)
    val ivfAll = KMeans.ivfTopK(vecs, cents, k = 3, nProbe = 4)
      .select("vec_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val brute = graft.queries.EmbeddingQueries.q31CosineTopK(spark, sfDir)
      .select("vec_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(ivfAll == brute, "probing every cell must reproduce the exact answer")
  }

  /** Well-separated clusters (the EmbeddingQueriesSpec fixture shape):
    * displacement is only a meaningful quantity when the optimum is
    * identifiable — on the near-unstructured sf0.001 embeddings, two
    * independent Lloyd runs legitimately land in different local minima,
    * so the displacement bound is asserted here and the recall bound on
    * the real corpus below. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(6, 16)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    val rows = (0 until 600).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f).toSeq)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("fitSampled: displacement within inter-centroid spacing; full-set IVF recall preserved") {
    def cents(df: org.apache.spark.sql.DataFrame): Seq[Array[Double]] =
      df.select("centroid").collect().map(_.getSeq[Double](0).toArray).toSeq
    def d(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // displacement bound, on identifiable clusters: each sampled-fit
    // centroid must land well within the full fit's own inter-centroid
    // spacing — the scale on which a "different quantizer" mis-bins
    val (fullC, _) = KMeans.fit(clustered, k = 6, iters = 3)
    val (sampC, _) = KMeans.fitSampled(clustered, k = 6, iters = 3, denom = 4)
    val (cf, cs) = (cents(fullC), cents(sampC))
    val displacement = cs.map(c => cf.map(f => d(c, f)).min).max
    val spacing = (for (i <- cf.indices; j <- cf.indices if i < j)
      yield d(cf(i), cf(j))).min
    info(f"max displacement $displacement%.4f vs min spacing $spacing%.4f")
    assert(displacement < spacing / 2,
      s"sampled centroids must land within half the inter-centroid spacing " +
        s"(displacement=$displacement, spacing=$spacing)")
    fullC.unpersist(); sampC.unpersist()
    // recall on the FULL real corpus: fraction of (vector, exact-top-1)
    // pairs the sampled-quantizer IVF search reproduces — must match the
    // full-fit quantizer's recall (the sample trains the QUANTIZER;
    // search still runs over every vector)
    val k = 4
    val (full, _) = KMeans.fit(vecs, k, iters = 3)
    val (samp, _) = KMeans.fitSampled(vecs, k, iters = 3, denom = 4)
    val exact = graft.queries.EmbeddingQueries.q31CosineTopK(spark, sfDir)
      .filter(col("rank") === 1).select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(c: org.apache.spark.sql.DataFrame): Double = {
      val got = KMeans.ivfTopK(vecs, c, k = 3, nProbe = 2)
        .select("vec_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.count(got.contains).toDouble / exact.size
    }
    val (rFull, rSamp) = (recall(full), recall(samp))
    info(f"recall@top1: full-fit $rFull%.3f, sampled-fit $rSamp%.3f")
    assert(rSamp >= rFull - 0.05,
      s"sampled-fit recall must not degrade materially: $rSamp vs $rFull")
    full.unpersist(); samp.unpersist()
  }

  test("IVF with 1 probe searches far fewer pairs but still returns k per vector") {
    val (cents, _) = KMeans.fit(vecs, k = 8, iters = 2)
    val out = KMeans.ivfTopK(vecs, cents, k = 3, nProbe = 1)
    val perVec = out.groupBy("vec_id").count().agg(max("count")).collect()(0).getLong(0)
    assert(perVec <= 3)
    assert(out.select("vec_id").distinct().count() == vecs.count())
  }
}
