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

  test("IVF with 1 probe searches far fewer pairs but still returns k per vector") {
    val (cents, _) = KMeans.fit(vecs, k = 8, iters = 2)
    val out = KMeans.ivfTopK(vecs, cents, k = 3, nProbe = 1)
    val perVec = out.groupBy("vec_id").count().agg(max("count")).collect()(0).getLong(0)
    assert(perVec <= 3)
    assert(out.select("vec_id").distinct().count() == vecs.count())
  }
}
