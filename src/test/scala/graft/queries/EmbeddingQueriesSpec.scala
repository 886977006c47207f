package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Recall properties of the LSH tiers on data with real cosine structure.
  * The synthetic testdata embeddings are near-unstructured (top-3
  * same-label ≈ chance), so recall is asserted here on a clustered set:
  * 5 well-separated centers, 40 points each, small isotropic noise —
  * the regime ANN is for.
  */
class EmbeddingQueriesSpec extends SparkSpec {

  private val dim = 16

  private lazy val clustered: DataFrame = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(5, dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    val rows = (0 until 200).map { i =>
      val c = centers(i % 5)
      val v = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f).toSeq
      (i.toLong, v, i % 5)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  /** top-3 neighbor-set recall of `got` against the brute-force truth. */
  private def recallAt3(got: DataFrame): Double = {
    val truth = graft.ml.BlockTopK.cosineTopK(clustered, 3)
      .collect().map(r => (r.vec_id, r.neighbor_id)).toSet
    val found = got.select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (truth & found).size.toDouble / truth.size
  }

  test("multi-probe LSH recall ≥ single-probe, and ≥ 0.5 on clustered data") {
    val single = EmbeddingQueries.annLshMultiProbe(clustered, dim, nbits = 8, k = 3, probes = 0)
    val multi = EmbeddingQueries.annLshMultiProbe(clustered, dim, nbits = 8, k = 3, probes = 6)
    val rs = recallAt3(single)
    val rm = recallAt3(multi)
    info(f"recall@3 single=$rs%.3f multi(6 probes)=$rm%.3f")
    assert(rm >= rs, "adding probes must not lose recall")
    assert(rm >= 0.5, f"multi-probe recall $rm%.3f below floor on clustered data")
  }

  test("probes=0 restricts candidates to the q32 single-bucket scheme") {
    import org.apache.spark.sql.functions._
    val mp = EmbeddingQueries.annLshMultiProbe(clustered, dim, nbits = 8, k = 3, probes = 0)
      .select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = clustered.select(col("vec_id"), col("embedding"),
      graft.functions.VecFns.rhpBucket(col("embedding"), dim, 8).as("bucket"))
    val a = e.select(col("bucket"), col("vec_id").as("a_id"))
    val b = e.select(col("bucket"), col("vec_id").as("b_id"))
    val pairs = a.join(b, Seq("bucket")).filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mp.subsetOf(pairs), "probes=0 must only use same-bucket candidates")
  }
}
