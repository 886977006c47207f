package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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

  test("lshBitsFor: holds expected occupancy at the target, scales with the corpus, clamps") {
    import graft.functions.VecFns.lshBitsFor
    for (n <- Seq(100000L, 10000000L, 10000000000L); t <- Seq(16L, 64L, 256L)) {
      val bits = lshBitsFor(n, t, minBits = 1, maxBits = 62)
      val occupancy = n.toDouble / math.pow(2, bits)
      assert(occupancy <= t, s"N=$n target=$t bits=$bits occupancy=$occupancy")
      // ceil means we never over-provision by more than one bit
      assert(occupancy > t / 2.0, s"N=$n target=$t bits=$bits wastes >1 bit")
    }
    // 100× corpus → ceil(log2(100)) = 7 more bits: cells scale linearly with N
    assert(lshBitsFor(100000000L, 64, 1, 62) == lshBitsFor(1000000L, 64, 1, 62) + 7)
    // clamps: tiny corpus floors at the oracle-pinned default, huge corpus
    // respects the signature-cost ceiling
    assert(lshBitsFor(100, 64) == 8)
    assert(lshBitsFor(Long.MaxValue / 4, 1, 1, 30) == 30)
    assertThrows[IllegalArgumentException](lshBitsFor(100, 0))
    assertThrows[IllegalArgumentException](lshBitsFor(100, 64, minBits = 0))
    assertThrows[IllegalArgumentException](lshBitsFor(100, 64, minBits = 4, maxBits = 63))
  }

  test("corpus-derived bits bound per-bucket candidate work on real embeddings") {
    import org.apache.spark.sql.functions._
    import graft.functions.VecFns.lshBitsFor
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val n = e.count()
    val target = 16L
    val bits = lshBitsFor(n, target, minBits = 1, maxBits = 62)
    val occ = e.select(graft.expr.NativeVecFns
        .rhpBucket(spark, col("embedding"), bits).as("bucket"))
      .groupBy("bucket").count()
    val stats = occ.agg(avg("count").as("avg"), max("count").as("max"),
      sum(col("count") * (col("count") - 1)).as("cand")).collect()(0)
    val (avgOcc, maxOcc, cand) = (stats.getDouble(0), stats.getLong(1), stats.getLong(2))
    info(f"N=$n bits=$bits avg=$avgOcc%.1f max=$maxOcc candidates=$cand (N²=${n * n})")
    // expected occupancy ≤ target by construction; real (correlated) data
    // skews, but the derived width must keep the average within a small
    // constant of the target and total candidates far below N²
    assert(avgOcc <= 4.0 * target, f"avg occupancy $avgOcc%.1f vs target $target")
    assert(cand <= 8L * n * target, s"candidate pairs $cand exceed O(N·target) bound")
    assert(cand < n * (n - 1) / 4, "LSH blocking must beat the cross join by 4× even at toy scale")
    // the parameterized path with the oracle-pinned width is exactly q32
    val viaDefault = EmbeddingQueries.annLshBucketed(e, nbits = 8, k = 3)
    val q32 = EmbeddingQueries.q32AnnLsh(spark, sfDir)
    assert(viaDefault.exceptAll(q32).isEmpty && q32.exceptAll(viaDefault).isEmpty)
  }

  test("r11 default-path flip: unpinned widths derive from the corpus and floor at the gate config") {
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val n = e.count()
    // annLshBucketed with NO width: derives lshBitsFor(n) — floors at 8
    // for gate corpora, so default ≡ the pinned q32 plan there
    assert(graft.functions.VecFns.lshBitsFor(n) == 8)
    val derived = EmbeddingQueries.annLshBucketed(e)
    val pinned = EmbeddingQueries.annLshBucketed(e, nbits = 8, k = 3)
    assert(derived.exceptAll(pinned).isEmpty && pinned.exceptAll(derived).isEmpty)
    // a corpus past the floor derives a wider bucket space
    assert(graft.functions.VecFns.lshBitsFor(1000000) > 8)
    // annRecallSharded with NO probeMod: derives probeModFor(n) — floors
    // at 10 for gate corpora, so default ≡ the pinned q92 report
    val sharded = e.select((col("vec_id") % 3).cast("int").as("shard"),
      col("vec_id"), col("embedding"))
    val recDerived = EmbeddingQueries.annRecallSharded(sharded)
    val recPinned = EmbeddingQueries.annRecallSharded(sharded, probeMod = 10L)
    assert(recDerived.exceptAll(recPinned).isEmpty && recPinned.exceptAll(recDerived).isEmpty)
  }

  test("r11 default-path flip: writeIndex with no k sizes cells via kFor") {
    val root = java.nio.file.Files.createTempDirectory("ivfdefault").toString + "/s"
    val e = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    graft.operators.IncrementalIvf.writeIndex(e, root) // no k, no iters
    val k = graft.operators.IncrementalIvf.centroids(spark, root).count()
    assert(k == graft.operators.IncrementalIvf.kFor(e.count()),
      s"default writeIndex must derive k via kFor, got $k")
  }
}
