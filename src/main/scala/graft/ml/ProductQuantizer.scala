package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.NativeVecFns

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", IEEE TPAMI 2011) — the index-compression step past
  * SQ8: split each `dim`-float vector into `m` contiguous subvectors of
  * `dim/m` floats, train an independent `ks`-entry k-means codebook per
  * subspace, and store each vector as `m` small integer codes. At the
  * FAISS production config (m = 8, ks = 256) a 64-float (256 B) embedding
  * becomes 8 bytes — 32× — which at 100 TB of vectors is the difference
  * between an in-memory index per executor and one that pages.
  *
  * Everything reuses the proven exact kernels: per-subspace training IS
  * [[KMeans.fitSampled]] on a sliced frame (deterministic init, broadcast
  * assignment, documented cache ownership), encoding is one broadcast
  * join against the m·ks-row codebook (cost O(N·ks·dim) — the published
  * encode complexity), and search-side RECONSTRUCTION is a pure
  * elementwise expression over a plan-literal lookup table (m·ks·dim/m
  * doubles ≈ 16 KB at the production config — rides the task binary like
  * the Bloom filter literal; no join, no shuffle, stays inside
  * whole-stage codegen).
  *
  * Asymmetric distance (ADC): queries keep full float precision; only the
  * database side is reconstructed from codes — the TPAMI paper's
  * recommended regime (symmetric coding doubles the quantization noise).
  */
object ProductQuantizer {

  /** Corpus-derived codebook width: ks = clamp(16, 256, ⌊N/32⌋) — the
    * `kFor`/`lshBitsFor` pattern applied to the code count. 256 (the
    * FAISS byte-code config) is the production ceiling, reached once the
    * corpus passes 8k vectors; below that, 256 codes over a tiny corpus
    * would train near-singleton cells (codebook quality needs tens of
    * training points per code — FAISS's own guidance is ≥39·ks), so the
    * width derives from the corpus like every other lever in this repo.
    * Floor 16 keeps 4 bits of quantization even at toy scale. */
  def ksFor(corpusCount: Long): Int =
    math.min(256L, math.max(16L, corpusCount / 32L)).toInt

  /** Train per-subspace codebooks on a deterministic 1-in-`denom`
    * multiplicative-hash sample ([[KMeans.fitSampled]]'s recipe —
    * training cost ÷denom, centroid displacement bounded in KMeansSpec).
    * Returns the codebook table `(s, code, centroid: array<double>)`,
    * m·ks rows. `vectors` = (vec_id, embedding); dim % m must be 0. */
  def train(vectors: DataFrame, dim: Int, m: Int, ks: Int, iters: Int,
            denom: Int = 4): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val books = (0 until m).map { s =>
      val sliced = vectors.select(col("vec_id"),
        slice(col("embedding"), s * sub + 1, sub).as("embedding"))
      val (cents, _) = KMeans.fitSampled(sliced, ks, iters, denom)
      val out = cents.select(lit(s).as("s"), col("cid").as("code"),
        col("centroid"))
      // fitSampled hands ownership of the persisted k-row frame to the
      // caller; collect it into the union eagerly so we can unpersist
      val rows = out.collect().toSeq
      cents.unpersist()
      (rows, out.schema)
    }
    val spark = vectors.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(books.flatMap(_._1), 1), books.head._2)
  }

  /** Encode every vector to its m nearest-subspace-centroid codes:
    * one broadcast join against the m·ks-row codebook, argmin per
    * (vec_id, s) with the engine-wide (dist asc, code asc) tiebreak,
    * codes assembled in subspace order. Returns (vec_id, codes:
    * array<int>). O(N·ks·dim) distance evaluations — the encode pass a
    * PQ deployment runs once per corpus snapshot at index-build time. */
  def encode(vectors: DataFrame, codebook: DataFrame, dim: Int, m: Int): DataFrame = {
    val spark = vectors.sparkSession
    val sub = dim / m
    // argmin via a k = 1 [[graft.expr.TopKAgg]] — NOT a rank window,
    // and (r15) NOT `min_by` either: min_by over a struct key is a
    // DeclarativeAggregate with an immutable buffer, which Spark can
    // only plan as SORT AGGREGATE — it silently sorted the N·ks·m
    // candidate stream by (vec_id, s) on every store build (410M rows
    // ≈ 17.2 GB at sf10, the ONE spilling operator left in the PQ
    // build — BuildSpillProbe attribution, BASELINE.md r15; the r14
    // parity gate's 18–51 GiB "min_by hash-agg" spill was this sort).
    // TopKAgg is a TypedImperativeAggregate → ObjectHashAggregate in
    // hash mode: the stream map-side-combines to one 16-byte buffer
    // per (vec_id, s) and nothing sorts. Score = −dist_sq (IEEE
    // negation is exact), ties by ascending id — exactly min_by's
    // lexicographic (dist asc, code asc) tiebreak, so codes are
    // bit-unchanged (the 147-query gate re-proves it).
    // The full embedding is dropped before the join: candidate rows
    // carry only the dim/m-float subvector.
    vectors.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("vec_id"), col("s"),
        slice(col("embedding"), col("s") * lit(sub) + lit(1), lit(sub)).as("subv"))
      .join(broadcast(codebook), Seq("s"))
      .withColumn("dist_sq", NativeVecFns.l2DistSq(spark, col("subv"), col("centroid")))
      .groupBy("vec_id", "s")
      .agg(graft.expr.TopKAgg.topKByScore(spark,
        negate(col("dist_sq")), col("code").cast("long"), 1).as("top"))
      .select(col("vec_id"), col("s"),
        element_at(col("top"), 1).getField("id").cast("int").as("code"))
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("s"), col("code")))).as("sc"))
      .select(col("vec_id"), transform(col("sc"), p => p("code")).as("codes"))
  }

  /** Reconstruction expression: decode a codes column back to its
    * m·(dim/m)-double approximation through a PLAN-LITERAL lookup table
    * (codebook collected once at plan build — ~16 KB at m=8, ks=256).
    * Pure elementwise codegen: no join, no shuffle, applied in the scan
    * projection of the codes table. */
  def decodeExpr(spark: SparkSession, codebook: DataFrame, m: Int): Column => Column = {
    val rows = codebook.select("s", "code", "centroid").collect()
    val bySubspace: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toSeq).toSeq
    }
    val lut = typedLit(bySubspace)
    c => flatten(transform(c, (code, s) =>
      element_at(element_at(lut, s + lit(1)), code + lit(1))))
  }

  /** Convenience: codes table → (vec_id, codes, recon, rnrm) with the
    * reconstruction and its norm materialized in the projection (norms
    * computed once per candidate row, not once per candidate pair). */
  def withRecon(spark: SparkSession, codes: DataFrame, codebook: DataFrame,
                m: Int): DataFrame = {
    val dec = decodeExpr(spark, codebook, m)
    codes.withColumn("recon", dec(col("codes")))
      .withColumn("rnrm", NativeVecFns.norm(spark, col("recon")))
  }
}
