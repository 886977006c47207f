package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.NativeVecFns

/** Codec recall comparison: PQ (q122) vs SQ8 (q97) vs full-precision
  * floats, measured as recall@3 against the EXACT cosine top-3 — with
  * candidate generation HELD FIXED (the trained-quantizer IVF cid join,
  * nprobe = 2) so the comparison isolates codec-induced ranking damage
  * from candidate coverage (q97's LSH buckets and q122's IVF cells
  * would otherwise confound the codecs with their candidate sets).
  * recall(full) is the IVF candidate-coverage ceiling; the gap
  * full→SQ8→PQ is what each compression step costs.
  *
  * Usage: `PqRecallProbe <sfDir> [structured]` — prints one JSON line
  * with the recalls and the index-size ratios (floats : SQ8 : PQ codes).
  *
  * `structured` mode re-measures the ladder on a corpus WITH cluster
  * structure — the testdata embeddings are isotropic random vectors
  * (PQ's information-theoretic worst case: no inter-dim correlation for
  * 8 bytes to exploit), so the raw ladder under-reads what PQ does on
  * real embedding corpora. The structured corpus derives
  * DETERMINISTICALLY from the same testdata rows: each vector is pulled
  * toward one of 32 synthetic cluster centers (center = a fixed hash of
  * the cluster id per dimension, cluster = vec_id mod 32, mix 70%
  * center + 30% original noise) — the mixture-of-Gaussians shape real
  * encoders produce. Same vectors count, same dim, same ladder code. */
object PqRecallProbe {

  /** Wall-clock a materialization (the pareto table's build/search
    * columns — r15 verdict #4). */
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def recallAt3(approx: DataFrame, exact: DataFrame): Double = {
    val hit = exact.select(col("vec_id"), col("neighbor_id"))
      .join(approx.select(col("vec_id"), col("neighbor_id"), lit(1L).as("h")),
        Seq("vec_id", "neighbor_id"), "left")
    hit.agg(sum(coalesce(col("h"), lit(0L))).cast("double") / count(lit(1)))
      .first().getDouble(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val structured = args.contains("structured")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val e0 = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    // the structured corpus is the SHARED pinned generator (also the
    // q138 oracle query's corpus — cross-engine multiplicative hash, so
    // the ladder rows and the gated query measure the same vectors)
    val e = if (!structured) e0
            else graft.queries.EmbeddingQueries.structuredCorpus(e0)
    val n = e.count()

    // exact ground truth (the honest O(N²) pass — a probe tool, not a query)
    val exact = graft.ml.BlockTopK.cosineTopK(e, 3).toDF()
      .select(col("vec_id"), col("neighbor_id"))

    // shared coarse quantizer + candidate set (nprobe = 2)
    val (cents, _) = graft.ml.KMeans.fit(e, 32, 2)
    val ranked = e.select(col("vec_id"), col("embedding"),
        NativeVecFns.norm(spark, col("embedding")).as("nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("dist_sq", NativeVecFns.l2DistSq(spark, col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist_sq").asc, col("cid").asc)))
      .filter(col("rn") <= 2)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"), col("rn"))
      .persist()

    def topN(buildSide: DataFrame, k: Int): DataFrame = {
      // buildSide: (b_id, cid, b_rep: array, b_nrm) — the codec's
      // representation of each database vector
      val probes = ranked.select(col("cid"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      probes.join(buildSide, Seq("cid"))
        .filter(col("a_id") =!= col("b_id"))
        .withColumn("sim",
          NativeVecFns.dot(spark, col("a_emb"), col("b_rep")) / (col("a_nrm") * col("b_nrm")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)))
        .filter(col("rk") <= k)
        .select(col("a_id").as("vec_id"), col("b_id").as("neighbor_id"))
    }
    def top3(buildSide: DataFrame): DataFrame = topN(buildSide, 3)

    // q128's refine stage: ADC shortlists kFactor·3 = 12, full-precision
    // vectors join back for ONLY the shortlist, exact cosine picks the 3
    def refineTop3(buildSide: DataFrame): DataFrame = {
      val fullV = e.select(col("vec_id"), col("embedding"),
        NativeVecFns.norm(spark, col("embedding")).as("nrm"))
      topN(buildSide, 12)
        .select(col("vec_id").as("a_id"), col("neighbor_id").as("b_id"))
        .join(fullV.select(col("vec_id").as("b_id"),
          col("embedding").as("b_emb"), col("nrm").as("b_nrm")), Seq("b_id"))
        .join(fullV.select(col("vec_id").as("a_id"),
          col("embedding").as("a_emb"), col("nrm").as("a_nrm")), Seq("a_id"))
        .withColumn("sim",
          NativeVecFns.dot(spark, col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)))
        .filter(col("rk") <= 3)
        .select(col("a_id").as("vec_id"), col("b_id").as("neighbor_id"))
    }

    val base = ranked.filter(col("rn") === 1)
    val ks = graft.ml.ProductQuantizer.ksFor(n)

    // each codec's BUILD (training + encode + side materialization,
    // persisted so the search timing prices search alone) — the
    // candidate set (cents/ranked) is shared and excluded: the pareto
    // table isolates codec cost, not coverage cost
    val (fullSide, bFull) = timed {
      val s = base.select(col("vec_id").as("b_id"), col("cid"),
        col("embedding").as("b_rep"), col("nrm").as("b_nrm")).persist()
      s.count(); s
    }

    val (sq8Side, bSq8) = timed {
      val s = graft.queries.EmbeddingQueries.sq8Recon(e, 64)
        .join(base.select(col("vec_id"), col("cid")), Seq("vec_id"))
        .select(col("vec_id").as("b_id"), col("cid"), col("recon").as("b_rep"),
          NativeVecFns.norm(spark, col("recon")).as("b_nrm")).persist()
      s.count(); s
    }

    val (pqSide, bPq) = timed {
      val book = graft.ml.ProductQuantizer.train(e, 64, 8, ks, 2, denom = 4)
      val dec = graft.ml.ProductQuantizer.decodeExpr(spark, book, 8)
      val s = graft.ml.ProductQuantizer.encode(e, book, 64, 8)
        .join(base.select(col("vec_id"), col("cid")), Seq("vec_id"))
        .withColumn("b_rep", dec(col("codes")))
        .select(col("vec_id").as("b_id"), col("cid"), col("b_rep"),
          NativeVecFns.norm(spark, col("b_rep")).as("b_nrm")).persist()
      s.count(); s
    }

    // residual PQ (q125): codebooks trained on x − c(cell(x)), same 8 B;
    // reconstruction re-adds the cell centroid
    val (pqrSide, bPqr) = timed {
      val res = e.join(base.select(col("vec_id"), col("cid")), Seq("vec_id"))
        .join(broadcast(cents.select(col("cid"), col("centroid").as("ccent"))), Seq("cid"))
        .select(col("vec_id"), col("cid"), col("ccent"),
          zip_with(col("embedding"), col("ccent"),
            (x, c) => x.cast("double") - c).as("embedding"))
      val rbook = graft.ml.ProductQuantizer
        .train(res.select("vec_id", "embedding"), 64, 8, ks, 2, denom = 4)
      val rdec = graft.ml.ProductQuantizer.decodeExpr(spark, rbook, 8)
      val s = graft.ml.ProductQuantizer
        .encode(res.select("vec_id", "embedding"), rbook, 64, 8)
        .join(res.select(col("vec_id"), col("cid"), col("ccent")), Seq("vec_id"))
        .withColumn("b_rep", zip_with(col("ccent"), rdec(col("codes")), (c, r) => c + r))
        .select(col("vec_id").as("b_id"), col("cid"), col("b_rep"),
          NativeVecFns.norm(spark, col("b_rep")).as("b_nrm")).persist()
      s.count(); s
    }

    // OPQ (Ge 2013): learned-rotation PQ at the same 8 B/vector —
    // encode in R's space, decode, rotate BACK so the shared ADC/top-3
    // machinery scores in the original space unchanged
    val (opqSide, bOpq) = timed {
      val (rMat, obook) = graft.ml.Opq.fit(e, 64, 8, ks, 2, sweeps = 3)
      val odec = graft.ml.ProductQuantizer.decodeExpr(spark, obook, 8)
      val oBack = graft.ml.Opq.rotateBack(
        graft.ml.ProductQuantizer.encode(graft.ml.Opq.rotate(e, rMat), obook, 64, 8)
          .withColumn("embedding", odec(col("codes")))
          .select("vec_id", "embedding"),
        rMat)
      val s = oBack
        .join(base.select(col("vec_id"), col("cid")), Seq("vec_id"))
        .select(col("vec_id").as("b_id"), col("cid"),
          col("embedding").as("b_rep"),
          NativeVecFns.norm(spark, col("embedding")).as("b_nrm")).persist()
      s.count(); s
    }

    // SEARCH wall (candidate join + ADC rank over the cached side),
    // then recall from the same cached plan
    def searchAndRecall(side: DataFrame): (Double, Double) = {
      val (a, sSec) = timed { val d = top3(side); d.count(); d }
      (recallAt3(a, exact), sSec)
    }
    def refineSearchAndRecall(side: DataFrame): (Double, Double) = {
      val (a, sSec) = timed { val d = refineTop3(side); d.count(); d }
      (recallAt3(a, exact), sSec)
    }
    val (rFull, sFull) = searchAndRecall(fullSide)
    val (rSq8, sSq8) = searchAndRecall(sq8Side)
    val (rPq, sPq) = searchAndRecall(pqSide)
    val (rPqr, sPqr) = searchAndRecall(pqrSide)
    val (rOpq, sOpq) = searchAndRecall(opqSide)
    val (rPqRef, sPqRef) = refineSearchAndRecall(pqSide)
    val (rPqrRef, sPqrRef) = refineSearchAndRecall(pqrSide)
    // bytes per vector: 64 floats / 64 byte-codes / 8 byte-codes
    println(f"""{"sf":"$sfDir","n":$n,"ks":$ks,"structured":$structured,"recall_full_ivf":$rFull%.4f,"recall_sq8":$rSq8%.4f,"recall_pq":$rPq%.4f,"recall_pq_residual":$rPqr%.4f,"recall_opq":$rOpq%.4f,"recall_pq_refined":$rPqRef%.4f,"recall_pqr_refined":$rPqrRef%.4f,"bytes_full":256,"bytes_sq8":64,"bytes_pq":8,"build_full":$bFull%.1f,"build_sq8":$bSq8%.1f,"build_pq":$bPq%.1f,"build_pq_residual":$bPqr%.1f,"build_opq":$bOpq%.1f,"search_full":$sFull%.1f,"search_sq8":$sSq8%.1f,"search_pq":$sPq%.1f,"search_pq_residual":$sPqr%.1f,"search_opq":$sOpq%.1f,"search_pq_refined":$sPqRef%.1f,"search_pqr_refined":$sPqrRef%.1f}""")
    spark.stop()
  }
}
