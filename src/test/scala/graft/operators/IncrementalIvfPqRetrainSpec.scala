package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r14: the compressed store's drift + retrain path (the r13 verdict's
  * named gap — `assignmentDrift`/`retrain` existed only on the
  * uncompressed [[IncrementalIvf]]), the OPQ lifecycle composition, and
  * the three-way codec advisor. q142 gates drift→retrain→search against
  * the DuckDB oracle; these specs cover the operator-level contracts the
  * oracle can't see (crash recovery, baseline reset, codec preservation,
  * lifecycle invariance at the OPQ codec). */
class IncrementalIvfPqRetrainSpec extends SparkSpec {

  private def tmpRoot(tag: String) = s"/tmp/graft_incivfpq_retrain_spec_$tag"
  private def clean(ps: String*) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    ps.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }

  private lazy val all = graft.core.Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")

  private def codeSet(root: String) = IncrementalIvfPq.codes(spark, root)
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet

  private def searchSet(root: String, probes: org.apache.spark.sql.DataFrame) =
    IncrementalIvfPq.search(spark, root, probes, nprobe = 2, topK = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3))).toSet

  test("drift fires on a shifted delta, stays quiet in-distribution; retrain ≡ from-scratch and resets the baseline") {
    val seed = all.filter(col("vec_id") % 10 =!= 7)
    val inDist = all.filter(col("vec_id") % 10 === 7)
    val drifted = inDist
      .withColumn("embedding", transform(col("embedding"), x => x * lit(4.0f)))
    val root = tmpRoot("retrain"); val rootFresh = tmpRoot("retrainFresh")
    clean(root, rootFresh)
    IncrementalIvfPq.writeIndex(seed, root, dim = 64, k = 8, iters = 2, residual = true)
    val dIn = IncrementalIvfPq.assignmentDrift(spark, root, inDist)
    assert(dIn < IncrementalIvf.DriftRetrainThreshold,
      f"in-distribution delta must not trip the trigger: $dIn%.3f")
    val dOut = IncrementalIvfPq.assignmentDrift(spark, root, drifted)
    assert(dOut > IncrementalIvf.DriftRetrainThreshold,
      f"x4-scaled delta must trip the trigger: $dOut%.3f")
    IncrementalIvfPq.ingestBatch(spark, root, drifted, batchId = 1L)
    val corpus = seed.unionByName(drifted)
    IncrementalIvfPq.retrain(spark, root, corpus, dim = 64, k = 8, iters = 2)
    // from-scratch twin: same codec, same widths, same corpus
    IncrementalIvfPq.writeIndex(corpus, rootFresh, dim = 64, k = 8, iters = 2, residual = true)
    assert(IncrementalIvfPq.encoding(spark, root) == "residual",
      "retrain must preserve the store's codec")
    assert(codeSet(root) == codeSet(rootFresh),
      "retrained store must encode exactly like a from-scratch build on the post-drift corpus")
    assert(searchSet(root, corpus) == searchSet(rootFresh, corpus),
      "search over the retrained store must equal the rebuild's")
    // the rebuild lands everything in batch -1: a retrain is also a full compaction
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/codes"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("ingest_batch=-1"), s"retrain must fold every batch: $dirs")
    // baseline reset: the retrained quantizer was trained ON the union,
    // so (a) the full corpus reads in-distribution against the new
    // baseline, and (b) the formerly-drifted delta's signal DROPS (at
    // small k the scaled vectors can share cells with unscaled ones, so
    // ≈1.0 is not guaranteed for the delta alone — the corpus-level
    // check is the invariant)
    val dCorpus = IncrementalIvfPq.assignmentDrift(spark, root, corpus)
    assert(dCorpus < IncrementalIvf.DriftRetrainThreshold,
      f"post-retrain, the training corpus must read in-distribution: $dCorpus%.3f")
    val dAfter = IncrementalIvfPq.assignmentDrift(spark, root, drifted)
    assert(dAfter < dOut,
      f"post-retrain, the ingested delta's drift must drop: $dAfter%.3f vs pre-retrain $dOut%.3f")
  }

  test("retrain crash between its two renames is recovered; stale staging is cleared") {
    val root = tmpRoot("crash")
    clean(root, s"${root}__retrain_old", s"${root}__retrain")
    IncrementalIvfPq.writeIndex(all, root, dim = 64, k = 8, iters = 2)
    val before = codeSet(root)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: rename 1 done (root parked), rename 2 never ran
    assert(fs.rename(new org.apache.hadoop.fs.Path(root),
      new org.apache.hadoop.fs.Path(s"${root}__retrain_old")))
    // plus a half-written staging sibling
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"${root}__retrain/junk"))
    IncrementalIvfPq.recoverSwap(spark, root)
    assert(codeSet(root) == before, "recovery must restore the intact pre-retrain store")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${root}__retrain_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${root}__retrain")))
  }

  test("OPQ lifecycle: deleteBatch → compactIndex → searchRefined/searchFiltered invariant across batch layout and purge state") {
    // Two stores with IDENTICAL frozen quantizers (training is fully
    // deterministic) but different physical histories: A ingests the
    // delta as one batch and keeps its tombstones un-purged; B splits
    // the delta across two batches, deletes, then physically purges via
    // compactIndex. Every read path must be blind to the difference —
    // the q141 frozen-R invariant extended across the whole delete/
    // compact/refine/filter surface.
    val seed = all.filter(col("vec_id") % 10 =!= 7)
    val delta = all.filter(col("vec_id") % 10 === 7)
    val dead = all.filter(col("vec_id") % 9 === 4).select("vec_id")
    val deadIds = dead.collect().map(_.getLong(0)).toSet
    val rootA = tmpRoot("opqA"); val rootB = tmpRoot("opqB")
    clean(rootA, rootB)
    IncrementalIvfPq.writeIndexOpq(seed, rootA, dim = 64, k = 8, iters = 2, sweeps = 1)
    IncrementalIvfPq.ingestBatch(spark, rootA, delta, batchId = 1L)
    IncrementalIvfPq.deleteBatch(spark, rootA, dead, batchId = 1L)
    IncrementalIvfPq.writeIndexOpq(seed, rootB, dim = 64, k = 8, iters = 2, sweeps = 1)
    IncrementalIvfPq.ingestBatch(spark, rootB, delta.filter(col("vec_id") % 2 === 1), batchId = 1L)
    IncrementalIvfPq.ingestBatch(spark, rootB, delta.filter(col("vec_id") % 2 === 0), batchId = 2L)
    IncrementalIvfPq.deleteBatch(spark, rootB, dead, batchId = 1L)
    IncrementalIvfPq.compactIndex(spark, rootB)
    // physical purge actually happened on B
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$rootB/tombstones")),
      "compactIndex must truncate applied tombstones")
    def live(r: String) = IncrementalIvfPq.liveCodes(spark, r)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getSeq[Int](2))).toSet
    val (liveA, liveB) = (live(rootA), live(rootB))
    assert(liveA == liveB, "live codes must not depend on batch layout or purge state")
    assert(liveA.map(_._1).intersect(deadIds).isEmpty, "tombstoned ids must be gone")
    val probes = all.filter(col("vec_id") % 9 =!= 4)
    def refined(r: String) = IncrementalIvfPq.searchRefined(
        spark, r, probes, corpus = all, nprobe = 2, topK = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3))).toSet
    assert(refined(rootA) == refined(rootB),
      "OPQ searchRefined must be invariant across delete representation")
    val allowed = graft.core.Tables.embeddings(spark, sfDir)
      .filter(col("label") < 3).select("vec_id")
    def filtered(r: String) = IncrementalIvfPq.searchFiltered(
        spark, r, probes, allowed, nprobe = 2, topK = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3))).toSet
    val (fA, fB) = (filtered(rootA), filtered(rootB))
    assert(fA == fB, "OPQ searchFiltered must be invariant across delete representation")
    assert(fA.map(_._2).intersect(deadIds).isEmpty)
  }

  test("three-way advisor: the structured corpus routes to residual (r15 — opq must beat the MENU sibling, not plain PQ); opq branch stays reachable") {
    val e = all
    val structured = graft.queries.EmbeddingQueries.structuredCorpus(e)
    // r15 correction (CodecParetoSpec's measured cross-check): the
    // ladder has residual-PQ at ~2× OPQ's recall on this corpus — the
    // coarse centroids remove the between-cluster variance a raw-space
    // rotation spends its codes on — so the advisor must say residual
    assert(IncrementalIvfPq.recommendCodec3(structured, dim = 64, k = 8) == "residual",
      "on the ladder corpus residual-PQ recall-dominates OPQ at equal bytes — the advisor must say so")
    // the opq branch is reachable exactly when the rotation's MSE win
    // over residual-PQ clears the (overridable) threshold
    assert(IncrementalIvfPq.recommendCodec3(structured, dim = 64, k = 8,
      opqWin = -100.0) == "opq",
      "a cleared rotation-win threshold must route to opq")
    // first gate unchanged: whenever the two-way advisor says sq8
    // (unclustered corpus), the three-way one must too, WITHOUT fitting
    // any rotation — and when it says residual, the three-way answer is
    // residual-or-opq, never sq8
    val twoWay = IncrementalIvfPq.recommendCodec(e, k = 8)
    val threeWay = IncrementalIvfPq.recommendCodec3(e, dim = 64, k = 8)
    if (twoWay == "sq8") assert(threeWay == "sq8")
    else assert(threeWay == "residual" || threeWay == "opq")
  }
}
