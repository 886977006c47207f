package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalIvfPqSpec extends SparkSpec {

  private def tmpRoot(tag: String) = s"/tmp/graft_incivfpq_spec_$tag"
  private def clean(ps: String*) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    ps.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }

  private lazy val all = graft.core.Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")

  test("ingest with frozen quantizers ≡ from-scratch rebuild against the same quantizers") {
    val seed = all.filter(col("vec_id") % 10 =!= 7)
    val delta = all.filter(col("vec_id") % 10 === 7)
    val rootInc = tmpRoot("inc"); val rootFull = tmpRoot("full")
    clean(rootInc, rootFull)
    // maintained store: seed, then ingest
    IncrementalIvfPq.writeIndex(seed, rootInc, dim = 64, k = 8, iters = 2)
    IncrementalIvfPq.ingestBatch(spark, rootInc, delta, batchId = 1L)
    // rebuild: same frozen quantizers (copy them), encode state ∪ delta at once
    IncrementalIvfPq.writeIndex(seed, rootFull, dim = 64, k = 8, iters = 2)
    IncrementalIvfPq.ingestBatch(spark, rootFull, all, batchId = 9L) // re-encode EVERYTHING as one batch
    def codeSet(root: String) = IncrementalIvfPq.codes(spark, root)
      .filter(col("vec_id").isNotNull)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    // rebuild re-encodes the seed rows too (batch 9 ∪ batch -1 duplicates
    // them) — compare the DISTINCT (vec_id, cid, codes) triples, which
    // must coincide exactly if assignment is a pure function
    assert(codeSet(rootInc) == codeSet(rootFull),
      "frozen-quantizer ingest must land every vector exactly where a rebuild would")
  }

  test("ingestBatch replay (same batchId) is idempotent") {
    val seed = all.filter(col("vec_id") % 10 =!= 7)
    val delta = all.filter(col("vec_id") % 10 === 7)
    val root = tmpRoot("replay")
    clean(root)
    IncrementalIvfPq.writeIndex(seed, root, dim = 64, k = 8, iters = 2)
    IncrementalIvfPq.ingestBatch(spark, root, delta, batchId = 1L)
    val once = IncrementalIvfPq.codes(spark, root).count()
    IncrementalIvfPq.ingestBatch(spark, root, delta, batchId = 1L) // at-least-once replay
    assert(IncrementalIvfPq.codes(spark, root).count() == once,
      "a replayed batch must overwrite its own partition, not append")
  }

  test("compactIndex: codes and search unchanged, batch partitions folded, cid layout kept") {
    val root = tmpRoot("compact")
    clean(root)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    IncrementalIvfPq.writeIndex(all.filter(col("vec_id") % 10 < 8), root, dim = 64, k = 8, iters = 2)
    IncrementalIvfPq.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 8), batchId = 1L)
    def codeSet() = IncrementalIvfPq.codes(spark, root)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    def res() = IncrementalIvfPq.search(spark, root, all, nprobe = 2, topK = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3))).toSet
    val (codesBefore, resBefore) = (codeSet(), res())
    val filesBefore = Compaction.treeDataFileCount(spark, s"$root/codes")
    IncrementalIvfPq.compactIndex(spark, root)
    assert(codeSet() == codesBefore, "fold must not change the maintained codes")
    assert(res() == resBefore, "fold must not change search results")
    assert(Compaction.treeDataFileCount(spark, s"$root/codes") <= filesBefore)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/codes"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("ingest_batch=-1"), s"batch partitions must fold: $dirs")
    // the cid inner level (the inverted-list layout) survives the fold
    val inner = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/codes/ingest_batch=-1"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(inner.nonEmpty && inner.forall(_.startsWith("cid=")), s"cid layout lost: $inner")
    // ingest continues on the compacted store
    IncrementalIvfPq.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 9), batchId = 2L)
    assert(IncrementalIvfPq.codes(spark, root).count() == all.count())
  }

  test("deleteBatch: tombstoned ids vanish from liveCodes and search; codes files untouched; replay idempotent") {
    val root = tmpRoot("delete")
    clean(root)
    IncrementalIvfPq.writeIndex(all.filter(col("vec_id") % 10 =!= 7), root, dim = 64, k = 8, iters = 2)
    IncrementalIvfPq.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 7), batchId = 1L)
    val rawBefore = IncrementalIvfPq.codes(spark, root).count()
    val dead = all.filter(col("vec_id") % 9 === 4).select("vec_id")
    val deadIds = dead.collect().map(_.getLong(0)).toSet
    assert(deadIds.nonEmpty)
    IncrementalIvfPq.deleteBatch(spark, root, dead, batchId = 1L)
    // raw store untouched (delete path never rewrites code files)...
    assert(IncrementalIvfPq.codes(spark, root).count() == rawBefore)
    // ...but the live view and search exclude every tombstoned id
    val live = IncrementalIvfPq.liveCodes(spark, root)
    assert(live.count() == rawBefore - deadIds.size)
    assert(live.filter(col("vec_id").isin(deadIds.toSeq: _*)).count() == 0)
    val res = IncrementalIvfPq.search(spark, root,
      all.filter(col("vec_id") % 9 =!= 4), nprobe = 2, topK = 3).collect()
    assert(res.forall(r => !deadIds.contains(r.getLong(1))),
      "a tombstoned id must never surface as a neighbor")
    // replayed delete batch overwrites its own partition, not appends
    IncrementalIvfPq.deleteBatch(spark, root, dead, batchId = 1L)
    assert(IncrementalIvfPq.liveCodes(spark, root).count() == rawBefore - deadIds.size)
    // tombstones stay effective across a fold of the code store
    IncrementalIvfPq.compactIndex(spark, root)
    assert(IncrementalIvfPq.liveCodes(spark, root).count() == rawBefore - deadIds.size)
  }

  test("delete ≡ rebuild on the surviving corpus (same frozen quantizers)") {
    val rootDel = tmpRoot("delEq"); val rootSurv = tmpRoot("delEqSurv")
    clean(rootDel, rootSurv)
    val seed = all.filter(col("vec_id") % 10 =!= 7)
    // store A: full ingest then tombstone
    IncrementalIvfPq.writeIndex(seed, rootDel, dim = 64, k = 8, iters = 2)
    IncrementalIvfPq.ingestBatch(spark, rootDel, all.filter(col("vec_id") % 10 === 7), batchId = 1L)
    IncrementalIvfPq.deleteBatch(spark, rootDel,
      all.filter(col("vec_id") % 9 === 4).select("vec_id"), batchId = 1L)
    // store B: same frozen quantizers (trained on the SAME seed — its
    // batch −1 seed encode still carries the doomed rows, so the rebuild
    // view is batch 9 alone: the survivors-only encode
    IncrementalIvfPq.writeIndex(seed, rootSurv, dim = 64, k = 8, iters = 2)
    IncrementalIvfPq.ingestBatch(spark, rootSurv,
      all.filter(col("vec_id") % 9 =!= 4), batchId = 9L)
    val liveDel = IncrementalIvfPq.liveCodes(spark, rootDel)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val rebuilt = spark.read.parquet(s"$rootSurv/codes")
      .filter(col("ingest_batch") === 9L).select("vec_id", "cid", "codes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(liveDel == rebuilt,
      "tombstone view must equal a rebuild over the surviving corpus")
  }

  test("delete-aware compaction: fold purges tombstoned rows and truncates applied tombstones") {
    val root = tmpRoot("purge")
    clean(root)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val tomb = new org.apache.hadoop.fs.Path(s"$root/tombstones")
    IncrementalIvfPq.writeIndex(all.filter(col("vec_id") % 10 =!= 7), root, dim = 64, k = 8, iters = 2)
    IncrementalIvfPq.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 7), batchId = 1L)
    IncrementalIvfPq.deleteBatch(spark, root,
      all.filter(col("vec_id") % 9 === 4).select("vec_id"), batchId = 1L)
    def liveSet() = IncrementalIvfPq.liveCodes(spark, root)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    def res() = IncrementalIvfPq.search(spark, root,
        all.filter(col("vec_id") % 9 =!= 4), nprobe = 2, topK = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3))).toSet
    val (liveBefore, resBefore) = (liveSet(), res())
    IncrementalIvfPq.compactIndex(spark, root)
    // dead rows are physically GONE: the raw store now equals the live view
    val rawAfter = IncrementalIvfPq.codes(spark, root)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(rawAfter == liveBefore, "purge must drop exactly the tombstoned rows")
    // applied tombstones truncated — liveCodes no longer pays the anti-join
    assert(!fs.exists(tomb), "applied tombstone batches must truncate after the swap commits")
    assert(liveSet() == liveBefore && res() == resBefore,
      "purge must not change the live view or search results")
    // the cid inverted-list layout survives the delete-aware fold
    val inner = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/codes/ingest_batch=-1"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(inner.nonEmpty && inner.forall(_.startsWith("cid=")), s"cid layout lost: $inner")
    // crash-window idempotence: tombstones that survive a crash between
    // swap and truncation re-apply as a no-op on the already-purged store
    IncrementalIvfPq.deleteBatch(spark, root,
      all.filter(col("vec_id") % 9 === 4).select("vec_id"), batchId = 1L)
    assert(liveSet() == liveBefore)
    IncrementalIvfPq.compactIndex(spark, root)
    assert(!fs.exists(tomb) && liveSet() == liveBefore)
    // churn continues: fresh ingest + a NEW delete after the purge
    IncrementalIvfPq.deleteBatch(spark, root,
      all.filter(col("vec_id") % 9 === 5).select("vec_id"), batchId = 2L)
    IncrementalIvfPq.compactIndex(spark, root)
    val live2 = liveSet()
    assert(!fs.exists(tomb))
    assert(live2 == liveBefore.filterNot { case (id, _, _) => id % 9 == 5 })
  }

  test("purge declines when it would empty the store: tombstones kept, reads stay filtered") {
    val root = tmpRoot("purgeAll")
    clean(root)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val tomb = new org.apache.hadoop.fs.Path(s"$root/tombstones")
    val small = all.filter(col("vec_id") % 50 === 0)
    IncrementalIvfPq.writeIndex(small, root, dim = 64, k = 4, iters = 1)
    val rawBefore = IncrementalIvfPq.codes(spark, root).count()
    assert(rawBefore > 0)
    IncrementalIvfPq.deleteBatch(spark, root, small.select("vec_id"), batchId = 1L)
    IncrementalIvfPq.compactIndex(spark, root)
    // the fold declined (would truncate the store to a bare dir), so the
    // tombstones MUST survive — otherwise deleted rows would resurrect
    assert(fs.exists(tomb), "declined purge must keep its tombstones")
    assert(IncrementalIvfPq.codes(spark, root).count() == rawBefore)
    assert(IncrementalIvfPq.liveCodes(spark, root).count() == 0)
  }

  test("searchRefined: exact re-rank of the ADC shortlist, refine-equals-brute-force") {
    val root = tmpRoot("refine")
    clean(root)
    IncrementalIvfPq.writeIndex(all, root, dim = 64, k = 8, iters = 2)
    val kFactor = 4
    val refined = IncrementalIvfPq.searchRefined(spark, root, all, all,
      nprobe = 2, topK = 3, kFactor = kFactor)
    assert(!refined.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val got = refined.collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    // independent check: take the ADC top-12 shortlist, re-rank by exact
    // cosine computed driver-side from the raw vectors
    val vecs = all.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val shortlist = IncrementalIvfPq.search(spark, root, all, nprobe = 2, topK = 3 * kFactor)
      .collect().groupBy(_.getLong(0))
    shortlist.foreach { case (a, rows) =>
      val expect = rows.map(_.getLong(1)).distinct
        .map(b => (b, cos(vecs(a), vecs(b))))
        .sortBy { case (b, s) => (-s, b) }.take(3).map(_._1)
      expect.zipWithIndex.foreach { case (b, i) =>
        assert(got((a, i + 1)) == b, s"probe $a rank ${i + 1}")
      }
    }
  }

  test("residual mode: ingest ≡ rebuild with the same frozen quantizers; meta self-describes") {
    val seed = all.filter(col("vec_id") % 10 =!= 7)
    val delta = all.filter(col("vec_id") % 10 === 7)
    val rootInc = tmpRoot("resInc"); val rootFull = tmpRoot("resFull")
    clean(rootInc, rootFull)
    IncrementalIvfPq.writeIndex(seed, rootInc, dim = 64, k = 8, iters = 2, residual = true)
    assert(IncrementalIvfPq.isResidual(spark, rootInc))
    IncrementalIvfPq.ingestBatch(spark, rootInc, delta, batchId = 1L)
    IncrementalIvfPq.writeIndex(seed, rootFull, dim = 64, k = 8, iters = 2, residual = true)
    IncrementalIvfPq.ingestBatch(spark, rootFull, all, batchId = 9L)
    def codeSet(root: String) = IncrementalIvfPq.codes(spark, root)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(codeSet(rootInc) == codeSet(rootFull),
      "residual ingest must land every vector where a rebuild would")
    // residual codes differ from raw codes on the same corpus (the mode
    // is real, not a flag that falls through to the raw path)
    val rootRaw = tmpRoot("resRaw")
    clean(rootRaw)
    IncrementalIvfPq.writeIndex(seed, rootRaw, dim = 64, k = 8, iters = 2)
    assert(!IncrementalIvfPq.isResidual(spark, rootRaw))
    assert(codeSet(rootRaw) != codeSet(rootInc).filter { case (v, _, _) => v % 10 != 7 } ||
      codeSet(rootRaw) != codeSet(rootInc))
    // search runs and reconstruction includes the centroid: recon-based
    // ADC sims must differ from the raw store's on the same probes
    val resRes = IncrementalIvfPq.search(spark, rootInc, all, nprobe = 2, topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(resRes.nonEmpty)
  }

  test("residual mode: mean reconstruction error strictly below the raw store's") {
    val root = tmpRoot("resErr"); val rootRaw = tmpRoot("resErrRaw")
    clean(root, rootRaw)
    IncrementalIvfPq.writeIndex(all, root, dim = 64, k = 8, iters = 2, residual = true)
    IncrementalIvfPq.writeIndex(all, rootRaw, dim = 64, k = 8, iters = 2)
    def meanErr(r: String): Double = {
      val book = spark.read.parquet(s"$r/pqbook")
      val cents = spark.read.parquet(s"$r/centroids")
      val dec = graft.ml.ProductQuantizer.decodeExpr(spark, book, IncrementalIvfPq.M)
      val codes = IncrementalIvfPq.codes(spark, r)
      val recon =
        if (IncrementalIvfPq.isResidual(spark, r))
          codes.join(broadcast(cents.select(col("cid"), col("centroid"))), Seq("cid"))
            .withColumn("recon", zip_with(col("centroid"), dec(col("codes")), (c, d) => c + d))
        else codes.withColumn("recon", dec(col("codes")))
      recon.join(all, Seq("vec_id"))
        .select(graft.expr.NativeVecFns.l2DistSq(spark, col("embedding"), col("recon")).as("e"))
        .agg(avg("e")).first().getDouble(0)
    }
    val (re, raw) = (meanErr(root), meanErr(rootRaw))
    assert(re < raw, f"residual recon error $re%.4f must beat raw $raw%.4f")
  }

  test("searchFiltered: only allowed ids surface; allowed = everything ≡ unfiltered") {
    val root = tmpRoot("filter")
    clean(root)
    IncrementalIvfPq.writeIndex(all, root, dim = 64, k = 8, iters = 2)
    val allowed = all.filter(col("vec_id") % 3 === 1).select("vec_id")
    val ok = allowed.collect().map(_.getLong(0)).toSet
    val res = IncrementalIvfPq.searchFiltered(spark, root, all, allowed, nprobe = 2, topK = 3)
      .collect()
    assert(res.nonEmpty)
    assert(res.forall(r => ok.contains(r.getLong(1))),
      "a filtered search must never return a disallowed neighbor")
    // filter = full corpus ≡ plain search (the semi-join is a no-op)
    val unf = IncrementalIvfPq.search(spark, root, all, nprobe = 2, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val full = IncrementalIvfPq.searchFiltered(spark, root, all, all.select("vec_id"),
      nprobe = 2, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(full == unf, "allowed = corpus must reproduce the unfiltered search exactly")
  }

  test("full composition: residual store + streamed-style delta + deletes + filtered refined search") {
    val root = tmpRoot("compose")
    clean(root)
    val seed = all.filter(col("vec_id") % 10 =!= 7)
    IncrementalIvfPq.writeIndex(seed, root, dim = 64, k = 8, iters = 2, residual = true)
    IncrementalIvfPq.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 7), batchId = 1L)
    IncrementalIvfPq.deleteBatch(spark, root,
      all.filter(col("vec_id") % 9 === 4).select("vec_id"), batchId = 1L)
    val allowed = all.filter(col("vec_id") % 3 === 1).select("vec_id")
    val dead = all.filter(col("vec_id") % 9 === 4).collect().map(_.getLong(0)).toSet
    val ok = allowed.collect().map(_.getLong(0)).toSet
    val probes = all.filter(col("vec_id") % 9 =!= 4)
    val res = IncrementalIvfPq.searchRefined(spark, root, probes, all,
      nprobe = 2, topK = 3, kFactor = 4, allowed = Some(allowed)).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => ok.contains(r.getLong(1))), "filter must hold through refine")
    assert(res.forall(r => !dead.contains(r.getLong(1))), "tombstones must hold through refine")
    // the refined ranks must equal a brute-force exact rerank of the
    // filtered ADC shortlist (composition changes candidates, not math)
    val vecs = all.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = res.map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    IncrementalIvfPq.searchFiltered(spark, root, probes, allowed, nprobe = 2, topK = 12)
      .collect().groupBy(_.getLong(0)).foreach { case (a, rows) =>
        val expect = rows.map(_.getLong(1)).distinct
          .map(b => (b, cos(vecs(a), vecs(b))))
          .sortBy { case (b, s) => (-s, b) }.take(3).map(_._1)
        expect.zipWithIndex.foreach { case (b, i) =>
          assert(got((a, i + 1)) == b, s"probe $a rank ${i + 1}")
        }
      }
  }

  test("sq8 mode: ingest ≡ rebuild; out-of-range deltas saturate to [0,255]; deletes compose") {
    val seed = all.filter(col("vec_id") % 10 =!= 7)
    val rootInc = tmpRoot("sq8Inc"); val rootFull = tmpRoot("sq8Full")
    clean(rootInc, rootFull)
    // delta scaled ×4: values land far outside the seed's frozen grid —
    // the codes must clamp, not wrap or throw
    val delta = all.filter(col("vec_id") % 10 === 7)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(4.0f)))
    IncrementalIvfPq.writeIndexSq8(seed, rootInc, dim = 64, k = 8, iters = 2)
    assert(IncrementalIvfPq.encoding(spark, rootInc) == "sq8")
    IncrementalIvfPq.ingestBatch(spark, rootInc, delta, batchId = 1L)
    IncrementalIvfPq.writeIndexSq8(seed, rootFull, dim = 64, k = 8, iters = 2)
    IncrementalIvfPq.ingestBatch(spark, rootFull, seed.unionByName(delta), batchId = 9L)
    def codeSet(root: String) = IncrementalIvfPq.codes(spark, root)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(codeSet(rootInc) == codeSet(rootFull),
      "frozen-grid sq8 ingest must land every vector where a rebuild would")
    // all codes in range; the scaled delta actually saturates somewhere
    val deltaCodes = IncrementalIvfPq.codes(spark, rootInc)
      .filter(col("vec_id") % 10 === 7)
      .select(explode(col("codes")).as("c")).collect().map(_.getInt(0))
    assert(deltaCodes.forall(c => c >= 0 && c <= 255))
    assert(deltaCodes.contains(0) || deltaCodes.contains(255),
      "a 4x-scaled delta must hit the grid's clamp edges")
    // deletes are payload-agnostic
    IncrementalIvfPq.deleteBatch(spark, rootInc,
      all.filter(col("vec_id") % 9 === 4).select("vec_id"), batchId = 1L)
    val res = IncrementalIvfPq.search(spark, rootInc,
      all.filter(col("vec_id") % 9 =!= 4), nprobe = 2, topK = 3).collect()
    val dead = all.filter(col("vec_id") % 9 === 4).collect().map(_.getLong(0)).toSet
    assert(res.nonEmpty && res.forall(r => !dead.contains(r.getLong(1))))
  }

  test("recommendCodec: isotropic testdata → sq8; clustered mixture → residual") {
    // the testdata embeddings are isotropic noise — k-means explains ~0
    assert(IncrementalIvfPq.recommendCodec(all, k = 8, iters = 2) == "sq8")
    // the structured-ladder transform (70% shared center per vec_id%32
    // cluster + 30% noise) — the coarse quantizer explains most variance
    val structured = all
      .withColumn("c", (col("vec_id") % 32).cast("int"))
      .withColumn("embedding", transform(col("embedding"), (x, d) =>
        (lit(0.7) * (pmod(xxhash64(col("c"), d), lit(2000001L)).cast("double")
          / lit(1000000.0) - lit(1.0)) + lit(0.3) * x).cast("float")))
      .select("vec_id", "embedding")
    assert(IncrementalIvfPq.recommendCodec(structured, k = 32, iters = 2) == "residual")
  }

  test("inverted-list layout: a selective probe set dynamically prunes the cid partitions") {
    val root = tmpRoot("dpp")
    clean(root)
    IncrementalIvfPq.writeIndex(all, root, dim = 64, k = 8, iters = 2)
    // production shape: FEW probes against the big index — the ranked
    // probe cells broadcast, and DPP must push their cid values into
    // the codes scan's partition filters (the layout claim made real)
    val probes = all.filter(col("vec_id") < 5)
    val res = IncrementalIvfPq.search(spark, root, probes, nprobe = 2, topK = 3)
    res.collect() // AQE finalizes the plan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"selective probes must prune cid= directories via DPP:\n${plan.take(3000)}")
  }

  test("compression is real on disk: PQ codes tree ≪ SQ8 codes tree ≪ float source") {
    val rootPq = tmpRoot("sizePq"); val rootSq = tmpRoot("sizeSq")
    clean(rootPq, rootSq)
    IncrementalIvfPq.writeIndex(all, rootPq, dim = 64, k = 8, iters = 2)
    IncrementalIvfPq.writeIndexSq8(all, rootSq, dim = 64, k = 8, iters = 2)
    val n = all.count().toDouble
    // float source baseline: re-write the embeddings alone (same codec
    // config as the stores) so the comparison is parquet-vs-parquet
    val rootF = tmpRoot("sizeFloat")
    clean(rootF)
    all.write.mode("overwrite").parquet(rootF)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def bytes(p: String) = Compaction.treeBytes(spark, p)
    val (bF, bSq, bPq) = (bytes(rootF), bytes(s"$rootSq/codes"), bytes(s"$rootPq/codes"))
    // nominal: 256 B vs 64 B vs 8 B per vector. Parquet bit-packs the
    // int codes (≤8 bits each) and the float arrays are incompressible
    // noise, so the measured ratios land near nominal; assert the
    // conservative floors 2× and 4× so codec/footer overhead at this
    // corpus size can't flake the test.
    assert(bSq.toDouble < bF / 2.0,
      f"sq8 codes must be well under half the float bytes: $bSq vs $bF (n=$n%.0f)")
    assert(bPq.toDouble < bSq / 4.0,
      f"pq codes must be well under a quarter of sq8's: $bPq vs $bSq")
    fs.delete(new org.apache.hadoop.fs.Path(rootF), true)
  }

  test("search over the maintained store: sane shape, no cartesian, codes-only payload") {
    val root = tmpRoot("search")
    clean(root)
    IncrementalIvfPq.writeIndex(all, root, dim = 64, k = 8, iters = 2)
    val res = IncrementalIvfPq.search(spark, root, all, nprobe = 2, topK = 3)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val rows = res.collect()
    assert(rows.length == all.count() * 3)
    assert(rows.forall(_.getInt(2) <= 3))
    // the stored index carries codes, not embeddings
    val cols = IncrementalIvfPq.codes(spark, root).columns.toSet
    assert(cols == Set("vec_id", "cid", "codes"))
  }

  test("opq mode: frozen-R ingest ≡ rebuild; stored R orthogonal; store's codec beats plain PQ on the correlated corpus") {
    // the corpus OPQ exists for: the pinned structured mixture (q138's
    // generator) — shared cluster centers put correlation across all 64
    // dims that fixed dimension-blocks cannot exploit
    val corr = graft.queries.EmbeddingQueries.structuredCorpus(all)
    val seed = corr.filter(col("vec_id") % 10 =!= 7)
    val delta = corr.filter(col("vec_id") % 10 === 7)
    val rootInc = tmpRoot("opq_inc"); val rootFull = tmpRoot("opq_full")
    clean(rootInc, rootFull)
    IncrementalIvfPq.writeIndexOpq(seed, rootInc, dim = 64, k = 8, iters = 2, sweeps = 2)
    IncrementalIvfPq.ingestBatch(spark, rootInc, delta, batchId = 1L)
    // the q124 maintenance invariant at the rotated codec: ingest against
    // the frozen (cells, R, codebooks) lands every vector exactly where a
    // from-scratch re-encode of the whole corpus would
    IncrementalIvfPq.writeIndexOpq(seed, rootFull, dim = 64, k = 8, iters = 2, sweeps = 2)
    IncrementalIvfPq.ingestBatch(spark, rootFull, corr, batchId = 9L)
    def codeSet(root: String) = IncrementalIvfPq.codes(spark, root)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(codeSet(rootInc) == codeSet(rootFull),
      "frozen-R ingest must equal the rebuild (R, cells, and books are all pure functions)")
    // the frozen rotation is really orthogonal (search's cos(Ra, b̂) =
    // cos(a, Rᵀb̂) identity depends on it)
    val r = IncrementalIvfPq.rotationOf(spark, rootInc)
    assert(graft.ml.Opq.orthogonalityDefect(r) < 1e-9)
    // the LADDER ROW from the gated store's own artifacts: quantization
    // MSE through the STORE's R + codebook beats a plain-PQ codebook of
    // identical size trained on the same seed — the reason this codec
    // mode exists, measured from what q141's pipeline actually persisted
    val book = spark.read.parquet(s"$rootInc/pqbook")
    val ks = book.filter(col("s") === 0).count().toInt
    val mseOpq = graft.ml.Opq.quantizationMse(
      graft.ml.Opq.rotate(corr, r), book, 64, IncrementalIvfPq.M)
    val plainBook = graft.ml.ProductQuantizer.train(seed, 64, IncrementalIvfPq.M, ks, 2, denom = 4)
    val msePlain = graft.ml.Opq.quantizationMse(corr, plainBook, 64, IncrementalIvfPq.M)
    info(f"store-codec MSE: plain $msePlain%.6f -> opq $mseOpq%.6f (x${msePlain / mseOpq}%.2f)")
    assert(mseOpq < msePlain,
      s"the maintained store's OPQ codec must beat plain PQ on the correlated corpus: $mseOpq vs $msePlain")
    // search shape: no cartesian, candidates carry codes not floats
    val res = IncrementalIvfPq.search(spark, rootInc, corr, nprobe = 2, topK = 3)
    res.write.mode("overwrite").format("noop").save()
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "opq search must stay equi-join shaped")
    // deletes compose with the rotated codec (same tombstone machinery)
    val dead = corr.filter(col("vec_id") % 10 === 4).select("vec_id")
    IncrementalIvfPq.deleteBatch(spark, rootInc, dead, batchId = 2L)
    val deadSet = dead.collect().map(_.getLong(0)).toSet
    val hit = IncrementalIvfPq.search(spark, rootInc, corr, nprobe = 2, topK = 3)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(hit.intersect(deadSet).isEmpty, "tombstoned ids must not surface from an opq store")
  }
}
