package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.{NativeVecFns, TopKAgg}
import graft.ml.ProductQuantizer

/** Incremental IVF-PQ index maintenance — [[IncrementalIvf]]'s cell
  * streaming married to [[graft.ml.ProductQuantizer]]'s codes: the
  * FAISS `IVFxx,PQyy` production deployment. BOTH quantizers freeze at
  * seed time (the coarse k-means that keys the inverted lists AND the m
  * per-subspace codebooks that compress the payload), so a delta vector's
  * (cid, codes) is a pure function of (vector, frozen quantizers) —
  * existing index rows can never change when a delta arrives, giving the
  * same EXACT maintenance invariant as IncrementalIvf:
  * `codes(state ∪ delta) ≡ encode(state ∪ delta, quantizers)`, the
  * from-scratch rebuild (q124 hash-proves the search results against a
  * DuckDB oracle that replays seed-only training + full-corpus encode).
  *
  * What the index STORES per vector is (cid, m codes) — 8 bytes of
  * payload at the byte-code config instead of 256 — so the inverted
  * lists a 100 TB probe touches are 32× smaller than float lists; the
  * probe reconstructs candidates through the plan-literal LUT
  * (no join, no shuffle) and reranks by asymmetric distance.
  *
  * Store layout under `root`:
  *  - `centroids/` — frozen coarse quantizer (cid, centroid), k rows
  *  - `pqbook/`    — frozen codebooks (s, code, centroid), m·ks rows
  *  - `codes/`     — (vec_id, codes) PARTITIONED BY (ingest_batch, cid):
  *    batch-keyed dynamic overwrite makes replays idempotent (the
  *    [[IncrementalDedup.ingestBatch]] recipe), and the `cid` inner
  *    level is the INVERTED-LIST layout — a probe's cell scan prunes to
  *    its nprobe `cid=` directories instead of reading the store
  *    ([[IncrementalIvf]]'s layout, kept through [[compactIndex]]). */
object IncrementalIvfPq {

  val M = 8

  /** Seed the store: train BOTH quantizers on the state corpus (coarse
    * k via [[IncrementalIvf.kFor]] when unpinned; codebook ks via
    * [[ProductQuantizer.ksFor]] when unpinned — derived widths are the
    * default path), encode the state, write batch −1.
    *
    * `residual = true` trains the codebooks on `x − c(cell(x))` instead
    * of `x` (Jégou et al. 2011 §IV.B — what FAISS's `IVFxx,PQyy`
    * actually encodes; the measured recall ladder shows it is the right
    * codec whenever the corpus has cluster structure, which is exactly
    * when IVF itself works). The mode is recorded in `meta/` so every
    * later ingest/search reads the store self-describingly; stores
    * written without the flag (or by older builds, no meta dir) are
    * raw-coded and behave exactly as before. */
  def writeIndex(state: DataFrame, root: String, dim: Int,
                 k: Int = -1, ks: Int = -1, iters: Int = 2,
                 residual: Boolean = false): Unit = {
    val spark = state.sparkSession
    val n = state.count()
    val kk = if (k > 0) k else IncrementalIvf.kFor(n)
    val kss = if (ks > 0) ks else ProductQuantizer.ksFor(n)
    val (cents, _) = graft.ml.KMeans.fit(state, kk, iters)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    import spark.implicits._
    Seq(if (residual) "residual" else "raw").toDF("encoding")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
    val trainSrc =
      if (residual)
        residualsOf(state, spark.read.parquet(s"$root/centroids"))
          .select("vec_id", "embedding")
      else state
    val book = ProductQuantizer.train(trainSrc, dim, M, kss, iters, denom = 4)
    book.coalesce(1).write.mode("overwrite").parquet(s"$root/pqbook")
    encodeTo(state, root).withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch", "cid")
      .parquet(s"$root/codes")
    cents.unpersist()
    writeStats(state, root)
  }

  /** The store's codec, from `meta/`: "raw" (PQ on absolute vectors),
    * "residual" (PQ on x − c(cell(x))), "sq8" (per-dim byte grid), or
    * "opq" (PQ on R·x against the frozen learned rotation —
    * [[writeIndexOpq]]). Absent meta = "raw", covering pre-meta stores. */
  def encoding(spark: SparkSession, root: String): String = {
    val m = new org.apache.hadoop.fs.Path(s"$root/meta")
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(m)) spark.read.parquet(m.toString).head().getString(0)
    else "raw"
  }

  /** True iff the store's codes are residual-coded. */
  def isResidual(spark: SparkSession, root: String): Boolean =
    encoding(spark, root) == "residual"

  /** Seed an SQ8-coded store: the coarse quantizer trains exactly like
    * [[writeIndex]], but the payload codec is the per-dim scalar byte
    * grid (q97's codec, FAISS `SQ8`): per-dim (min, max) FREEZE on the
    * seed corpus (`sqstats/`, 2·dim doubles — a plan literal at search
    * time), each vector stores dim byte codes (64 B at dim 64 — the 4×
    * step between floats and PQ), and a delta's codes are a pure
    * function of (vector, frozen stats), so the maintenance invariant is
    * q124's. Deltas may fall OUTSIDE the seed's per-dim range — codes
    * clamp to [0, 255] on BOTH engines (the production behavior: a
    * frozen grid saturates, it does not retrain). The measured ladder
    * says this codec is the default choice when the corpus lacks cluster
    * structure: recall within 0.1% of full floats at 4× compression. */
  def writeIndexSq8(state: DataFrame, root: String, dim: Int,
                    k: Int = -1, iters: Int = 2): Unit = {
    val spark = state.sparkSession
    val n = state.count()
    val kk = if (k > 0) k else IncrementalIvf.kFor(n)
    val (cents, _) = graft.ml.KMeans.fit(state, kk, iters)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    import spark.implicits._
    Seq("sq8").toDF("encoding")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
    state.agg(
        array((0 until dim).map(i =>
          min(element_at(col("embedding"), i + 1).cast("double"))): _*).as("mins"),
        array((0 until dim).map(i =>
          max(element_at(col("embedding"), i + 1).cast("double"))): _*).as("maxs"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/sqstats")
    encodeTo(state, root).withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch", "cid")
      .parquet(s"$root/codes")
    cents.unpersist()
    writeStats(state, root)
  }

  /** Seed an OPQ-coded store — [[graft.ml.Opq]]'s learned rotation as a
    * codec mode of the maintained index (Ge et al. 2013 wired into the
    * FAISS-style `OPQ,IVF,PQ` stack): the coarse quantizer trains on the
    * RAW seed exactly like [[writeIndex]] (cells stay raw-space, so
    * probe cell ranking never changes), the rotation R and the PQ
    * codebooks come from [[graft.ml.Opq.fit]]'s alternation on the seed,
    * and the payload is `PQ(R·x)` — same 8 B/vector as raw PQ, with the
    * corpus's inter-dimension correlation moved INSIDE the subspaces
    * where the codebooks can spend codes on it. R freezes with the
    * other quantizers (`rotation/`, d rows of d doubles), so a delta's
    * (cid, codes) stays a pure function of (vector, frozen quantizers)
    * and the q124 maintenance invariant carries over unchanged.
    *
    * Search needs NO decode-side inverse: reconstructions live in
    * rotated space and the probe rotates instead — cos(Ra, b̂) =
    * cos(a, Rᵀb̂) because R is orthogonal (the [[graft.ml.Opq
    * .rotateBack]] identity), and rotating |probes| rows (a plan-literal
    * GEMV) is cheaper than rotating every candidate reconstruction. */
  def writeIndexOpq(state: DataFrame, root: String, dim: Int,
                    k: Int = -1, ks: Int = -1, iters: Int = 2,
                    sweeps: Int = 2): Unit = {
    val spark = state.sparkSession
    val n = state.count()
    val kk = if (k > 0) k else IncrementalIvf.kFor(n)
    val kss = if (ks > 0) ks else ProductQuantizer.ksFor(n)
    val (cents, _) = graft.ml.KMeans.fit(state, kk, iters)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    import spark.implicits._
    Seq("opq").toDF("encoding")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
    val (r, book) = graft.ml.Opq.fit(state, dim, M, kss, iters, sweeps)
    r.toIndexedSeq.zipWithIndex.map { case (row, i) => (i, row.toSeq) }
      .toDF("i", "row").coalesce(1).write.mode("overwrite")
      .parquet(s"$root/rotation")
    book.coalesce(1).write.mode("overwrite").parquet(s"$root/pqbook")
    encodeTo(state, root).withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch", "cid")
      .parquet(s"$root/codes")
    cents.unpersist()
    writeStats(state, root)
  }

  /** Per-cell mean assignment distance of the seed corpus under
    * `root/stats` (cid, mean_dist, n) — the drift baseline for
    * [[assignmentDrift]], k rows. Written at seed/[[retrain]] time while
    * the full-precision state is still in hand: the codes store is LOSSY,
    * so unlike [[IncrementalIvf]]'s float index this baseline cannot be
    * recomputed from the store later. Coarse assignment is raw-space for
    * every codec (residual/sq8/opq all key cells on the unrotated
    * vector), so one recipe serves all four. */
  private def writeStats(state: DataFrame, root: String): Unit = {
    val spark = state.sparkSession
    graft.ml.KMeans.assign(state, spark.read.parquet(s"$root/centroids"))
      .withColumn("adist", sqrt(col("dist_sq")))
      .groupBy("cid")
      .agg(avg("adist").as("mean_dist"), count(lit(1)).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/stats")
    ()
  }

  /** MEASURED drift signal for the frozen quantizers — the
    * [[IncrementalIvf.assignmentDrift]] recipe at the compressed codec:
    * the delta's mean coarse-assignment distance, normalized per cell by
    * the seed's baseline (`root/stats`); ≈1.0 in-distribution, growing as
    * ingest leaves the trained cells (recall decays silently — candidates
    * concentrate in few cells while the frozen codebooks quantize
    * residuals they never trained on). Cells the seed never populated
    * normalize by the seed's global mean. Cost: O(|delta| · k) distance
    * evals + two k-row broadcasts — the ingest assignment's own order.
    * Compare against [[IncrementalIvf.DriftRetrainThreshold]] and call
    * [[retrain]] at the next snapshot point when exceeded. */
  def assignmentDrift(spark: SparkSession, root: String, delta: DataFrame): Double = {
    val stats = spark.read.parquet(s"$root/stats")
    val g = stats.select(
      (sum(col("mean_dist") * col("n")) / sum(col("n"))).as("gm")).first()
    val globalMean = if (g.isNullAt(0)) 0.0 else g.getDouble(0)
    if (globalMean <= 0.0) return 1.0 // degenerate seed (all vectors identical)
    val cents = spark.read.parquet(s"$root/centroids")
    val r = graft.ml.KMeans.assign(delta, cents)
      .withColumn("adist", sqrt(col("dist_sq")))
      .join(broadcast(stats.select(col("cid"), col("mean_dist"))), Seq("cid"), "left_outer")
      .select(avg(col("adist") /
        when(col("mean_dist") > 0.0, col("mean_dist")).otherwise(lit(globalMean)))
        .as("drift")).first()
    if (r.isNullAt(0)) 1.0 else r.getDouble(0)
  }

  /** Snapshot retrain — the answer to the frozen-quantizer caveat at the
    * COMPRESSED codec (previously only the uncompressed
    * [[IncrementalIvf.retrain]] had one): re-learn the coarse quantizer,
    * the codebooks, and (for opq stores) the rotation on `corpus`,
    * re-encode everything, and swap the rebuilt store in as ONE unit by
    * the same fail-stop two-rename protocol (`root` → `root__retrain_old`,
    * staged sibling → `root`) under the store-root lease — a crash
    * mid-swap leaves `root` missing (loud), recovered by the next
    * [[retrain]]/[[recoverSwap]]; never a MIXED store (new codebooks over
    * old codes would decode plausible-looking wrong neighbors). The
    * rebuild lands everything in batch −1, so a retrain is also a full
    * compaction, and the fresh store carries no tombstones.
    *
    * `corpus` is the caller's LIVE full-precision corpus (state ∪ every
    * ingested delta, deleted ids excluded): the codes store is lossy, so
    * — exactly like [[searchRefined]]'s refine stage — the raw vectors
    * are the system of record and retraining reads them there, not from
    * the 8-byte codes. The codec is preserved from `meta/`; widths
    * re-derive from the POST-drift corpus size when unpinned (`k`/`ks`
    * ≤ 0), so a store that grew a decade retrains at the decade's √N. */
  def retrain(spark: SparkSession, root: String, corpus: DataFrame, dim: Int,
              k: Int = -1, ks: Int = -1, iters: Int = 2, sweeps: Int = 2): Unit = {
    val fsRoot = new org.apache.hadoop.fs.Path(root)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // single-maintainer lease: a second concurrent retrain's recovery
    // branch could delete the parked __retrain_old copy while this one
    // is between its two renames (IncrementalIvf.retrain's contract)
    val lock = Compaction.acquireLease(fs, root)
    try {
      recoverSwap(spark, root)
      val tmp = s"${root}__retrain"
      encoding(spark, root) match {
        case "sq8"      => writeIndexSq8(corpus, tmp, dim, k, iters)
        case "residual" => writeIndex(corpus, tmp, dim, k, ks, iters, residual = true)
        case "opq"      => writeIndexOpq(corpus, tmp, dim, k, ks, iters, sweeps)
        case _          => writeIndex(corpus, tmp, dim, k, ks, iters)
      }
      val old = new org.apache.hadoop.fs.Path(s"${root}__retrain_old")
      // a FALSE rename return unchecked would nest the retrained store
      // inside the still-live root (the mixed state the protocol forbids)
      require(fs.rename(fsRoot, old), s"retrain swap rename $fsRoot -> $old failed")
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), fsRoot),
        s"retrain swap rename $tmp -> $fsRoot failed")
      fs.delete(old, true)
      ()
    } finally { fs.delete(lock, false); () }
  }

  /** Restore a store whose last [[retrain]] crashed between its two
    * renames (live root missing, pre-retrain copy parked); clears
    * leftover staging/parked dirs otherwise. No-op on a healthy store. */
  def recoverSwap(spark: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"${root}__retrain_old")
    if (!fs.exists(p) && fs.exists(old))
      require(fs.rename(old, p), s"retrain recovery rename $old -> $p failed")
    else if (fs.exists(old)) fs.delete(old, true)
    val stale = new org.apache.hadoop.fs.Path(s"${root}__retrain")
    if (fs.exists(stale)) { fs.delete(stale, true); () }
  }

  /** The drift→retrain safe point for the LIVE streaming operating mode
    * (r14 verdict #2 — the one manual lifecycle step left): [[retrain]]
    * renames the store root, so it must never run inside `foreachBatch`
    * ([[MaintenancePolicy.onDrift]] only SIGNALS). The orchestration a
    * deployment runs on that signal is stop → this method → restart on
    * the SAME checkpoint, and the subtle part is the stop boundary:
    * `StreamingQuery.stop()` can interrupt micro-batch N AFTER its
    * [[ingestBatch]] store write but BEFORE its offset commit. That
    * partition WILL be replayed on restart (its dynamic overwrite
    * replaces it — the exactly-once recipe), so folding it into the
    * rebuilt base would land its rows twice: once in `ingest_batch=-1`
    * and once in the replayed partition. This method therefore:
    *
    *  1. reads the checkpoint's commit log for the last COMMITTED batch,
    *  2. prunes every `codes/ingest_batch=N` partition with N beyond it
    *     (the replay will rebuild them against the NEW quantizers),
    *  3. restricts the retrain corpus to vec_ids the pruned store still
    *     holds live (`rawCorpus` is the system of record for VALUES —
    *     retrain's contract — but the committed store decides
    *     MEMBERSHIP: raw rows whose batch never committed must not leak
    *     into the rebuild, for the same no-double-land reason), and
    *  4. runs [[retrain]] (which takes the store lease and swaps by the
    *     two-rename fail-stop protocol).
    *
    * On restart, the stream replays any uncommitted batch and continues
    * — SafePointRetrainSpec hash-proves the resumed store against a
    * stop-retrain-rebuild twin, for both the graceful boundary and the
    * crashed-mid-batch one. Call ONLY after the query has stopped;
    * deletes flow through [[deleteBatch]] (not the ingest stream), so
    * tombstones need no commit-log reconciliation — retrain folds them.
    *
    * @return the pruned (uncommitted) batch ids, for observability */
  def retrainAtSafePoint(spark: SparkSession, root: String, checkpoint: String,
                         rawCorpus: DataFrame, dim: Int,
                         k: Int = -1, ks: Int = -1, iters: Int = 2,
                         sweeps: Int = 2): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(spark, root)
    val committed = lastCommittedBatch(spark, checkpoint)
    val codesPath = new org.apache.hadoop.fs.Path(s"$root/codes")
    val pruned =
      if (!fs.exists(codesPath)) Seq.empty[Long]
      else fs.listStatus(codesPath).filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("ingest_batch=") =>
          n.stripPrefix("ingest_batch=").toLong }
        .filter(b => b >= 0 && b > committed).sorted.toSeq
    pruned.foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/codes/ingest_batch=$b"), true)
    }
    val members = liveCodes(spark, root).select("vec_id").distinct()
    retrain(spark, root, rawCorpus.join(members, Seq("vec_id"), "left_semi"),
      dim, k, ks, iters, sweeps)
    pruned
  }

  /** Highest batch id with a COMMITTED offset in a Structured Streaming
    * checkpoint (−1 if none): the files under `<checkpoint>/commits` are
    * named by batch id, written only after the batch's `foreachBatch`
    * body returned — batches above this mark are replayed on restart. */
  def lastCommittedBatch(spark: SparkSession, checkpoint: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$checkpoint/commits")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).filter(_.isFile)
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .foldLeft(-1L)(math.max)
  }

  /** The frozen rotation (row-major d×d) of an OPQ store. */
  def rotationOf(spark: SparkSession, root: String): Array[Array[Double]] =
    spark.read.parquet(s"$root/rotation").orderBy("i").collect()
      .map(_.getSeq[Double](1).toArray)

  /** (vec_id, cid, embedding = x − c(cell(x))): the residual frame —
    * float-corpus minus double-centroid, bit-identical in Spark and the
    * DuckDB oracle. One broadcast k-row join. */
  private def residualsOf(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val asg = graft.ml.KMeans.assign(vecs, cents).select(col("vec_id"), col("cid"))
    vecs.join(asg, Seq("vec_id"))
      .join(broadcast(cents.select(col("cid"), col("centroid"))), Seq("cid"))
      .select(col("vec_id"), col("cid"),
        zip_with(col("embedding"), col("centroid"),
          (x, c) => x.cast("double") - c).as("embedding"))
  }

  /** (vec_id, cid, codes) against the FROZEN quantizers — the shared
    * assignment path of seed and every delta (so they cannot diverge).
    * Residual stores encode `x − c(cid)`; sq8 stores encode per-dim
    * byte codes on the frozen grid (clamped to [0, 255] — out-of-seed-
    * range deltas saturate); raw stores encode `x`. */
  private def encodeTo(vecs: DataFrame, root: String): DataFrame = {
    val spark = vecs.sparkSession
    val cents = spark.read.parquet(s"$root/centroids")
    encoding(spark, root) match {
      case "sq8" =>
        val st = spark.read.parquet(s"$root/sqstats")
        val dim = st.head().getSeq[Double](0).length
        val cids = graft.ml.KMeans.assign(vecs, cents).select(col("vec_id"), col("cid"))
        vecs.crossJoin(broadcast(st))
          .withColumn("codes", transform(sequence(lit(0), lit(dim - 1)), i => {
            val x = element_at(col("embedding"), i + lit(1)).cast("double")
            val mn = element_at(col("mins"), i + lit(1))
            val mx = element_at(col("maxs"), i + lit(1))
            val step = (mx - mn) / lit(255.0)
            when(mx === mn, lit(0)).otherwise(
              least(lit(255.0), greatest(lit(0.0),
                floor((x - mn) / step + lit(0.5)))).cast("int"))
          }))
          .join(cids, Seq("vec_id"))
          .select("vec_id", "cid", "codes")
      case "residual" =>
        val book = spark.read.parquet(s"$root/pqbook")
        val dim = M * book.head().getSeq[Double](2).length
        val res = residualsOf(vecs, cents)
        ProductQuantizer.encode(res.select("vec_id", "embedding"), book, dim, M)
          .join(res.select("vec_id", "cid"), Seq("vec_id"))
          .select("vec_id", "cid", "codes")
      case "opq" =>
        val book = spark.read.parquet(s"$root/pqbook")
        val dim = M * book.head().getSeq[Double](2).length
        val cids = graft.ml.KMeans.assign(vecs, cents).select(col("vec_id"), col("cid"))
        val rot = graft.ml.Opq.rotate(
          vecs.select("vec_id", "embedding"), rotationOf(spark, root))
        ProductQuantizer.encode(rot, book, dim, M).join(cids, Seq("vec_id"))
          .select("vec_id", "cid", "codes")
      case _ =>
        val book = spark.read.parquet(s"$root/pqbook")
        val dim = M * book.head().getSeq[Double](2).length
        val cids = graft.ml.KMeans.assign(vecs, cents).select(col("vec_id"), col("cid"))
        ProductQuantizer.encode(vecs, book, dim, M).join(cids, Seq("vec_id"))
          .select("vec_id", "cid", "codes")
    }
  }

  /** Ingest one delta batch idempotently, retraining NOTHING: both
    * quantizers stay frozen, the delta encodes to (cid, codes) and
    * replaces exactly its own batch partition.
    *
    * READER-CONSISTENCY CONTRACT (single-rename commit): the batch is
    * staged as a SIBLING directory (`codes__staging_N`, partitioned by
    * cid — the ingest_batch level comes from the committed directory
    * name, so the on-disk layout is unchanged) and committed by ONE
    * atomic rename into `codes/ingest_batch=N`. A search that lists the
    * store concurrently therefore sees the batch entirely or not at all
    * — never a torn subset of its cid partitions, which the previous
    * dynamic-partition-overwrite commit (one rename per (batch, cid)
    * dir) could expose mid-commit. Proven by ConcurrentIngestSpec:
    * every count observed during a live ingest stream lands exactly on
    * a batch boundary. Residual windows, both bounded and recovered:
    * a REPLAY of an already-visible batch deletes the old copy before
    * renaming the new one in (a concurrent reader may transiently miss
    * that batch — the pre-replay rows, not a mix; the replayed commit
    * restores them), and a crash mid-stage leaves only the staging
    * sibling, cleaned up by the next attempt before it writes. */
  def ingestBatch(spark: SparkSession, root: String, delta: DataFrame,
                  batchId: Long): Unit =
    Compaction.commitBatch(spark, s"$root/codes", encodeTo(delta, root),
      "ingest_batch", batchId, innerPartCols = Seq("cid"))

  /** Fold the per-batch partitions into the base — [[Compaction
    * .foldIngestBatches]] under the same safe-point contract as the
    * dedup/IVF stores (call only with every folded batch's offset
    * committed, ingest AND delete). The `cid` inner level survives the
    * fold, so the inverted-list layout — probes pruning to their nprobe
    * cells' directories — is preserved while the per-batch small files
    * consolidate.
    *
    * DELETE-AWARE (the FAISS `remove_ids` physical analogue): the fold
    * PURGES tombstoned vec_ids from the rewritten base partition and
    * truncates the tombstone batches it applied — without this, deletes
    * are forever: dead rows occupy the inverted lists (every probe scans
    * them just to drop them post-anti-join) and the tombstone side of
    * [[liveCodes]]' anti-join grows without bound on a churn-heavy
    * store. The crash contract stays fail-stop/idempotent: tombstones
    * truncate only AFTER the swap commits, so a crash between swap and
    * truncation leaves tombstones that re-apply as a no-op (the ids are
    * already gone) and truncate on the next fold. Tombstone batches are
    * SNAPSHOT by directory listing before the purge — a delete recorded
    * mid-fold (contract violation, but cheap to tolerate) is not
    * truncated and stays visible to [[liveCodes]]. If the purge would
    * empty the store entirely the fold declines (see
    * [[Compaction.foldIngestBatches]]) and tombstones are kept, so
    * reads remain filtered.
    *
    * The WHOLE pass — tombstone snapshot, fold, truncation — runs under
    * ONE store-root lease (acquired here, fold via the leased variant):
    * snapshotting before / truncating after the lease would let another
    * maintainer interleave between the listing and the purge. Concurrent
    * [[deleteBatch]] calls (ingest-path, deliberately lease-free) are
    * safe against the snapshot because each delete batch COMMITS BY ONE
    * ATOMIC RENAME — a listed batch dir is always complete — and
    * truncation deletes only the snapshotted dirs plus a NON-recursive
    * delete of the tombstone root, which simply fails (left in place)
    * when a new delete batch landed mid-fold, keeping it visible to
    * [[liveCodes]] until the next compaction applies it. */
  def compactIndex(spark: SparkSession, root: String,
                   targetBytes: Long = 128L << 20): Unit = {
    val tomb = new org.apache.hadoop.fs.Path(s"$root/tombstones")
    val fs = tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = Compaction.acquireLease(fs, root)
    try {
      val batchDirs =
        if (fs.exists(tomb))
          fs.listStatus(tomb).filter(s => s.isDirectory &&
            s.getPath.getName.startsWith("delete_batch=")).map(_.getPath)
        else Array.empty[org.apache.hadoop.fs.Path]
      val purge: DataFrame => DataFrame =
        if (batchDirs.isEmpty) Compaction.FoldToBase
        else {
          val dead = spark.read.parquet(batchDirs.map(_.toString).toIndexedSeq: _*)
            .select("vec_id").distinct()
          // tombstones here are doc-final (vec_id anti-join, batch-blind),
          // so survivors all fold to the base — re-applying a stale
          // tombstone post-crash is a no-op (the ids are already gone)
          df => Compaction.FoldToBase(df.join(dead, Seq("vec_id"), "left_anti"))
        }
      val folded = Compaction.foldIngestBatchesLeased(spark, s"$root/codes",
        innerPartCols = Seq("cid"), rangeCols = Nil, targetBytes = targetBytes,
        transform = purge)
      if (folded && batchDirs.nonEmpty) {
        batchDirs.foreach(fs.delete(_, true))
        // empty-only delete: a delete batch that landed mid-fold survives
        // (visible to liveCodes) instead of crashing the fold or being
        // wiped unapplied; when the delete succeeds, liveCodes' existence
        // check skips the anti-join entirely
        Compaction.deleteIfEmpty(fs, tomb)
        ()
      }
    } finally { fs.delete(lock, false); () }
  }

  /** Codec advisor — the measured recall ladder's conclusion as a
    * decision procedure. The ladder (BASELINE.md §"Structured-corpus
    * ladder") shows the codec choice hinges on ONE statistic: how much
    * of the corpus variance the coarse quantizer explains. On clustered
    * corpora (explained fraction high) residual-PQ triples raw-PQ's
    * recall and SQ8's 4× is leaving 8× on the table; on isotropic
    * corpora (explained ≈ 0) PQ's 8 bytes cannot rank within-cell noise
    * and SQ8 is recall-free. So: train the coarse quantizer on a
    * sample, measure `1 − E‖x − c(x)‖² / E‖x − mean‖²`, and recommend
    * "residual" past `threshold`, else "sq8". Cost = one k-means fit
    * plus two broadcast-assign passes over the sample — run it on the
    * same sample `writeIndex` would train on. */
  /** Default explained-variance cut for [[recommendCodec]] — from the
    * measured ladder: the clustered corpus (where residual-PQ wins) sits
    * far above it, the isotropic one (where SQ8 wins) far below. */
  val CodecThreshold = 0.2

  def recommendCodec(sample: DataFrame, k: Int = -1, iters: Int = 2,
                     threshold: Double = CodecThreshold): String =
    if (explainedVariance(sample, k, iters) >= threshold) "residual" else "sq8"

  /** Relative quantization-MSE win the learned rotation must deliver
    * before the three-way advisor prefers "opq" over "residual". 5%
    * keeps in-the-noise wins from flipping the codec. */
  val OpqMseWinThreshold = 0.05

  /** Three-way codec advisor (residual / sq8 / opq) — the two-way
    * decision extended with a second measured criterion: on a clustered
    * corpus, prefer OPQ over residual-PQ exactly when OPQ's
    * quantization MSE beats RESIDUAL-PQ's by [[OpqMseWinThreshold]] at
    * the same bit budget (same m, ks, training sample).
    *
    * r15 fix, caught by CodecParetoSpec's measured-ladder cross-check:
    * the advisor used to compare OPQ against PLAIN raw-space PQ — a
    * codec that is not even on the store's menu — and so routed the
    * structured ladder corpus to "opq" although the committed ladder
    * itself has residual-PQ at ~2× OPQ's recall there (BASELINE.md r12
    * table: 0.456 vs 0.217 at sf0.01; measured MSEs r15: residual
    * 0.111 vs OPQ 0.870 — the coarse centroids remove the between-
    * cluster variance that raw-space rotation spends its codes on). The
    * comparison now prices the actual alternative: residual-PQ's MSE is
    * measured through the SAME coarse quantizer the store would use
    * (reconstruction = centroid + decode, so MSE in residual space IS
    * reconstruction MSE in corpus space). OPQ keeps its place for
    * corpora whose within-cell correlation a rotation can exploit
    * beyond what centroid subtraction removes; on every suite shape
    * measured so far the answer is "residual", and the OPQ store
    * surface (q141's lifecycle, writeIndexOpq) remains independently
    * gated. Unclustered corpora still route to sq8 first (PQ at any
    * rotation cannot rank within-cell white noise). Cost: the two-way
    * statistic + two codebook fits and two MSE passes over the sample —
    * advisor-time, not store-time. */
  def recommendCodec3(sample: DataFrame, dim: Int, k: Int = -1, iters: Int = 2,
                      threshold: Double = CodecThreshold,
                      opqWin: Double = OpqMseWinThreshold): String = {
    val n = sample.count()
    val kk = if (k > 0) k else IncrementalIvf.kFor(n)
    if (explainedVariance(sample, kk, iters) < threshold) "sq8"
    else {
      val kss = ProductQuantizer.ksFor(n)
      // residual-PQ MSE through the same coarse quantizer the store uses
      val (cents, _) = graft.ml.KMeans.fit(sample, kk, iters)
      val res = sample
        .join(graft.ml.KMeans.assign(sample, cents).select("vec_id", "cid"), Seq("vec_id"))
        .join(broadcast(cents.select(col("cid"), col("centroid").as("ccent"))), Seq("cid"))
        .select(col("vec_id"), zip_with(col("embedding"), col("ccent"),
          (x, c) => (x.cast("double") - c).cast("float")).as("embedding"))
      val (_, resBook) = graft.ml.Opq.fit(res, dim, M, kss, iters, sweeps = 0)
      val resMse = graft.ml.Opq.quantizationMse(res, resBook, dim, M)
      cents.unpersist()
      val (r, opqBook) = graft.ml.Opq.fit(sample, dim, M, kss, iters, sweeps = 1)
      val opqMse = graft.ml.Opq.quantizationMse(
        graft.ml.Opq.rotate(sample, r), opqBook, dim, M)
      if (opqMse < resMse * (1.0 - opqWin)) "opq" else "residual"
    }
  }

  /** The advisor's measured statistic on its own:
    * `1 − E‖x − c(x)‖² / E‖x − mean‖²` — the fraction of the sample's
    * variance the coarse quantizer explains (≈0 on isotropic corpora,
    * high on clustered ones). Exposed separately so the q137 oracle
    * query can gate the NUMBER, not just the threshold comparison. */
  def explainedVariance(sample: DataFrame, k: Int = -1, iters: Int = 2): Double = {
    val spark = sample.sparkSession
    val n = sample.count()
    val kk = if (k > 0) k else IncrementalIvf.kFor(n)
    val (cents, _) = graft.ml.KMeans.fit(sample, kk, iters)
    val resVar = graft.ml.KMeans.assign(sample, cents)
      .agg(avg("dist_sq")).first().getDouble(0)
    cents.unpersist()
    val mean = sample
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos").agg(avg(col("x").cast("double")).as("c"))
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq
    val one = sample.sparkSession.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(0, mean)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val totVar = graft.ml.KMeans.assign(sample, one)
      .agg(avg("dist_sq")).first().getDouble(0)
    if (totVar <= 0.0) 0.0 else 1.0 - resVar / totVar
  }

  /** The maintained compressed index, tombstones NOT applied — the raw
    * store view compaction and the rebuild-equivalence specs compare. */
  def codes(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/codes").select("vec_id", "cid", "codes")

  /** Record a delete batch as TOMBSTONES — the standard immutable-segment
    * delete (FAISS `remove_ids` semantics on a store whose code files are
    * write-once): deleted ids land in `tombstones/delete_batch=<id>`,
    * committed by ONE atomic rename ([[Compaction.commitBatch]] — the
    * same single-rename recipe as [[ingestBatch]]): a replayed delete
    * replaces exactly its own partition, and a concurrent reader or
    * [[compactIndex]] tombstone snapshot sees a delete batch entirely or
    * not at all, never a half-written directory (the pre-r13 dynamic
    * overwrite could expose one mid-write to the compaction listing);
    * the code files never rewrite on the delete path. Tombstones are
    * global and final for a vec_id: re-admitting one means a new vec_id
    * (or an offline rewrite), matching the append-only id contract of
    * every store in this repo. */
  def deleteBatch(spark: SparkSession, root: String, ids: DataFrame,
                  batchId: Long): Unit =
    Compaction.commitBatch(spark, s"$root/tombstones", ids.select("vec_id"),
      "delete_batch", batchId)

  /** The LIVE index: [[codes]] minus tombstoned ids. Stores that never
    * saw a delete skip the anti-join entirely (existence check at plan
    * build), so the q124/q126/q127 plans — and their parity hashes — are
    * untouched. With tombstones present this is one left-anti equi-join
    * on vec_id: linear, and AQE broadcasts the (typically tiny) tombstone
    * side at runtime. Neither side grows without bound: [[compactIndex]]
    * physically purges tombstoned rows from the lists and truncates the
    * applied tombstone batches, so a long-lived churn-heavy store pays
    * the anti-join only for deletes since its last compaction. */
  private val TombSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("delete_batch", org.apache.spark.sql.types.LongType)))

  def liveCodes(spark: SparkSession, root: String): DataFrame = {
    val t = new org.apache.hadoop.fs.Path(s"$root/tombstones")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t))
      // explicit schema: in the window where compactIndex has truncated
      // every delete_batch dir but not yet the root, inference would
      // throw "Unable to infer schema" — with the schema pinned an empty
      // tombstone dir is an empty frame and the anti-join is a no-op
      // (IncrementalDedup.TombSchema plays the same role there)
      codes(spark, root).join(
        spark.read.schema(TombSchema).parquet(t.toString)
          .select("vec_id").distinct(),
        Seq("vec_id"), "left_anti")
    else codes(spark, root)
  }

  /** LIVE ingest: checkpointed foreachBatch over a (vec_id, embedding)
    * stream; each micro-batch runs [[ingestBatch]] under its own
    * batchId, so a replay after a failure dynamic-overwrites exactly its
    * own partition (the [[IncrementalDedup]] exactly-once recipe). Both
    * quantizers stay frozen for the life of the stream — the invariant
    * that keeps the streamed store ≡ a from-scratch batch rebuild
    * (q126 hash-proves it against q124's rebuild-replaying oracle). */
  def ingestStream(vecStream: DataFrame, root: String,
                   checkpoint: String,
                   policy: MaintenancePolicy = MaintenancePolicy.Off): org.apache.spark.sql.streaming.StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          ingestBatch(batch.sparkSession, root, batch, batchId)
          if (policy.driftDue(batchId))
            policy.onDrift(batchId,
              assignmentDrift(batch.sparkSession, root, batch))
          if (policy.compactDue(batchId)) {
            compactIndexBounded(batch.sparkSession, root, maxBatchExclusive = batchId)
            ()
          }
        }
      }
      .start()

  /** Bounded, tombstone-free fold for the STREAMING maintenance policy
    * ([[MaintenancePolicy]]): committed batches (`ingest_batch <
    * maxBatchExclusive`) fold to the base, the in-flight batch passes
    * through in its own partition (so a crash-replay's dynamic overwrite
    * replaces exactly it — the safe-point contract met by construction).
    * Tombstone purge/truncation stays [[compactIndex]]'s offline job; the
    * [[liveCodes]] anti-join keeps filtering meanwhile. A held store
    * lease skips the pass (returns false) rather than failing the
    * stream. */
  def compactIndexBounded(spark: SparkSession, root: String,
                          maxBatchExclusive: Long,
                          targetBytes: Long = 128L << 20): Boolean = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock =
      try Compaction.acquireLease(fs, root)
      catch { case _: IllegalArgumentException => return false }
    try {
      val keep: DataFrame => DataFrame = df =>
        df.withColumn("ingest_batch",
          when(col("ingest_batch") >= lit(maxBatchExclusive), col("ingest_batch"))
            .otherwise(lit(-1L)))
      Compaction.foldIngestBatchesLeased(spark, s"$root/codes",
        innerPartCols = Seq("cid"), rangeCols = Nil,
        targetBytes = targetBytes, transform = keep)
      true
    } finally { fs.delete(lock, false); () }
  }

  /** IVF-PQ top-k search: probes rank their `nprobe` nearest frozen
    * cells (broadcast k-row frame), candidates come from the cid
    * equi-join against the CODES store, reconstruction through the
    * plan-literal LUT in the scan projection, asymmetric-cosine rerank
    * to `topK` via the bounded-state [[TopKAgg]]. Output = q89's shape
    * with `adc_sim`. */
  def search(spark: SparkSession, root: String, probes: DataFrame,
             nprobe: Int, topK: Int): DataFrame =
    adcTopK(spark, root, probes, nprobe, topK)
      .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("adc_sim"))

  /** FILTERED search — the metadata-predicate + ANN composition every
    * vector store ships (FAISS `IDSelector`, the filtered-search mode of
    * the production vector DBs): only candidates whose vec_id appears in
    * `allowed` are ranked. Relational engines express this as a
    * left-semi equi-join, and it lands EARLY — on the codes store before
    * reconstruction and rerank — so a selective predicate shrinks the
    * candidate join itself, not just the output (FAISS by contrast
    * post-filters its list scan). Probes with fewer than topK allowed
    * candidates in their probed cells legally return fewer rows. */
  def searchFiltered(spark: SparkSession, root: String, probes: DataFrame,
                     allowed: DataFrame, nprobe: Int, topK: Int): DataFrame =
    adcTopK(spark, root, probes, nprobe, topK, Some(allowed))
      .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("adc_sim"))

  /** Shared ADC stage: (a_id, top: array<struct<score,id>>) — each
    * probe's `topK` candidates by asymmetric cosine over the LIVE
    * (tombstone-filtered) lists. Raw stores reconstruct through the
    * plan-literal LUT alone; residual stores re-add the cell centroid —
    * one broadcast k-row join, the candidate row already carries cid. */
  private def adcTopK(spark: SparkSession, root: String, probes: DataFrame,
                      nprobe: Int, topK: Int,
                      allowed: Option[DataFrame] = None): DataFrame = {
    val cents = spark.read.parquet(s"$root/centroids")
    // (r15 note: a cid-keyed width-pinning repartition was tried here to
    // spread the single-task rerank stage AQE's byte-based coalescing
    // produces at gate SFs; after the probe rotation moved to the native
    // vec_matvec kernel the remaining single-task work is ~10 MFLOP and
    // the extra exchange cost more than it bought on every search query
    // (q132/q133/q134/q137 +0.3 s adjusted) — removed. At scale the cid
    // equi-join re-shuffles the probe side to the derived width anyway.)
    val ranked = graft.queries.EmbeddingQueries.ivfRanked(probes, cents, nprobe)
    val live = allowed.foldLeft(liveCodes(spark, root))((c, a) =>
      c.join(a.select("vec_id").distinct(), Seq("vec_id"), "left_semi"))
    val enc = encoding(spark, root)
    // OPQ: candidates reconstruct in ROTATED space (same LUT decode as
    // raw — "opq" falls into the raw branch below), so the probe side
    // rotates to match: cos(Ra, b̂) = cos(a, Rᵀb̂), and rotating the
    // probe is |probes| plan-literal GEMVs instead of |candidates|
    val probeSide =
      if (enc == "opq") {
        val r = rotationOf(spark, root)
        val rl = typedLit(r.flatten.toIndexedSeq)
        ranked
          .withColumn("a_rot", graft.ml.Opq.rotateColumn(spark, rl, r.length, col("embedding")))
          .select(col("cid"), col("vec_id").as("a_id"),
            col("a_rot").as("a_emb"),
            NativeVecFns.norm(spark, col("a_rot")).as("a_nrm"))
      } else
        ranked.select(col("cid"), col("vec_id").as("a_id"),
          col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val cand = (enc match {
      case "sq8" =>
        // frozen grid as plan literals (2·dim doubles) — no join
        val st = spark.read.parquet(s"$root/sqstats").head()
        val minsLit = typedLit(st.getSeq[Double](0))
        val maxsLit = typedLit(st.getSeq[Double](1))
        live.withColumn("recon", transform(col("codes"), (code, i) => {
            val mn = element_at(minsLit, i + lit(1))
            val mx = element_at(maxsLit, i + lit(1))
            when(mx === mn, mn)
              .otherwise(mn + code.cast("double") * ((mx - mn) / lit(255.0)))
          }))
          .withColumn("rnrm", graft.expr.NativeVecFns.norm(spark, col("recon")))
      case "residual" =>
        val book = spark.read.parquet(s"$root/pqbook")
        val dec = ProductQuantizer.decodeExpr(spark, book, M)
        live
          .join(broadcast(cents.select(col("cid"), col("centroid"))), Seq("cid"))
          .withColumn("recon", zip_with(col("centroid"), dec(col("codes")), (c, r) => c + r))
          .withColumn("rnrm", graft.expr.NativeVecFns.norm(spark, col("recon")))
      case _ =>
        ProductQuantizer.withRecon(spark, live, spark.read.parquet(s"$root/pqbook"), M)
    })
      .select(col("cid"), col("vec_id").as("b_id"), col("recon"), col("rnrm"))
    probeSide
      .join(cand, Seq("cid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("recon")) / (col("a_nrm") * col("rnrm")))
      .groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), topK).as("top"))
  }

  /** IVF-PQ search with an EXACT re-rank refine stage — FAISS's
    * `IndexRefineFlat` / the `R` of IVFADC+R (Jégou et al. 2011 §V):
    * the compressed lists shortlist `kFactor·topK` candidates per probe
    * by asymmetric distance (cheap, 8 B/candidate), then ONLY that
    * shortlist fetches full-precision vectors from `corpus` and reranks
    * by exact cosine. Recall approaches the exact scan's at the cost of
    * |probes|·kFactor·topK full-vector reads instead of |probes|·|cell|
    * — the standard production accuracy/IO dial (FAISS's k_factor
    * default is 4; we take it as the parameter default).
    *
    * 100 TB shape: the shortlist explode is |probes|·R rows (R = a few
    * dozen) — the fetch is one linear equi-join on vec_id against the
    * full-vector corpus, never a cell scan of floats; the final rerank
    * regroups only those R rows per probe.
    *
    * Probe vectors are re-fetched from `corpus` by id for the rerank
    * (TopKAgg's state carries only (score, id)), so every probe id must
    * resolve in `corpus` — true for the self-probe queries; external
    * probes should be unioned into `corpus` first. */
  def searchRefined(spark: SparkSession, root: String, probes: DataFrame,
                    corpus: DataFrame, nprobe: Int, topK: Int,
                    kFactor: Int = 4,
                    allowed: Option[DataFrame] = None): DataFrame = {
    val shortlist = adcTopK(spark, root, probes, nprobe, topK * kFactor, allowed)
      .select(col("a_id"), explode(col("top")).as("t"))
      .select(col("a_id"), col("t.id").as("b_id"))
    val full = corpus.select(col("vec_id"),
      col("embedding"), NativeVecFns.norm(spark, col("embedding")).as("nrm"))
    shortlist
      .join(full.select(col("vec_id").as("b_id"),
        col("embedding").as("b_emb"), col("nrm").as("b_nrm")), Seq("b_id"))
      .join(full.select(col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm")), Seq("a_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), topK).as("top"))
      .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("exact_sim"))
  }
}
