package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.{NativeVecFns, TopKAgg}

/** Incremental IVF (inverted-file) ANN index maintenance — the embedding
  * twin of [[IncrementalDedup]]'s maintained edge store: ingest delta
  * vectors into a TRAINED index without retraining the quantizer.
  *
  * Store layout (two parquet tables under one root):
  *  - `centroids/` — the frozen coarse quantizer (cid, centroid), k rows,
  *    trained ONCE on the seed corpus by [[graft.ml.KMeans.fit]]. Broadcast
  *    at every use; never grows.
  *  - `index/` — the inverted lists (vec_id, embedding, nrm, cid),
  *    PARTITIONED BY (ingest_batch, cid): the outer level makes batch
  *    replays idempotent (dynamic partition overwrite keyed by batch id,
  *    the [[IncrementalDedup.ingestBatch]] recipe), the inner level means
  *    a cell-targeted read touches only its cells' files.
  *
  * The invariant that makes incremental maintenance EXACT (not an
  * approximation): with the quantizer frozen, a vector's cell assignment
  * is a pure function of (vector, centroids) — existing index rows can
  * never move cells when a delta arrives, so
  * `index(state ∪ delta) ≡ assign(state ∪ delta, centroids)` — precisely
  * the from-scratch rebuild against the same quantizer
  * (spec-proven in IncrementalIvfSpec; q94 hash-proves search results
  * against a DuckDB oracle that replays training + assignment). This is
  * how production IVF deployments run at 100 TB: the quantizer retrains
  * per corpus snapshot, while vectors stream into cells continuously.
  */
object IncrementalIvf {

  /** Corpus-derived cell count — the `lshBitsFor` pattern for IVF: the
    * classic √N rule (k = √N cells of ≈√N vectors each balances the
    * probe term (nprobe · k distance evals) against the scan term
    * (nprobe · N/k candidates), minimizing their sum at fixed nprobe).
    * A FIXED k is the silent scale bug this replaces: k=32 over 10⁹
    * vectors means 3·10⁷-row cells — every probe rescans 3% of the
    * corpus. Clamped to [minK, maxK]; oracle queries pin their k
    * explicitly, so deriving it here changes no gated result. */
  def kFor(corpusCount: Long, minK: Int = 4, maxK: Int = 1 << 18): Int = {
    require(minK >= 1 && minK <= maxK, "1 <= minK <= maxK")
    val k = math.ceil(math.sqrt(math.max(1L, corpusCount).toDouble)).toInt
    math.min(maxK, math.max(minK, k))
  }

  /** Seed the store: train the coarse quantizer on the state corpus
    * (deterministic k-means init — the k lowest-id vectors), freeze it
    * under `root/centroids`, write the state's inverted lists under
    * `ingest_batch=-1`, and snapshot the per-cell assignment-distance
    * baseline under `root/stats` (the drift reference —
    * [[assignmentDrift]]). The index write inherits the assignment's
    * full parallelism — no single-task funnel (the edge-store lesson).
    * DEFAULT PATH = the derived cell count (r11 flip): `k <= 0` (the
    * default) sizes cells via [[kFor]]'s √N rule — the configuration a
    * deployment should run; gate queries (q94) pin k explicitly for
    * byte-stable oracles. */
  def writeIndex(state: DataFrame, root: String,
                 k: Int = -1, iters: Int = 2): Unit = {
    val kk = if (k > 0) k else kFor(state.count())
    val (cents, _) = graft.ml.KMeans.fit(state, kk, iters)
    // k rows by construction — the one legitimately tiny table here
    cents.coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    assignTo(state, cents).withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch", "cid")
      .parquet(s"$root/index")
    cents.unpersist()
    writeStats(state.sparkSession, root)
  }

  /** Snapshot the per-cell mean assignment distance of the CURRENT index
    * into `root/stats` (cid, mean_dist, n) — one extra index scan at
    * build time (cheaper than persisting the corpus-sized assignment
    * through the index write), k rows out. */
  private def writeStats(spark: SparkSession, root: String): Unit = {
    val cents = centroids(spark, root)
    index(spark, root).join(broadcast(cents), Seq("cid"))
      .withColumn("adist",
        sqrt(NativeVecFns.l2DistSq(spark, col("embedding"), col("centroid"))))
      .groupBy("cid")
      .agg(avg("adist").as("mean_dist"), count(lit(1)).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/stats")
    ()
  }

  /** The frozen quantizer (cid, centroid). */
  def centroids(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/centroids")

  /** Nearest-cell assignment against a quantizer frame — delegates to
    * the same ranked-probe kernel q89 searches with
    * ([[graft.queries.EmbeddingQueries.ivfRanked]], rn = 1), so the
    * store's assignment tiebreak (dist asc, cid asc) cannot diverge from
    * the search path's. */
  private def assignTo(vecs: DataFrame, cents: DataFrame): DataFrame =
    graft.queries.EmbeddingQueries.ivfRanked(vecs, cents, nprobe = 1)
      .select("vec_id", "embedding", "nrm", "cid")

  /** Ingest one delta batch IDEMPOTENTLY and WITHOUT retraining: assign
    * the delta to the frozen quantizer's cells and replace exactly this
    * batch's partition — an at-least-once replay replaces its own rows
    * instead of appending a second copy. Cost per ingest: O(|delta| · k)
    * distance evaluations + a delta-sized write; the existing index is
    * never read, shuffled, or rewritten.
    *
    * Commits by [[IncrementalIvfPq.ingestBatch]]'s single-rename
    * protocol (stage `index__staging_N` partitioned by cid, one atomic
    * rename into `index/ingest_batch=N`): concurrent readers see the
    * batch entirely or not at all — never a torn subset of its cid
    * directories. Same replay/crash windows as documented there. */
  def ingestBatch(spark: SparkSession, root: String, delta: DataFrame,
                  batchId: Long): Unit =
    Compaction.commitBatch(spark, s"$root/index",
      assignTo(delta, centroids(spark, root)),
      "ingest_batch", batchId, innerPartCols = Seq("cid"))

  /** The maintained inverted index: every ingested vector with its cell. */
  def index(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/index").select("vec_id", "embedding", "nrm", "cid")

  /** Retrain trigger threshold for [[assignmentDrift]]: 1.0 means the
    * delta sits exactly where the seed corpus sat relative to its
    * centroids; sustained values past this bound mean the frozen
    * quantizer's cells no longer describe the incoming distribution
    * (recall decays silently — candidates concentrate in few cells). The
    * 1.5 default is deliberately conservative: in-distribution ingest
    * noise measured ≈1.0±0.1 on the test corpus (IncrementalIvfSpec),
    * while a mean-shifted delta measures ≥2×. */
  val DriftRetrainThreshold = 1.5

  /** MEASURED drift signal for the frozen quantizer: the delta's mean
    * assignment distance, normalized per cell by the SEED's mean
    * assignment distance in that cell (`root/stats`, written at
    * [[writeIndex]]/[[retrain]] time) — ≈1.0 for in-distribution deltas,
    * growing as the ingest distribution leaves the trained cells. Cells
    * the seed never populated (or with zero mean — single-point cells)
    * normalize by the seed's global mean instead. Cost: O(|delta| · k)
    * distance evals + two k-row broadcasts — same order as the ingest
    * assignment itself. Compare against [[DriftRetrainThreshold]] and
    * call [[retrain]] at the next snapshot point when exceeded. */
  def assignmentDrift(spark: SparkSession, root: String, delta: DataFrame): Double = {
    val cents = centroids(spark, root)
    val stats = spark.read.parquet(s"$root/stats")
    val g = stats.select(
      (sum(col("mean_dist") * col("n")) / sum(col("n"))).as("gm")).first()
    val globalMean = if (g.isNullAt(0)) 0.0 else g.getDouble(0)
    if (globalMean <= 0.0) return 1.0 // degenerate seed (all vectors identical)
    val r = assignTo(delta, cents)
      .join(broadcast(cents), Seq("cid"))
      .withColumn("adist",
        sqrt(NativeVecFns.l2DistSq(spark, col("embedding"), col("centroid"))))
      .join(broadcast(stats.select(col("cid"), col("mean_dist"))), Seq("cid"), "left_outer")
      .select(avg(col("adist") /
        when(col("mean_dist") > 0.0, col("mean_dist")).otherwise(lit(globalMean)))
        .as("drift")).first()
    if (r.isNullAt(0)) 1.0 else r.getDouble(0)
  }

  /** Snapshot retrain — the documented answer to the frozen-quantizer
    * caveat: retrain the quantizer on the FULL maintained corpus
    * (state ∪ every ingested delta), rebuild the inverted lists against
    * the fresh centroids, and reset the drift baseline. Staged under the
    * SIBLING `root__retrain` and swapped in as ONE unit by a fail-stop
    * two-rename protocol (`root` → `root__retrain_old`, staged → `root`):
    * a crash mid-swap leaves `root` MISSING — every read fails loudly,
    * and the next [[retrain]]/[[recoverSwap]] restores the intact old
    * store — never a MIXED store (the per-subdir swap this replaces
    * could crash with new centroids over the old index: cid spaces from
    * two different quantizers silently joined into plausible-looking
    * wrong neighbors). The rebuild lands everything under
    * `ingest_batch=-1`, so a retrain is also a full compaction of the
    * batch partitions. Pass `k <= 0` to derive k from the corpus size
    * via [[kFor]] (one count pass — training-time cost). */
  def retrain(spark: SparkSession, root: String, k: Int = -1, iters: Int = 2): Unit = {
    val fsRoot = new org.apache.hadoop.fs.Path(root)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // single-maintainer lease (Compaction.acquireLease contract): a second
    // concurrent retrain's recovery branch could delete the parked
    // __retrain_old copy while this one is between its two renames
    val lock = Compaction.acquireLease(fs, root)
    try {
      recoverSwap(spark, root)
      val vecs = index(spark, root).select("vec_id", "embedding")
      val kk = if (k > 0) k else kFor(vecs.count())
      val tmp = s"${root}__retrain"
      writeIndex(vecs, tmp, kk, iters) // actions complete before any rename
      val old = new org.apache.hadoop.fs.Path(s"${root}__retrain_old")
      // rename failures surface as a FALSE return on Hadoop filesystems —
      // unchecked, a failed park followed by rename(tmp, root) onto the
      // still-live root would NEST the retrained store inside the old one
      // (the mixed-quantizer state the protocol forbids); fail loud instead
      require(fs.rename(fsRoot, old), s"retrain swap rename $fsRoot -> $old failed")
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), fsRoot),
        s"retrain swap rename $tmp -> $fsRoot failed")
      fs.delete(old, true)
      ()
    } finally { fs.delete(lock, false); () }
  }

  /** Restore a store whose last [[retrain]] crashed between its two
    * renames (live root missing, pre-retrain copy parked at
    * `root__retrain_old`); clears leftover staging/parked dirs
    * otherwise. Safe to call any time — a no-op on a healthy store. */
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

  /** Index maintenance: fold every `ingest_batch=N` partition into the
    * base partition, keeping `cid` as the inner level (cell-targeted
    * reads stay file-pruned). Same safe-point contract as
    * [[IncrementalDedup.compactStore]]. The lease is taken on the STORE
    * ROOT (not `root/index`) so the fold and [[retrain]] — which renames
    * the whole root — contend on the same marker; a retrain can never
    * rename the store away mid-fold. */
  def compactIndex(spark: SparkSession, root: String,
                   targetBytes: Long = 128L << 20): Unit =
    Compaction.foldIngestBatches(spark, s"$root/index",
      innerPartCols = Seq("cid"), rangeCols = Nil, targetBytes = targetBytes,
      lockDir = Some(root))

  /** IVF top-k cosine search over the maintained index with the frozen
    * quantizer: each probe ranks its `nprobe` nearest cells (broadcast
    * k-row centroid frame), candidates come from a cid equi-join against
    * the inverted lists (cost |index| · nprobe / k — never
    * probes × index), exact-cosine rerank keeps `topK` per probe via the
    * bounded-state [[TopKAgg]]. Output shape = q89's
    * (vec_id, neighbor_id, rank, cosine_sim). */
  def search(spark: SparkSession, root: String, probes: DataFrame,
             nprobe: Int, topK: Int): DataFrame = {
    val ranked = graft.queries.EmbeddingQueries
      .ivfRanked(probes, centroids(spark, root), nprobe)
    val build = index(spark, root).select(col("cid"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    ranked.select(col("cid"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      .join(build, Seq("cid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), topK).as("top"))
      .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("cosine_sim"))
  }
}
