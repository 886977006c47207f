package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r15: the drift→retrain safe-point orchestration
  * ([[IncrementalIvfPq.retrainAtSafePoint]]) — the r14 verdict's last
  * manual lifecycle step. Contract under test: a live file-source ingest
  * stream that is stopped, retrained at the safe point, and restarted on
  * the SAME checkpoint ends with a store hash-identical to the
  * stop-retrain-rebuild twin, replaying nothing twice — including when
  * the stop "crashed" mid-batch (store write landed, offset commit
  * didn't), the window where a naive retrain would fold the uncommitted
  * partition into the base and the replay would land its rows again. */
class SafePointRetrainSpec extends SparkSpec {

  private def tmpRoot(tag: String) = s"/tmp/graft_safepoint_spec_$tag"
  private val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
  private def clean(ps: String*) =
    ps.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))

  private lazy val all = graft.core.Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")
  private lazy val seed = all.filter(col("vec_id") % 10 < 6)
  private lazy val b0 = all.filter(col("vec_id") % 10 === 6)
  private lazy val b1 = all.filter(col("vec_id") % 10 === 7)
  private lazy val b2 = all.filter(col("vec_id") % 10 > 7)

  private def codeSet(root: String) = IncrementalIvfPq.liveCodes(spark, root)
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet

  private def searchSet(root: String) =
    IncrementalIvfPq.search(spark, root, all, nprobe = 2, topK = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3))).toSet

  private def batchDirs(root: String): Set[String] =
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/codes"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("ingest_batch=")).toSet

  /** The twin every orchestrated run must equal: quantizers retrained
    * from scratch on exactly the committed corpus (seed ∪ b0 ∪ b1),
    * then b2 ingested as batch 2 against the frozen result. */
  private def buildTwin(root: String): Unit = {
    clean(root)
    IncrementalIvfPq.writeIndex(seed.unionByName(b0).unionByName(b1), root,
      dim = 64, k = 8, iters = 2, residual = true)
    IncrementalIvfPq.ingestBatch(spark, root, b2, batchId = 2L)
  }

  private def stream(root: String, srcDir: String, ckpt: String) =
    IncrementalIvfPq.ingestStream(
      spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>").parquet(srcDir),
      root, ckpt)

  test("graceful safe point: stop → retrainAtSafePoint → restart ≡ stop-retrain-rebuild twin; uncommitted raw rows stay out") {
    val root = tmpRoot("graceful"); val ckpt = tmpRoot("graceful_ckpt")
    val srcDir = tmpRoot("graceful_src"); val twin = tmpRoot("graceful_twin")
    clean(root, ckpt, srcDir)
    IncrementalIvfPq.writeIndex(seed, root, dim = 64, k = 8, iters = 2, residual = true)
    // one delivery per processAllAvailable boundary — files staged
    // together land in ONE micro-batch, which would shift every batch id
    b0.write.mode("append").parquet(srcDir)
    val q1 = stream(root, srcDir, ckpt)
    try {
      q1.processAllAvailable()
      b1.write.mode("append").parquet(srcDir)
      q1.processAllAvailable()
    } finally q1.stop()
    // safe point: batches 0 and 1 committed. rawCorpus deliberately
    // includes b2 (the upstream system of record already holds rows the
    // stream has not delivered) — the membership semi-join must keep
    // them OUT of the rebuild, or the later stream delivery would land
    // them twice.
    val pruned = IncrementalIvfPq.retrainAtSafePoint(
      spark, root, ckpt, rawCorpus = all, dim = 64, k = 8)
    assert(pruned.isEmpty, s"graceful stop has no uncommitted partition to prune: $pruned")
    assert(batchDirs(root) == Set("ingest_batch=-1"),
      s"retrain folds the committed batches into the base: ${batchDirs(root)}")
    b2.write.mode("append").parquet(srcDir)
    val q2 = stream(root, srcDir, ckpt) // restart on the SAME checkpoint
    try q2.processAllAvailable() finally q2.stop()
    buildTwin(twin)
    assert(batchDirs(root) == Set("ingest_batch=-1", "ingest_batch=2"),
      s"resumed stream continues at batch 2, replaying nothing: ${batchDirs(root)}")
    assert(codeSet(root) == codeSet(twin),
      "resumed store must encode exactly like the stop-retrain-rebuild twin")
    assert(searchSet(root) == searchSet(twin),
      "search over the resumed store must equal the twin's")
  }

  test("crashed mid-batch: uncommitted store partition is pruned, replayed against the NEW quantizers, no double-landing") {
    val root = tmpRoot("crash"); val ckpt = tmpRoot("crash_ckpt")
    val srcDir = tmpRoot("crash_src"); val twin = tmpRoot("crash_twin")
    clean(root, ckpt, srcDir)
    IncrementalIvfPq.writeIndex(seed, root, dim = 64, k = 8, iters = 2, residual = true)
    b0.write.mode("append").parquet(srcDir)
    val q1 = stream(root, srcDir, ckpt)
    try {
      q1.processAllAvailable()
      b1.write.mode("append").parquet(srcDir)
      q1.processAllAvailable()
    } finally q1.stop()
    // simulate the crash window for batch 2: the foreachBatch body ran
    // (store write landed, with the id the stream will assign) but the
    // offset never committed — on restart the source re-delivers b2.
    b2.write.mode("append").parquet(srcDir)
    IncrementalIvfPq.ingestBatch(spark, root, b2, batchId = 2L)
    assert(IncrementalIvfPq.lastCommittedBatch(spark, ckpt) == 1L,
      "premise: the checkpoint knows only batches 0 and 1")
    val pruned = IncrementalIvfPq.retrainAtSafePoint(
      spark, root, ckpt, rawCorpus = all, dim = 64, k = 8)
    assert(pruned == Seq(2L), s"the uncommitted partition must be pruned: $pruned")
    assert(batchDirs(root) == Set("ingest_batch=-1"),
      s"after prune+retrain only the base remains: ${batchDirs(root)}")
    val q2 = stream(root, srcDir, ckpt) // restart: b2 replays as batch 2
    try q2.processAllAvailable() finally q2.stop()
    buildTwin(twin)
    assert(batchDirs(root) == Set("ingest_batch=-1", "ingest_batch=2"),
      s"replay rebuilds exactly its own partition: ${batchDirs(root)}")
    assert(codeSet(root) == codeSet(twin),
      "store after crash-replay-retrain must equal the twin (rows land once, " +
        "encoded by the retrained quantizers)")
    assert(searchSet(root) == searchSet(twin),
      "search must be blind to the crash/replay history")
  }
}
