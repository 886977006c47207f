package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reader/ingest consistency for the maintained ANN stores: a search
  * that lists the store WHILE an ingest commits must see each batch
  * entirely or not at all — never a torn subset of a batch's cid
  * partitions. The single-rename commit ([[IncrementalIvfPq
  * .ingestBatch]]: stage a sibling dir, one atomic rename into
  * `codes/ingest_batch=N`) makes this a filesystem guarantee; this spec
  * drives it empirically: an ingest thread streams batches while the
  * main thread hammers reads, and EVERY observed row count must land
  * exactly on a batch-boundary prefix sum (batch sizes are positive, so
  * prefix sums are strictly increasing and a torn read — some of a
  * batch's cid dirs visible, others not — would land strictly between
  * two boundaries).
  *
  * The old dynamic-partition-overwrite commit renamed one staged dir
  * per (batch, cid) pair — a concurrent listing could catch the commit
  * mid-sequence and return some of the batch's cells without the rest.
  */
class ConcurrentIngestSpec extends SparkSpec {

  private lazy val all = graft.core.Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")

  private def clean(p: String) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
  }

  test("concurrent reads during a live ingest stream only ever see batch boundaries") {
    val root = "/tmp/graft_concingest_spec"
    clean(root)
    // seed on vec_id % 8 == 0; batches 1..6 = the residue classes 1..6
    val seed = all.filter(col("vec_id") % 8 === 0)
    IncrementalIvfPq.writeIndex(seed, root, dim = 64, k = 8, iters = 1)
    val n0 = IncrementalIvfPq.codes(spark, root).count()
    val batches = (1 to 6).map { b =>
      val d = all.filter(col("vec_id") % 8 === b)
      (b.toLong, d, d.count())
    }
    assert(batches.map(_._3).forall(_ > 0))
    val boundaries = batches.scanLeft(n0) { case (acc, (_, _, s)) => acc + s }.toSet
    @volatile var ingestError: Option[Throwable] = None
    val started = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      try {
        started.countDown()
        batches.foreach { case (b, d, _) =>
          IncrementalIvfPq.ingestBatch(spark, root, d, batchId = b)
        }
      } catch { case e: Throwable => ingestError = Some(e) }
    })
    t.start()
    started.await()
    val seen = scala.collection.mutable.Set[Long]()
    while (t.isAlive) {
      val c = IncrementalIvfPq.codes(spark, root).count()
      assert(boundaries.contains(c),
        s"torn read: observed $c, legal boundaries ${boundaries.toSeq.sorted}")
      seen += c
    }
    t.join()
    ingestError.foreach(throw _)
    // final state complete, and the reader actually raced the stream
    // (observed at least one intermediate boundary besides start/end)
    val fin = IncrementalIvfPq.codes(spark, root).count()
    assert(fin == boundaries.max)
    assert(seen.nonEmpty, "reader thread must have observed the store mid-stream")
    info(s"observed boundaries while racing: ${seen.toSeq.sorted.mkString(", ")}")
    // no staging residue after a clean run
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val residues = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.contains("__staging"))
    assert(residues.isEmpty, s"staging residue: ${residues.toSeq}")
  }

  test("replay of a committed batch replaces it exactly (single-rename path)") {
    val root = "/tmp/graft_concingest_replay"
    clean(root)
    IncrementalIvfPq.writeIndex(all.filter(col("vec_id") % 4 === 0), root,
      dim = 64, k = 4, iters = 1)
    val d = all.filter(col("vec_id") % 4 === 1)
    IncrementalIvfPq.ingestBatch(spark, root, d, batchId = 1L)
    val once = IncrementalIvfPq.codes(spark, root)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    IncrementalIvfPq.ingestBatch(spark, root, d, batchId = 1L) // at-least-once replay
    val twice = IncrementalIvfPq.codes(spark, root)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(once == twice, "a replayed batch must replace its own partition, not append")
  }

  test("crashed stage (leftover staging sibling) is cleaned by the next attempt and never read") {
    val root = "/tmp/graft_concingest_crash"
    clean(root)
    IncrementalIvfPq.writeIndex(all.filter(col("vec_id") % 4 === 0), root,
      dim = 64, k = 4, iters = 1)
    val before = IncrementalIvfPq.codes(spark, root).count()
    // simulate a crash mid-stage: a staging sibling exists, commit never ran
    val d = all.filter(col("vec_id") % 4 === 2)
    graft.ml.KMeans.assign(d, spark.read.parquet(s"$root/centroids"))
      .select("vec_id", "cid").write.parquet(s"$root/codes__staging_9")
    // readers never see staged data (it is outside codes/)
    assert(IncrementalIvfPq.codes(spark, root).count() == before)
    // the retry overwrites the residue and commits exactly its own rows
    IncrementalIvfPq.ingestBatch(spark, root, d, batchId = 9L)
    assert(IncrementalIvfPq.codes(spark, root).count() == before + d.count())
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/codes__staging_9")))
  }

  /** A read failure is ACCEPTABLE during a maintenance swap only if it is
    * the protocol's LOUD kind — the store transiently missing or its old
    * files deleted — never a silent wrong answer. */
  private def isLoudSwapFailure(e: Throwable): Boolean = {
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    chain(e).exists { t =>
      t.isInstanceOf[java.io.FileNotFoundException] ||
        Option(t.getMessage).exists(m =>
          m.contains("PATH_NOT_FOUND") || m.contains("does not exist") ||
            m.contains("FileNotFound") || m.contains("No such file"))
    }
  }

  test("reader racing compactIndex (delete-aware fold): every successful read is the live set, failures only loud") {
    val root = "/tmp/graft_concingest_foldrace"
    clean(root)
    IncrementalIvfPq.writeIndex(all.filter(col("vec_id") % 8 < 5), root,
      dim = 64, k = 8, iters = 1)
    (5 to 7).foreach { b =>
      IncrementalIvfPq.ingestBatch(spark, root,
        all.filter(col("vec_id") % 8 === b), batchId = b.toLong)
    }
    IncrementalIvfPq.deleteBatch(spark, root,
      all.filter(col("vec_id") % 10 === 4).select("vec_id"), batchId = 8L)
    def liveSet() = IncrementalIvfPq.liveCodes(spark, root)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = liveSet()
    // the fold purges the tombstoned rows and truncates the tombstones —
    // the LIVE view is invariant across all of it, so every successful
    // concurrent read must return exactly `expected`; a TOCTOU between
    // the purge and the truncation (the r12 advice item) would surface
    // here as a resurrection (a superset) or a loss (a subset)
    @volatile var foldError: Option[Throwable] = None
    val started = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      try { started.countDown(); IncrementalIvfPq.compactIndex(spark, root) }
      catch { case e: Throwable => foldError = Some(e) }
    })
    t.start(); started.await()
    var reads = 0; var loudFailures = 0
    while (t.isAlive) {
      try {
        val s = liveSet()
        assert(s == expected,
          s"raced read diverged from the live set: missing=${expected -- s}, extra=${s -- expected}")
        reads += 1
      } catch {
        case e: Throwable =>
          assert(isLoudSwapFailure(e), s"non-loud failure during fold: $e")
          loudFailures += 1
      }
    }
    t.join(); foldError.foreach(throw _)
    assert(reads > 0, "reader must have observed the store during the fold")
    assert(liveSet() == expected)
    info(s"raced reads: $reads consistent, $loudFailures loud mid-swap failures")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/tombstones")),
      "applied tombstones must truncate after the fold")
  }

  test("reader racing a snapshot retrain: every successful search is pre- OR post-state, never a mix") {
    val root = "/tmp/graft_concingest_retrainrace"
    clean(root)
    val vecs = all.filter(col("vec_id") % 4 === 0)
    IncrementalIvf.writeIndex(vecs, root, k = 4, iters = 1)
    def searchSet() = IncrementalIvf.search(spark, root, vecs, nprobe = 1, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pre = searchSet()
    @volatile var retrainError: Option[Throwable] = None
    val started = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      try { started.countDown(); IncrementalIvf.retrain(spark, root, k = 8, iters = 2) }
      catch { case e: Throwable => retrainError = Some(e) }
    })
    t.start(); started.await()
    // collect raced results; classify after the post-state is known
    val observed = scala.collection.mutable.ArrayBuffer[Set[(Long, Long, Int)]]()
    var loudFailures = 0
    while (t.isAlive) {
      try observed += searchSet()
      catch {
        case e: Throwable =>
          assert(isLoudSwapFailure(e), s"non-loud failure during retrain: $e")
          loudFailures += 1
      }
    }
    t.join(); retrainError.foreach(throw _)
    val post = searchSet()
    assert(post != pre, "k=4 -> k=8 retrain must actually change results for this test to bite")
    observed.zipWithIndex.foreach { case (s, i) =>
      assert(s == pre || s == post,
        s"raced search #$i returned a MIXED-quantizer result: " +
          s"not-pre=${(s -- pre).take(3)}, not-post=${(s -- post).take(3)}")
    }
    assert(observed.nonEmpty, "reader must have searched during the retrain")
    info(s"raced searches: ${observed.size} (pre=${observed.count(_ == pre)}, " +
      s"post=${observed.count(_ == post)}), $loudFailures loud mid-swap failures")
  }

  test("the store-root lease blocks every second maintainer, loudly") {
    val root = "/tmp/graft_concingest_lease"
    clean(root)
    IncrementalIvfPq.writeIndex(all.filter(col("vec_id") % 4 === 0), root,
      dim = 64, k = 4, iters = 1)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val lock = Compaction.acquireLease(fs, root) // maintainer A holds the root
    try {
      val e1 = intercept[IllegalArgumentException] {
        IncrementalIvfPq.compactIndex(spark, root)
      }
      assert(e1.getMessage.contains("lease"), s"fold must name the lease: ${e1.getMessage}")
      // IncrementalIvf's retrain contends on the SAME root marker (the
      // lock-granularity contract): it must refuse too
      val e2 = intercept[IllegalArgumentException] {
        IncrementalIvf.retrain(spark, root, k = 4, iters = 1)
      }
      assert(e2.getMessage.contains("lease"), s"retrain must name the lease: ${e2.getMessage}")
    } finally { fs.delete(lock, false); () }
    // released: maintenance proceeds
    IncrementalIvfPq.compactIndex(spark, root)
  }
}
