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
}
