package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r14: the opt-in in-stream maintenance policy ([[MaintenancePolicy]]).
  * The contract under test: a 10-batch stream with the policy ON ends
  * with FOLDED stores and results hash-identical to the policy-off twin
  * — i.e. bounded in-stream compaction is invisible to every reader while
  * keeping the partition count from growing one-per-micro-batch forever.
  * The safe-point subtlety (fold must never swallow the not-yet-committed
  * in-flight batch) is covered by the bound assertions: the partition
  * set after the run contains only the base, the fold-trigger batch, and
  * later ones. */
class MaintenancePolicySpec extends SparkSpec {

  private def tmpRoot(tag: String) = s"/tmp/graft_policy_spec_$tag"
  private def clean(ps: String*) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    ps.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }

  private def batchDirs(table: String): Set[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(table)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("ingest_batch=")).toSet
  }

  test("dedupeStreamWithEdges under a compact-every-3 policy: folded store, results identical to the policy-off twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (1L to 20L).map(i =>
      (i, if (i % 2 == 0) "the quick brown fox jumps over the lazy dog again and again"
          else s"unique document number $i about distributed engines and parquet stores"))
    def run(tag: String, policy: MaintenancePolicy): (Set[(Long, Long)], Set[String]) = {
      val root = tmpRoot(s"dedup_$tag"); val pairs = tmpRoot(s"pairs_$tag")
      val ckpt = tmpRoot(s"ckpt_$tag")
      clean(root, pairs, ckpt)
      IncrementalDedup.writeEdgeStore(spark, Seq((0L, docs.head._2)).toDF("doc_id", "text"), root)
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = IncrementalDedup.dedupeStreamWithEdges(
        in.toDF().toDF("doc_id", "text"), root, pairs, ckpt, policy = policy)
      try {
        docs.grouped(2).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val edges = IncrementalDedup.edges(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (edges, batchDirs(s"$root/bands"))
    }
    val (edgesOff, dirsOff) = run("off", MaintenancePolicy.Off)
    val (edgesOn, dirsOn) = run("on", MaintenancePolicy(compactEveryBatches = 3))
    assert(edgesOn == edgesOff,
      "in-stream compaction must be invisible to the maintained edge table")
    assert(edgesOn.nonEmpty, "premise: the duplicate docs must produce edges")
    // 10 micro-batches (ids 0..9): policy-off leaves one partition per
    // batch (+ base); the policy's last fold fired inside batch 8 with
    // bound 8, so only the base, batch 8, and batch 9 may remain
    assert(dirsOff.size >= 10, s"premise: policy-off must accumulate partitions: $dirsOff")
    assert(dirsOn.subsetOf(Set("ingest_batch=-1", "ingest_batch=8", "ingest_batch=9")),
      s"policy must fold every committed batch below the bound: $dirsOn")
  }

  test("ingestStream under compact+drift policy: folded codes, liveCodes identical, drift hook fires in-distribution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    val seed = all.filter(col("vec_id") % 10 =!= 7)
    val delta = all.filter(col("vec_id") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    def run(tag: String, policy: MaintenancePolicy): (Set[(Long, Int, Seq[Int])], Set[String]) = {
      val root = tmpRoot(s"ivf_$tag"); val ckpt = tmpRoot(s"ivfckpt_$tag")
      clean(root, ckpt)
      IncrementalIvfPq.writeIndex(seed, root, dim = 64, k = 8, iters = 2, residual = true)
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
      val q = IncrementalIvfPq.ingestStream(
        in.toDF().toDF("vec_id", "embedding"), root, ckpt, policy = policy)
      try {
        delta.grouped(math.max(1, delta.length / 10)).foreach { b =>
          in.addData(b: _*); q.processAllAvailable()
        }
      } finally q.stop()
      val live = IncrementalIvfPq.liveCodes(spark, root)
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getSeq[Int](2))).toSet
      (live, batchDirs(s"$root/codes"))
    }
    val (liveOff, dirsOff) = run("off", MaintenancePolicy.Off)
    val drifts = scala.collection.mutable.ListBuffer.empty[(Long, Double)]
    val (liveOn, dirsOn) = run("on", MaintenancePolicy(
      compactEveryBatches = 4, driftCheckEveryBatches = 2,
      onDrift = (b, d) => { drifts += ((b, d)); () }))
    assert(liveOn == liveOff,
      "in-stream compaction must be invisible to the live code view")
    assert(dirsOn.size < dirsOff.size,
      s"policy must shrink the partition count: on=$dirsOn off=$dirsOff")
    assert(drifts.nonEmpty, "the drift hook must fire at its cadence")
    assert(drifts.forall(_._2 < IncrementalIvf.DriftRetrainThreshold),
      s"in-distribution stream must not trip the trigger: $drifts")
  }
}
