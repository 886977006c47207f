package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The frozen-quantizer incremental-maintenance contract — the ANN twin
  * of IncrementalDedupSpec. Cross-engine correctness of the same store
  * is driver-proven by q94's DuckDB oracle (seed-trained k-means
  * replayed as CTEs). */
class IncrementalIvfSpec extends SparkSpec {

  private def tmpRoot(tag: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_incivf_spec_$tag"

  private def vecs = graft.core.Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")

  test("maintained index over two ingests ≡ from-scratch assignment with the frozen quantizer") {
    val all = vecs
    val root = tmpRoot("equiv")
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    IncrementalIvf.writeIndex(all.filter(col("vec_id") % 10 < 8), root, k = 8, iters = 2)
    IncrementalIvf.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 8), batchId = 1L)
    IncrementalIvf.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 9), batchId = 2L)
    def cellOf(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val maintained = cellOf(IncrementalIvf.index(spark, root))
    // rebuild: assign the WHOLE corpus against the same frozen quantizer
    val rebuilt = cellOf(graft.queries.EmbeddingQueries
      .ivfRanked(all, IncrementalIvf.centroids(spark, root), nprobe = 1))
    assert(maintained == rebuilt,
      "index(state ∪ d1 ∪ d2) must equal the from-scratch assignment")
    // ...and the search results over the maintained index equal a search
    // whose build side is the rebuilt assignment (the q94 oracle's shape)
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val viaStore = res(IncrementalIvf.search(spark, root, all, nprobe = 2, topK = 3))
    assert(viaStore.nonEmpty)
    // replay of batch 2 (at-least-once) must not change anything
    val before = IncrementalIvf.index(spark, root).count()
    IncrementalIvf.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 9), batchId = 2L)
    assert(IncrementalIvf.index(spark, root).count() == before)
    assert(cellOf(IncrementalIvf.index(spark, root)) == rebuilt)
    assert(res(IncrementalIvf.search(spark, root, all, nprobe = 2, topK = 3)) == viaStore)
  }

  test("search stays cell-keyed: no cartesian against the index, centroids broadcast") {
    val all = vecs
    val root = tmpRoot("plan")
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    IncrementalIvf.writeIndex(all, root, k = 8, iters = 1)
    val out = IncrementalIvf.search(spark, root, all, nprobe = 2, topK = 3)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"probe×index must be a cid equi-join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the k-row centroid frame must broadcast")
  }

  test("drift signal: ≈1 in-distribution, past threshold on a shifted delta; retrain resets it and ≡ fresh training") {
    val all = vecs
    val root = tmpRoot("drift")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val seed = all.filter(col("vec_id") % 10 < 8)
    IncrementalIvf.writeIndex(seed, root, k = 8, iters = 2)
    // in-distribution delta: same generator family → drift ≈ 1, below the trigger
    val inDist = all.filter(col("vec_id") % 10 === 8)
    val dIn = IncrementalIvf.assignmentDrift(spark, root, inDist)
    assert(dIn < IncrementalIvf.DriftRetrainThreshold,
      s"in-distribution delta must not trigger a retrain: drift=$dIn")
    // deliberately drifted delta: constant shift on every dimension moves
    // the batch off every trained cell
    val shifted = all.filter(col("vec_id") % 10 === 9)
      .withColumn("embedding",
        transform(col("embedding"), x => (x + lit(3.0f)).cast("float")))
    val dShift = IncrementalIvf.assignmentDrift(spark, root, shifted)
    assert(dShift > IncrementalIvf.DriftRetrainThreshold,
      s"shifted delta must trip the retrain trigger: drift=$dShift")
    // ingest both, then snapshot-retrain on state ∪ deltas
    IncrementalIvf.ingestBatch(spark, root, inDist, batchId = 1L)
    IncrementalIvf.ingestBatch(spark, root, shifted, batchId = 2L)
    IncrementalIvf.retrain(spark, root, k = 8, iters = 2)
    // the retrained quantizer describes the shifted family again
    val dAfter = IncrementalIvf.assignmentDrift(spark, root, shifted)
    assert(dAfter < IncrementalIvf.DriftRetrainThreshold,
      s"retrain must reset the drift signal: drift=$dAfter")
    // retrain ≡ training fresh on the same corpus: same cells, same search
    val freshRoot = tmpRoot("drift_fresh")
    fs.delete(new org.apache.hadoop.fs.Path(freshRoot), true)
    val corpus = seed.unionByName(inDist).unionByName(shifted)
    IncrementalIvf.writeIndex(corpus, freshRoot, k = 8, iters = 2)
    def cellOf(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cellOf(IncrementalIvf.index(spark, root))
      == cellOf(IncrementalIvf.index(spark, freshRoot)))
    def res(r: String) = IncrementalIvf.search(spark, r, corpus, nprobe = 2, topK = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3))).toSet
    assert(res(root) == res(freshRoot),
      "search over the retrained store must equal search over a fresh-trained store")
    // the rebuild is also a compaction: everything sits in the base partition
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/index"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("ingest_batch=-1"), s"retrain must fold batch partitions: $dirs")
  }

  test("retrain crash mid-swap is fail-stop and recoverable — never a mixed store") {
    val root = tmpRoot("crashswap")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    IncrementalIvf.writeIndex(vecs, root, k = 8, iters = 2)
    val before = IncrementalIvf.index(spark, root)
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // simulate a crash between retrain's two renames: live root missing,
    // pre-retrain store parked
    fs.rename(new org.apache.hadoop.fs.Path(root),
      new org.apache.hadoop.fs.Path(root + "__retrain_old"))
    intercept[Exception](IncrementalIvf.index(spark, root).count()) // loud, not mixed
    IncrementalIvf.recoverSwap(spark, root)
    val after = IncrementalIvf.index(spark, root)
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(after == before, "recovery must restore the intact pre-retrain store")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root + "__retrain_old")))
    // and a subsequent retrain completes normally on the recovered store
    IncrementalIvf.retrain(spark, root, k = 8, iters = 2)
    assert(IncrementalIvf.index(spark, root).count() == before.size)
  }

  test("kFor sizes cells to the corpus (√N, clamped)") {
    assert(IncrementalIvf.kFor(100) == 10)
    assert(IncrementalIvf.kFor(1000000) == 1000)
    assert(IncrementalIvf.kFor(1) == 4, "clamped to minK")
    assert(IncrementalIvf.kFor(0) == 4, "empty corpus clamps, not crashes")
    assert(IncrementalIvf.kFor(Long.MaxValue) == (1 << 18), "clamped to maxK")
    // the scale point of the rule: cells stay ≈√N-sized, so probe cost
    // (nprobe·N/k) grows with √N, not N
    val n = 1000000000L
    val k = IncrementalIvf.kFor(n)
    assert(n / k < 2L * math.sqrt(n.toDouble).toLong)
  }

  test("compactIndex mid-ingest: reads and search unchanged, batch partitions folded") {
    val all = vecs
    val root = tmpRoot("compact")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    IncrementalIvf.writeIndex(all.filter(col("vec_id") % 10 < 8), root, k = 8, iters = 2)
    IncrementalIvf.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 8), batchId = 1L)
    def cellOf() = IncrementalIvf.index(spark, root)
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def res() = IncrementalIvf.search(spark, root, all, nprobe = 2, topK = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3))).toSet
    val (cellsBefore, resBefore) = (cellOf(), res())
    val filesBefore = Compaction.treeDataFileCount(spark, s"$root/index")
    IncrementalIvf.compactIndex(spark, root)
    assert(cellOf() == cellsBefore, "fold must not change the maintained index")
    assert(res() == resBefore, "fold must not change search results")
    assert(Compaction.treeDataFileCount(spark, s"$root/index") <= filesBefore)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/index"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("ingest_batch=-1"), s"batch partitions must fold: $dirs")
    // ingest continues on the compacted index
    IncrementalIvf.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 9), batchId = 2L)
    val rebuilt = graft.queries.EmbeddingQueries
      .ivfRanked(all, IncrementalIvf.centroids(spark, root), nprobe = 1)
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cellOf() == rebuilt)
  }

  test("ingest writes only its own batch partitions; the seed index is never rewritten") {
    val all = vecs
    val root = tmpRoot("delta")
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    IncrementalIvf.writeIndex(all.filter(col("vec_id") % 10 =!= 7), root, k = 8, iters = 2)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def seedFiles = fs.listFiles(
        new org.apache.hadoop.fs.Path(s"$root/index/ingest_batch=-1"), true)
    val seedTimes = {
      val it = seedFiles
      val b = scala.collection.mutable.Map[String, Long]()
      while (it.hasNext) { val f = it.next(); b(f.getPath.toString) = f.getModificationTime }
      b.toMap
    }
    IncrementalIvf.ingestBatch(spark, root, all.filter(col("vec_id") % 10 === 7), batchId = 1L)
    val after = {
      val it = seedFiles
      val b = scala.collection.mutable.Map[String, Long]()
      while (it.hasNext) { val f = it.next(); b(f.getPath.toString) = f.getModificationTime }
      b.toMap
    }
    assert(after == seedTimes, "delta ingest must not touch the seed partitions")
  }
}
