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
