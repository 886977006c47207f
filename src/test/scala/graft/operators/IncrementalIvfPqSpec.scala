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
}
