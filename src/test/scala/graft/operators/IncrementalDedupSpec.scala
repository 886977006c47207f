package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental-vs-recompute contract and the plan shapes that make
  * incremental ingests cheap at 100 TB. Cross-engine correctness of the
  * same pipeline is driver-proven by q69's DuckDB oracle. */
class IncrementalDedupSpec extends SparkSpec {

  private def tmpRoot(tag: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_incdedup_spec_$tag"

  test("incremental pairs ≡ full q30 recompute restricted to delta-involving pairs") {
    val all = graft.core.Tables.documents(spark, sfDir)
    val state = all.filter(col("doc_id") % 10 =!= 7)
    val delta = all.filter(col("doc_id") % 10 === 7)
    val root = tmpRoot("equiv")
    IncrementalDedup.writeStore(spark, state, root)
    val inc = IncrementalDedup.dedupeDelta(spark, root, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val full = graft.queries.TextQueries.q30MinHashLsh(spark, sfDir)
      .filter(col("doc_a") % 10 === 7 || col("doc_b") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(inc == full, s"incremental diverged: only-inc=${inc -- full}, only-full=${full -- inc}")
  }

  test("store scan is dynamically partition-pruned by the delta's band buckets") {
    val all = graft.core.Tables.documents(spark, sfDir)
    val state = all.filter(col("doc_id") % 10 =!= 7)
    // a deliberately tiny delta: it cannot touch every band bucket, so
    // pruning must be visible in the plan
    val delta = all.filter(col("doc_id") % 100 === 7)
    val root = tmpRoot("dpp")
    IncrementalDedup.writeStore(spark, state, root)
    val df = IncrementalDedup.dedupeDelta(spark, root, delta)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"store scan must carry a dynamic partition pruning filter:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the state side must never be exchanged: the delta broadcasts
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, "delta bands must broadcast against the store")
  }

  test("ingesting the delta's rows into the store makes the next delta see them") {
    // two-step ingest: store(state) + delta1, then store(state ∪ delta1)
    // + delta2 — a pair (delta1, delta2) must surface in step 2
    val all = graft.core.Tables.documents(spark, sfDir)
    val state = all.filter(col("doc_id") % 10 < 6)
    val d1 = all.filter(col("doc_id") % 10 === 6)
    val d2 = all.filter(col("doc_id") % 10 > 6)
    val root = tmpRoot("twostep")
    IncrementalDedup.writeStore(spark, state.unionByName(d1), root)
    val step2 = IncrementalDedup.dedupeDelta(spark, root, d2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = graft.queries.TextQueries.q30MinHashLsh(spark, sfDir)
      .filter(col("doc_a") % 10 > 6 || col("doc_b") % 10 > 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(step2 == expect)
  }
}
