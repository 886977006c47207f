package graft.ml

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the final stage of a
  * near-dup dedup pipeline: candidate pairs (MinHash/LSH or SimHash)
  * form a graph whose components are duplicate clusters; every document
  * keeps the component's minimum doc id as its canonical id.
  *
  * Each iteration: push every vertex's current label across all edges
  * (both directions) and keep the minimum seen. The fixpoint (no label
  * changed) is the unique per-component minimum, independent of
  * iteration order — deterministic, so an exact oracle exists (the
  * transitive-closure recursive CTE in DuckDB).
  *
  * Scale: one join + one groupBy per iteration, both keyed on vertex id;
  * iterations bound by the graph diameter (near-dup graphs are shallow —
  * clusters of copies, not long chains). For pathological diameters,
  * switch to the large-star/small-star algorithm; the per-iteration
  * plan here is the same shape.
  */
object ConnectedComponents {

  /** @param vertices one column `id` (must cover every edge endpoint)
    * @param edges    columns `src`, `dst` (undirected; duplicates fine)
    * @return (id, component) where component = min id reachable
    *
    * Only EDGE-TOUCHED vertices enter the iteration — isolated vertices
    * are trivially their own component and ride along as a static union
    * branch. In a near-dup graph the touched set is a small fraction of
    * the corpus, so per-iteration shuffle volume tracks the edge set,
    * not the corpus size (the fixed cost — one anti-join — is paid
    * once, vs a corpus-wide groupBy every iteration). */
  def components(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val bi = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    val endpoints = bi.select(col("src").as("id")).distinct()
    // materialized NOW: it is consumed after bi.unpersist(), and lazily it
    // would re-run the whole (possibly expensive) edge-producing pipeline
    val untouched = vertices.join(endpoints, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    // localCheckpoint (not cache): iterative plans grow exponentially in
    // lineage depth — truncating per iteration keeps the logical plan
    // O(1) regardless of iteration count
    val idType = vertices.schema("id").dataType
    // seed = the endpoint set itself (requires edges ⊆ vertices, true of
    // every near-dup caller — avoids a vertices⋉endpoints semi-join)
    var labels = endpoints.select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor minimum, merged with own label. The previous label rides
      // along as `own` so convergence falls out of the SAME shuffle, and
      // the changed-count is observed DURING the eager checkpoint action
      // (CollectMetrics accumulator) — one job per iteration total. The r2
      // version re-joined labels↔next (an extra join per round); r3
      // scanned the checkpointed partitions (an extra job per round).
      val pushed = bi.join(labels, bi("src") === labels("id"))
        .select(col("dst").as("id"), col("component"),
          lit(null).cast(idType).as("own"))
      val obs = Observation(s"cc_changed_$i")
      val next = labels.select(col("id"), col("component"), col("component").as("own"))
        .unionByName(pushed)
        .groupBy("id").agg(min("component").as("component"), max("own").as("own"))
        .observe(obs, coalesce(sum(when(col("component") =!= col("own"), 1L).otherwise(0L)), lit(0L)).as("changed"))
        .select(col("id"), col("component"))
        .localCheckpoint(true)
      labels = next
      converged = obs.get("changed") == 0L
      i += 1
    }
    bi.unpersist()
    labels.unionByName(untouched)
  }
}
