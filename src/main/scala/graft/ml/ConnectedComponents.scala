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
    if (!converged) {
      // diameter > maxIter: returning here would be SILENTLY wrong.
      // Near-dup graphs are shallow so this is the pathological path —
      // hand the whole problem to the O(log²)-round star algorithm.
      return componentsStar(vertices, edges)
    }
    labels.unionByName(untouched)
  }

  /** Canonical undirected edge set: (hi, lo) with hi > lo, deduped. */
  private def canonical(pairs: DataFrame, a: String, b: String): DataFrame =
    pairs.filter(col(a) =!= col(b)).select(
      greatest(col(a), col(b)).as("hi"),
      least(col(a), col(b)).as("lo")).distinct()

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — O(log² n) rounds regardless of graph DIAMETER, vs the
    * diameter-bound rounds of [[components]]' label propagation:
    *
    *  - large-star: every node points its strictly-larger neighbors at
    *    the minimum of its neighborhood (incl. itself);
    *  - small-star: every node points its smaller neighbors (and itself)
    *    at the smallest of them.
    *
    * Both steps preserve connectivity and only ever contract toward the
    * component minimum; the fixed point is a star per component rooted
    * at its minimum id. Per round: two groupBy+join shuffles keyed on
    * vertex id — heavier per round than label propagation, so this is
    * the PATHOLOGICAL-DIAMETER path (long chains), not the default for
    * shallow near-dup graphs. Fixed point is detected by an observed
    * (count, hash-sum) signature of the edge set riding the checkpoint
    * action. */
  def componentsStar(vertices: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame =
    componentsStarCounted(vertices, edges, maxIter)._1

  /** [[componentsStar]] plus the number of rounds it took to reach the
    * fixed point — the observable a regression gate pins: round count is
    * the cost driver (two keyed shuffles per round), grows ~log² in
    * component size, and a converge-detection bug would otherwise hide
    * as bench noise (the r6 lesson). */
  def componentsStarCounted(vertices: DataFrame, edges: DataFrame,
                            maxIter: Int = 30): (DataFrame, Int) = {
    var e = canonical(edges, "src", "dst").localCheckpoint(true)
    val untouched = vertices
      .join(e.select(col("hi").as("id")).unionByName(e.select(col("lo").as("id"))).distinct(),
        Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var sig = (-1L, 0L)
    var stable = false
    var i = 0
    while (!stable && i < maxIter) {
      // large-star: m(u) = min(Γ(u) ∪ {u}); emit (x, m(u)) for x ∈ Γ(u), x > u
      val bi = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(e.select(col("lo").as("u"), col("hi").as("v")))
      val mn = bi.groupBy("u").agg(min("v").as("mnv"))
        .select(col("u"), least(col("mnv"), col("u")).as("m"))
      val afterLarge = canonical(
        bi.filter(col("v") > col("u")).join(mn, "u").select(col("v"), col("m")), "v", "m")
      // small-star: each canonical edge (hi, lo) IS hi's smaller
      // neighborhood; emit (x, m(hi)) for every smaller neighbor x and
      // for hi itself
      val m2 = afterLarge.groupBy("hi").agg(min("lo").as("m"))
      val emitted = afterLarge.join(m2, "hi").select(col("lo").as("a"), col("m").as("b"))
        .unionByName(m2.select(col("hi").as("a"), col("m").as("b")))
      val obs = Observation(s"cc_star_$i")
      val next = canonical(emitted, "a", "b")
        .observe(obs,
          count(lit(1)).as("cnt"),
          // mod 2^31 keeps the sum inside a long for any realistic edge
          // count (ANSI mode: a raw xxhash64 sum overflows)
          coalesce(sum(pmod(xxhash64(col("hi"), col("lo")), lit(1L << 31))), lit(0L)).as("hsum"))
        .localCheckpoint(true)
      val nextSig = (obs.get("cnt").asInstanceOf[Long], obs.get("hsum").asInstanceOf[Long])
      stable = nextSig == sig
      sig = nextSig
      e = next
      i += 1
    }
    // unlike pre-fixpoint propagation labels (which are merely stale),
    // extracting from a non-star edge set would be WRONG — refuse
    if (!stable) throw new IllegalStateException(
      s"componentsStar did not reach a fixed point in $maxIter rounds — " +
        "raise maxIter (rounds grow ~log² in component size)")
    // fixed point: every edge is (member, component-min root)
    val members = e.groupBy(col("hi")).agg(min("lo").as("component"))
      .select(col("hi").as("id"), col("component"))
    val roots = e.select(col("lo").as("id")).distinct()
      .join(e.select(col("hi").as("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    (members.unionByName(roots).unionByName(untouched), i)
  }
}
