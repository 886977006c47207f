package graft.ml

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact fixed-point integer arithmetic.
  *
  * Link-graph centrality is a standard quality/retention signal in
  * web-corpus curation (host-level PageRank over the crawl graph), and on
  * a similarity graph the highest-rank node of a duplicate cluster is the
  * natural canonical representative. Distinct from
  * [[ConnectedComponents]]: this is a NUMERIC iterative graph computation
  * (mass flows along edges each round), not label propagation.
  *
  * All arithmetic is fixed-point over `scale` (default 10^12): the
  * teleport term, the initial rank, and every per-edge contribution use
  * integer division (Spark `div` ≡ DuckDB `//`), so two engines agree
  * bit-for-bit — float summation order would otherwise make a
  * cross-engine hash oracle impossible. With rank mass ≤ scale = 10^12,
  * the largest intermediate (85 · Σcontrib ≤ 8.5·10^13) stays far inside
  * Long.
  *
  * 100 TB shape: per iteration exactly one src-keyed join (ranks ×
  * degree-annotated edges) and one dst-keyed aggregation — the canonical
  * Pregel rank/contribution shuffle pair. The edge list is
  * degree-annotated once and persisted; the iteration count is FIXED (a
  * curation hyper-parameter, as in crawl-graph practice), so the plan is
  * statically unrolled with no driver-side convergence action per round.
  */
object PageRank {

  /** SYMMETRIC-graph variant. Contract: every node has at least one
    * out-edge AND at least one in-edge — both true by construction for
    * symmetrized similarity graphs, where the node set is exactly the
    * edge endpoints and every edge appears in both directions. Outside
    * that contract (a directed crawl graph) dangling nodes would leak
    * rank mass and source-only nodes would vanish from the output after
    * round 1 — use [[ranksDirected]] there, which redistributes dangling
    * mass and keeps the full node universe.
    *
    * @param edges directed (src: long, dst: long); symmetrize first if the
    *              underlying relation is undirected
    * @param iterations fixed number of power-iteration rounds (≥ 1)
    * @param scale fixed-point unit; ranks sum to ≈ scale (minus bounded
    *              truncation loss from integer division)
    * @return one row per node: (node, degree, rank_fp) with rank_fp in
    *         `scale` units */
  def ranks(edges: DataFrame, iterations: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // deg feeds the annotated edges, node count, init ranks AND the final
    // join — persisting it stops four re-derivations of the (possibly
    // expensive) upstream edge plan
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    // degree-annotated edges power every iteration — computed once, kept hot
    val ed = edges.join(deg, "src").persist()
    // The pre-r15 shape statically unrolled all rounds into ONE plan with
    // broadcast one-row frames for n and the teleport base (no driver
    // action) — but at 5 rounds that plan carried 66 Exchange nodes and
    // its wall was dominated by per-stage codegen + AQE re-planning of
    // the growing tree (~38 ms/stage at sf0.1, StageProbe r15), and at
    // high iteration counts optimizer time grows superlinearly. Now each
    // round is an eagerly-checkpointed O(1) plan (the ranksDirected /
    // ConnectedComponents discipline); since rounds pay an action anyway,
    // n and the teleport base become plain scalars — same floor-division
    // arithmetic (non-negative Scala Long `/` ≡ SQL `div`), bit-equal to
    // the unrolled-CTE oracle. Superseded round blocks are dropped by the
    // ContextCleaner once unreferenced.
    val n = math.max(deg.count(), 1L)
    val base = (15L * (scale / n)) / 100L
    var last = deg.select(col("src").as("node"), lit(scale / n).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      last = last.withColumnRenamed("node", "p_node")
        .join(ed, col("p_node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div outdeg")).as("s"))
        .select(col("dst").as("node"), expr(s"$base + (85 * s) div 100").as("r"))
        .localCheckpoint(true)
    }
    last.join(deg, last("node") === deg("src"))
      .select(col("node"), col("outdeg").as("degree"), col("r").as("rank_fp"))
  }

  /** DIRECTED-graph (crawl-graph) variant: handles dangling nodes (no
    * out-edges) and source-only nodes (no in-edges), the two cases the
    * symmetric contract excludes.
    *
    *   - Node universe = every edge endpoint (src ∪ dst), kept in the
    *     rank frame across all rounds via a node-keyed left join — a
    *     source-only node keeps receiving its teleport + dangling share
    *     and appears in the output.
    *   - Dangling mass: each round, D = Σ ranks of outdeg-0 nodes is
    *     redistributed uniformly — the standard virtual-sink-to-all-nodes
    *     treatment, computed as one scalar aggregate per round instead of
    *     n² virtual edges. In fixed-point: r' = base + (85·(s + D div n))
    *     div 100, with the division order part of the cross-engine
    *     contract (the DuckDB oracle mirrors it exactly).
    *
    * Unlike [[ranks]] (a single statically-unrolled plan), each round here
    * needs a SCALAR from the previous round's frame (the dangling sum), so
    * the loop materializes one frame per round — the standard
    * Pregel/GraphX iteration shape, exactly one job per round regardless
    * of graph size. Expressing D as a broadcast one-row frame instead
    * (the r6 first cut) serialized a chain of 5 broadcast-exchange builds
    * and 15 crossJoins into the plan and benched 5.7× slower at sf0.1 for
    * identical integers. n and the teleport base are scalars of the
    * (fixed) node universe, computed once up front; all arithmetic is
    * unchanged — non-negative Scala Long `/` is the same floor division
    * as SQL `div`, so results stay bit-equal to the unrolled-CTE oracle.
    *
    * Round materialization is an EAGER `localCheckpoint` with the
    * dangling sum riding the SAME action as an [[Observation]] metric
    * (the [[ConnectedComponents]] one-job-per-round pattern, r15): the
    * r14 persist-chain version left every round's full lineage in the
    * logical plan, so round k re-analyzed/re-optimized rounds 1..k−1 —
    * the q86 before-plan carried 611 Exchange nodes and the bench wall
    * was 2× the sum of its stage walls (driver planning, measured by
    * StageProbe r15). Checkpointing truncates the plan to O(1) per round
    * and the observed metric replaces the separate dangling `first()`
    * action. Superseded round blocks are dropped by the ContextCleaner
    * once unreferenced (two rounds later); at most two |V|-row frames
    * (plus nodes and the annotated edges) are reachable at any time.
    *
    * 100 TB shape: per round one src-keyed join + one dst-keyed agg (as
    * [[ranks]]) plus one node-keyed left join and a scalar aggregate —
    * same shuffle class, one extra keyed exchange. */
  def ranksDirected(edges: DataFrame, iterations: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // full node universe, outdeg-annotated (0 for dangling)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .na.fill(0L, Seq("outdeg"))
      .persist()
    val ed = edges.join(deg, "src").persist()
    // node count and teleport base: one action, also warms the nodes cache
    val n = math.max(nodes.count(), 1L)
    val base = (15L * (scale / n)) / 100L
    // eager checkpoint + observed dangling sum: ONE action materializes
    // the round frame, truncates its lineage, and yields the scalar the
    // NEXT round's expression needs
    def materialize(df: DataFrame, tag: String): (DataFrame, Long) = {
      val obs = Observation(tag)
      val out = df.observe(obs,
        coalesce(sum(when(col("outdeg") === 0, col("r"))), lit(0L)).as("dang"))
        .localCheckpoint(true)
      (out, obs.get("dang").asInstanceOf[Long])
    }
    var (prev, dang) = materialize(
      nodes.select(col("node"), lit(scale / n).as("r"), col("outdeg")),
      "pr_dang_0")
    for (i <- 1 to iterations) {
      // drop prev's outdeg before the join: ed carries the src's outdeg
      // (same value) and keeping both would make `r div outdeg` ambiguous
      val contrib = prev.filter(col("outdeg") > 0)
        .select(col("node").as("p_node"), col("r"))
        .join(ed, col("p_node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div outdeg")).as("s"))
      val next = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"$base + (85 * (coalesce(s, CAST(0 AS BIGINT)) + ${dang / n})) div 100").as("r"),
          col("outdeg"))
      val (m, d) = materialize(next, s"pr_dang_$i")
      prev = m
      dang = d
    }
    prev.select(col("node"), col("outdeg").as("degree"), col("r").as("rank_fp"))
  }
}
