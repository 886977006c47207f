package graft.ml

import org.apache.spark.sql.DataFrame
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
  *
  * Dangling nodes are unsupported by contract: every node must have at
  * least one out-edge — true by construction for symmetrized similarity
  * graphs, where the node set is exactly the edge endpoints.
  */
object PageRank {

  /** @param edges directed (src: long, dst: long); symmetrize first if the
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
    val n1 = deg.agg(count(lit(1)).as("n"))
    // degree-annotated edges power every iteration — computed once, kept hot
    val ed = edges.join(deg, "src").persist()
    // teleport base 0.15·(scale/n) and init rank scale/n are global
    // constants; broadcast one-row frames keep everything a single plan
    // (no driver-side count action). greatest(n,1) guards the empty-graph
    // case, where the output is empty anyway.
    val base = broadcast(n1.select(
      expr(s"(15 * ($scale div greatest(n, 1))) div 100").as("base")))
    val init = deg.crossJoin(broadcast(n1))
      .select(col("src").as("node"), expr(s"$scale div greatest(n, 1)").as("r"))
    val last = (1 to iterations).foldLeft(init) { (prev, _) =>
      prev.withColumnRenamed("node", "p_node")
        .join(ed, col("p_node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div outdeg")).as("s"))
        .crossJoin(base)
        .select(col("dst").as("node"), expr("base + (85 * s) div 100").as("r"))
    }
    last.join(deg, last("node") === deg("src"))
      .select(col("node"), col("outdeg").as("degree"), col("r").as("rank_fp"))
  }
}
