package graft.ml

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private val Scale = 1000000000000L

  test("symmetric 2-node graph is an exact fixed point at scale/2") {
    // each node sends its whole rank to the other: r' = 0.15·(S/2) + 0.85·r
    // with r0 = S/2 stays exactly S/2 in integer arithmetic (no drift)
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = PageRank.ranks(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (1L, Scale / 2), 2L -> (1L, Scale / 2)))
  }

  test("star graph: the hub outranks every leaf, mass is conserved up to truncation") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val rows = PageRank.ranks(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val hub = rows(1L)._2
    for (leaf <- Seq(2L, 3L, 4L, 5L)) {
      assert(rows(leaf)._1 == 1L)
      assert(hub > rows(leaf)._2, s"hub must outrank leaf $leaf")
    }
    assert(rows(1L)._1 == 4L)
    // leaves are symmetric — identical rank
    assert(Seq(2L, 3L, 4L, 5L).map(rows(_)._2).distinct.size == 1)
    // total mass ≤ scale and within a loose truncation bound of it
    val total = rows.values.map(_._2).sum
    assert(total <= Scale && total > Scale - 1000L * rows.size)
  }

  test("directed: dangling mass is redistributed, source-only nodes stay in the output") {
    // 1 → 2 → 3: node 1 is source-only (no in-edges), node 3 is dangling
    // (no out-edges). ranksDirected must emit all three nodes every round
    // and conserve total mass up to integer truncation.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rows = PageRank.ranksDirected(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), "every edge endpoint must appear")
    assert(rows(1L)._1 == 1L && rows(2L)._1 == 1L && rows(3L)._1 == 0L)
    // node 1 receives only teleport + dangling share; 2 additionally gets
    // 1's full rank; 3 gets 2's — ranks must strictly increase down-chain
    assert(rows(1L)._2 < rows(2L)._2 && rows(2L)._2 < rows(3L)._2)
    val total = rows.values.map(_._2).sum
    assert(total <= Scale && total > Scale - 1000L * rows.size,
      s"dangling mass must be redistributed, not dropped (total=$total)")
  }

  test("directed matches symmetric variant on a symmetrized edge set (no dangling)") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L))
    val sym = (pairs ++ pairs.map(_.swap)).distinct.toDF("src", "dst")
    val a = PageRank.ranks(sym, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = PageRank.ranksDirected(sym, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b, "with zero dangling mass the two variants are the same recurrence")
  }

  test("rank is invariant to edge-list partitioning (sum order)") {
    val pairs = for (i <- 1L to 20L; j <- Seq(i % 7 + 21L, i % 5 + 30L)) yield (i, j)
    val sym = (pairs ++ pairs.map(_.swap)).distinct
    val one = PageRank.ranks(sym.toDF("src", "dst").coalesce(1), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val many = PageRank.ranks(sym.toDF("src", "dst").repartition(13), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one == many, "integer fixed-point ranks must not depend on partitioning")
  }
}
