package graft.ml

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  test("known graph: chains, triangle, and singletons resolve to component minima") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20} (self), {30} (isolated vertex)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (12L, 10L), (20L, 20L))
      .toDF("src", "dst")
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 30L).toDF("id")
    val out = ConnectedComponents.components(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 30L -> 30L))
  }

  test("long chain converges within the diameter bound") {
    val n = 12
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val vertices = (0 until n).map(_.toLong).toDF("id")
    val out = ConnectedComponents.components(vertices, edges, maxIter = n)
      .collect().map(_.getLong(1)).distinct.toSeq
    assert(out == Seq(0L), "whole chain must collapse to the minimum label")
  }

  test("star algorithm matches label propagation on the known graph") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (12L, 10L), (20L, 20L))
      .toDF("src", "dst")
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 30L).toDF("id")
    val out = ConnectedComponents.componentsStar(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 30L -> 30L))
  }

  test("star algorithm matches label propagation on random graphs") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val nV = 150
      val edges = Seq.fill(200)((rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
        .toDF("src", "dst")
      val vertices = (0 until nV).map(_.toLong).toDF("id")
      val viaProp = ConnectedComponents.components(vertices, edges, maxIter = nV)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaStar = ConnectedComponents.componentsStar(vertices, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaStar == viaProp, s"seed $seed")
    }
  }

  test("star collapses a 200-node path in O(log) rounds (diameter-proof)") {
    val n = 200
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val vertices = (0 until n).map(_.toLong).toDF("id")
    val out = ConnectedComponents.componentsStar(vertices, edges, maxIter = 30)
      .collect()
    assert(out.length == n && out.forall(_.getLong(1) == 0L),
      "a 200-hop path must fully contract inside 30 star rounds")
  }

  test("label propagation past its iteration bound falls back to star, never silently wrong") {
    val n = 60 // diameter 59 ≫ maxIter 5
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val vertices = (0 until n).map(_.toLong).toDF("id")
    val out = ConnectedComponents.components(vertices, edges, maxIter = 5).collect()
    assert(out.length == n && out.forall(_.getLong(1) == 0L))
  }
}
