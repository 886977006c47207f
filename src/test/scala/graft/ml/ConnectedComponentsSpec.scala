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
}
