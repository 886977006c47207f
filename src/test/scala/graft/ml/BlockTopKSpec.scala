package graft.ml

import graft.SparkSpec

class BlockTopKSpec extends SparkSpec {

  test("tiled mapPartitions top-k is rank-identical to the relational q31") {
    val tiled = BlockTopK.cosineTopK(
      graft.core.Tables.embeddings(spark, sfDir), k = 3)
      .collect().map(r => (r.vec_id, r.neighbor_id, r.rank)).sorted.toSeq
    val relational = graft.queries.EmbeddingQueries.q31CosineTopK(spark, sfDir)
      .select("vec_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(tiled == relational)
  }

  test("sharded build side (4 shards) is rank-identical to the single broadcast") {
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val n = e.count().toInt
    val sharded = BlockTopK.cosineTopKSharded(e, k = 3, maxBuildRows = math.max(1, n / 4))
      .collect().map(r => (r.vec_id, r.neighbor_id, r.rank)).sorted.toSeq
    val single = BlockTopK.cosineTopK(e, k = 3)
      .collect().map(r => (r.vec_id, r.neighbor_id, r.rank)).sorted.toSeq
    assert(sharded == single)
  }

  test("tiled top-k throughput comparison (informational)") {
    val e = graft.core.Tables.embeddings(spark, sfDir).cache()
    e.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tTiled = time(BlockTopK.cosineTopK(e, 3).foreach(_ => ()))
    val tRel = time {
      graft.queries.EmbeddingQueries.q31CosineTopK(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    info(f"tiled=$tTiled%.2fs relational=$tRel%.2fs")
    e.unpersist()
  }
}
