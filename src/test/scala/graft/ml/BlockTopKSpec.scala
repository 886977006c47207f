package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("probeTopKCandidates ≡ relational broadcast-join ground truth (scores AND ranks, per shard)") {
    import org.apache.spark.sql.expressions.Window
    val spark2 = spark
    val e = graft.core.Tables.embeddings(spark, sfDir)
      .select((col("vec_id") % 3).cast("int").as("shard"), col("vec_id"), col("embedding"))
    val probes = e.filter(col("vec_id") % 10 === 3)
    // dense kernel candidates, globally re-ranked the way annRecallSharded does
    val dense = BlockTopK.probeTopKCandidates(e, probes, 3)
      .withColumn("rk", row_number().over(
        Window.partitionBy("shard", "a_id").orderBy(col("sim").desc, col("b_id").asc)))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(4), r.getDouble(3)))
      .sorted.toSeq
    // the relational form this kernel replaced (broadcast join + window)
    val nrm = graft.expr.NativeVecFns.norm(spark2, col("embedding"))
    val en = e.withColumn("nrm", nrm)
    val a = en.filter(col("vec_id") % 10 === 3).select(col("shard"),
      col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = en.select(col("shard"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val rel = b.join(broadcast(a), Seq("shard"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim", graft.expr.NativeVecFns.dot(spark2, col("a_emb"), col("b_emb"))
        / (col("a_nrm") * col("b_nrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("shard", "a_id").orderBy(col("sim").desc, col("b_id").asc)))
      .filter(col("rk") <= 3)
      .select("shard", "a_id", "b_id", "rk", "sim")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      .sorted.toSeq
    assert(dense == rel, "dense kernel must be bit-identical to the relational form")
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
