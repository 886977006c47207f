package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.expr.TopKBuffer

/** One output row of [[BlockTopK]] (top-level for encoder codegen). */
case class NeighborRow(vec_id: Long, neighbor_id: Long, rank: Int, cosine_sim: Double)

/** Tiled brute-force cosine top-k via `mapPartitions` — the builder's
  * preference tier (d), used deliberately: the all-pairs score is a
  * dense-compute kernel, and a relational join materializes every scored
  * pair as a row (4M rows at sf0.1) only for the aggregate to throw all
  * but k away. Here the probe side streams once per partition against a
  * broadcast, pre-normalized build side held as primitive arrays, and
  * only k rows per vector ever exist.
  *
  * Equivalent to the q31 formulation (same scores, same (sim desc, id
  * asc) tiebreak — spec-asserted); q31 stays the oracle-checked
  * relational form, this is the throughput form for when the pairing is
  * genuinely dense. Scale: probe side partitions freely; the broadcast
  * side must fit in executor memory (dim·4 bytes per vector — ~256 MB
  * per million vectors), beyond which [[BlockTopK.cosineTopKSharded]]
  * cuts the build side into broadcast-sized shards and merges the
  * per-shard top-k (rank-identical, spec-asserted).
  */
object BlockTopK {

  private def withNorm(id: Long, v: Seq[Float]): (Long, Array[Float], Double) = {
    val arr = v.toArray
    var n = 0.0
    var i = 0
    while (i < arr.length) { n += arr(i).toDouble * arr(i); i += 1 }
    (id, arr, math.sqrt(n))
  }

  /** One probe-side pass against a broadcast build shard: per vector, the
    * shard-local top-k by (sim desc, id asc). */
  private def shardPass(rows: Dataset[(Long, Seq[Float])],
                        bc: org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Float], Double)]],
                        k: Int): Dataset[NeighborRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val b = bc.value
      it.flatMap { case (aId, aVec) =>
        val (_, a, aNorm) = withNorm(aId, aVec)
        val heap = new TopKBuffer(k)
        var j = 0
        while (j < b.length) {
          val (bId, bVec, bNorm) = b(j)
          if (bId != aId) {
            var dot = 0.0
            var d = 0
            val n = math.min(a.length, bVec.length)
            while (d < n) { dot += a(d).toDouble * bVec(d); d += 1 }
            // same expression shape as q31 (dot / (na·nb)) → bit-identical
            heap.insert(dot / (aNorm * bNorm), bId)
          }
          j += 1
        }
        (0 until heap.size).map(r => NeighborRow(aId, heap.ids(r), r + 1, heap.scores(r)))
      }
    }
  }

  def cosineTopK(embeddings: DataFrame, k: Int): Dataset[NeighborRow] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
    // build side: primitive vectors + norms, broadcast once
    val bc = spark.sparkContext.broadcast(
      rows.collect().map { case (id, v) => withNorm(id, v) })
    shardPass(rows, bc, k)
  }

  /** Sharded build side for corpora whose vectors exceed one broadcast
    * budget (the r2 `weak`: a single driver `collect()` caps this tier).
    * The build side is cut into `ceil(N / maxBuildRows)` hash shards;
    * each is collected, broadcast, scored in a [[shardPass]], eagerly
    * materialized (`localCheckpoint`), and its broadcast DESTROYED before
    * the next shard — driver/executor memory holds one shard at a time.
    * Per-shard top-k unions are merged by a (vec_id)-keyed window with
    * the identical (sim desc, id asc) tiebreak, so ranks are
    * bit-identical to the unsharded pass (spec-asserted).
    *
    * Cost model: probe side is scanned once per shard — the inherent
    * blocked all-pairs trade; at 100 TB pick `maxBuildRows` so a shard
    * is ~executor-broadcast-sized (dim·4 B per vector). */
  def cosineTopKSharded(embeddings: DataFrame, k: Int, maxBuildRows: Int): Dataset[NeighborRow] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
    val n = rows.count()
    val numShards = math.max(1L, (n + maxBuildRows - 1) / maxBuildRows).toInt
    if (numShards == 1) return cosineTopK(embeddings, k)
    val shardResults = (0 until numShards).map { s =>
      val build = rows
        .filter(r => ((r._1 % numShards) + numShards) % numShards == s)
        .collect().map { case (id, v) => withNorm(id, v) }
      val bc = spark.sparkContext.broadcast(build)
      val out = shardPass(rows, bc, k).toDF().localCheckpoint(true)
      bc.destroy()
      out
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
    shardResults.reduce(_ unionByName _)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("rn").as("rank"), col("cosine_sim"))
      .as[NeighborRow]
  }
}
