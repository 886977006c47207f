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
  * per million vectors), beyond which shard the build side and merge
  * the per-shard top-k with [[graft.expr.TopKAgg]].
  */
object BlockTopK {

  def cosineTopK(embeddings: DataFrame, k: Int): Dataset[NeighborRow] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
    // build side: primitive vectors + norms, broadcast once
    val build = rows.collect().map { case (id, v) =>
      val arr = v.toArray
      var n = 0.0
      var i = 0
      while (i < arr.length) { n += arr(i).toDouble * arr(i); i += 1 }
      (id, arr, math.sqrt(n))
    }
    val bc = spark.sparkContext.broadcast(build)
    rows.mapPartitions { it =>
      val b = bc.value
      it.flatMap { case (aId, aVec) =>
        val a = aVec.toArray
        var an = 0.0
        var i = 0
        while (i < a.length) { an += a(i).toDouble * a(i); i += 1 }
        val aNorm = math.sqrt(an)
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
}
