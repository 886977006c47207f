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

  /** Broadcasts created by the LAZY entry points ([[cosineTopK]],
    * [[probeTopKCandidates]]) must outlive the plan that captures them,
    * so they cannot be destroyed inside the builder — unlike
    * [[cosineTopKSharded]]'s eager per-shard passes, which destroy each
    * shard's broadcast as soon as its pass is localCheckpoint'ed.
    * Repeated calls (bench reps, parity re-runs) would otherwise leak
    * one broadcast per call on the executors, so every such broadcast is
    * REGISTERED here — keyed by the owning SparkContext's applicationId,
    * so releasing one harness's broadcasts can never destroy a broadcast
    * captured by an unrelated concurrent session's still-unevaluated
    * plan. [[releaseBroadcasts]] destroys and clears one session's
    * entries; call it ONLY at a boundary where every plan built from
    * these entry points IN THAT SESSION has been fully evaluated (end of
    * a bench rep, end of a parity run) — evaluating such a plan
    * afterwards fails loudly with a destroyed-broadcast error, never
    * silently. Within one session, concurrent threads still share a key
    * (applicationId is per-context): the single-threaded-harness caveat
    * continues to apply per session. */
  private val liveBroadcasts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.broadcast.Broadcast[_]]]()

  private def track[T](spark: org.apache.spark.sql.SparkSession,
                       bc: org.apache.spark.broadcast.Broadcast[T]): org.apache.spark.broadcast.Broadcast[T] = {
    liveBroadcasts
      .computeIfAbsent(spark.sparkContext.applicationId,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.broadcast.Broadcast[_]]())
      .add(bc)
    bc
  }

  /** Destroy every broadcast registered by [[cosineTopK]] /
    * [[probeTopKCandidates]] under `spark`'s context since the last
    * release (see [[liveBroadcasts]] for the safety contract). */
  def releaseBroadcasts(spark: org.apache.spark.sql.SparkSession): Unit = {
    val q = liveBroadcasts.remove(spark.sparkContext.applicationId)
    if (q != null) {
      var b = q.poll()
      while (b != null) { b.destroy(); b = q.poll() }
    }
  }

  /** Release across ALL registered sessions — only for single-session
    * processes (Bench/Verify mains) where no other session can hold an
    * unevaluated plan. */
  def releaseBroadcasts(): Unit = {
    val it = liveBroadcasts.keys()
    while (it.hasMoreElements) {
      val q = liveBroadcasts.remove(it.nextElement())
      if (q != null) {
        var b = q.poll()
        while (b != null) { b.destroy(); b = q.poll() }
      }
    }
  }

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
    // build side: primitive vectors + norms, broadcast once (tracked —
    // must outlive the lazy plan; released via releaseBroadcasts)
    val bc = track(spark, spark.sparkContext.broadcast(
      rows.collect().map { case (id, v) => withNorm(id, v) }))
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
  /** REVERSED asymmetry for ground-truth recall evals (q92/q120): there
    * the small side is the PROBE SAMPLE (thousands — broadcast-sized by
    * the documented eval contract) and the large side is the corpus, so
    * broadcasting probes and streaming the corpus ONCE is the shape that
    * survives 100 TB. Each corpus partition scores its rows against
    * every same-shard probe into per-probe bounded [[TopKBuffer]]s
    * (probes·k state per task) and emits only the partition-local top-k
    * CANDIDATES — ≤ probes·k rows per partition instead of probes·N
    * joined pairs. The caller re-ranks the union with the identical
    * (sim desc, id asc) tiebreak (top-k is a semilattice under that
    * order, so partial-then-global ≡ global — the cosineTopKSharded
    * merge argument), which keeps results bit-identical to the
    * relational broadcast-join form (spec-asserted in BlockTopKSpec).
    *
    * Input frames: corpus (shard int, vec_id long, embedding), probes
    * (shard int, vec_id long, embedding). Output: candidate rows
    * (shard, a_id, b_id, sim) — NOT yet globally ranked. */
  def probeTopKCandidates(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val probeRows = probes.select(col("shard").cast("int"), col("vec_id"),
        col("embedding")).as[(Int, Long, Seq[Float])].collect()
      .map { case (s, id, v) => val (_, arr, nrm) = withNorm(id, v); (s, id, arr, nrm) }
    // per-shard probe slices as GLOBAL heap indices, so one flat heap
    // array serves all shards
    val idxByShard: Map[Int, Array[Int]] =
      probeRows.zipWithIndex.groupBy(_._1._1).map { case (s, ps) => s -> ps.map(_._2) }
    val bcProbes = track(spark, spark.sparkContext.broadcast(probeRows))
    val bcIdx = track(spark, spark.sparkContext.broadcast(idxByShard))
    corpus.select(col("shard").cast("int"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])]
      .mapPartitions { it =>
        val ps = bcProbes.value
        val idx = bcIdx.value
        val heaps = Array.fill(ps.length)(new TopKBuffer(k))
        it.foreach { case (shard, bId, bVec) =>
          val cand = idx.getOrElse(shard, Array.emptyIntArray)
          if (cand.nonEmpty) {
            val (_, b, bNorm) = withNorm(bId, bVec)
            var c = 0
            while (c < cand.length) {
              val i = cand(c)
              val (_, aId, a, aNorm) = ps(i)
              if (aId != bId) {
                var dot = 0.0
                var d = 0
                val n = math.min(a.length, b.length)
                while (d < n) { dot += a(d).toDouble * b(d); d += 1 }
                heaps(i).insert(dot / (aNorm * bNorm), bId)
              }
              c += 1
            }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
          val (s, aId, _, _) = ps(i)
          (0 until h.size).map(r => (s, aId, h.ids(r), h.scores(r)))
        }
      }.toDF("shard", "a_id", "b_id", "sim")
  }

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
