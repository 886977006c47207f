package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.NativeVecFns

/** Distributed Lloyd's k-means over `array<float|double>` embedding
  * columns — the coarse-quantizer trainer behind IVF similarity search
  * (q33 uses label-seeded centroids; this trains proper ones).
  *
  * Each iteration is two shuffles: assignment is a broadcast cross join
  * against the k×dim centroid table (tiny) + a min-by window, update is
  * a posexplode + (cid, pos) average. Centroids live in DataFrames
  * end-to-end; the only driver-side state is the loop counter — at
  * 100 TB the per-iteration cost is one scan + one k-way aggregation.
  */
object KMeans {

  /** Assign each vector to its nearest centroid (squared L2, native
    * codegen'd kernel; deterministic tiebreak on centroid id).
    *
    * The argmin is a [[TopKAgg]] at k = 1, NOT a `row_number` window:
    * the window plan hash-exchanges the ENTIRE N×k cross-join stream on
    * vec_id and externally sorts it per partition — measured at sf10
    * under a 16 GiB heap as 18.45 GB of sort spill PER Lloyd pass
    * (SpillProbe, BASELINE.md r14), ×(iters+1) passes per store build.
    * The aggregate form map-side-combines the same stream to one
    * 16-byte (best dist, best cid) state per vector BEFORE any
    * exchange, so the shuffle moves N one-row buffers instead of N×k
    * candidate rows and nothing sorts. Score = −dist_sq (IEEE negation
    * is exact, so the recovered dist_sq is bit-identical), ties by
    * ascending cid — the window's exact selection semantics. The group
    * key is vec_id ALONE — the embedding rides along as `first()`
    * (constant within a group, so the value is deterministic): grouping
    * by (vec_id, embedding) would hash-probe a ~0.5 KB key once per
    * candidate row, k× per vector.
    *
    * Null semantics (intentional divergence from the window form): the
    * aggregate's `update` skips null scores/ids and [[graft.expr.TopKBuffer]]
    * skips NaN, so a vector whose every candidate distance is null/NaN
    * (i.e. a null embedding) gets an empty `top` array → null cid and is
    * effectively dropped, where the old `asc` window would have ranked
    * the null-distance row FIRST and kept the vector with a garbage
    * assignment. Dropping is the behavior we want — callers feed
    * non-null embeddings (the stores validate on ingest), and a silent
    * garbage cid would poison the centroid update. */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    vectors.crossJoin(broadcast(centroids))
      .withColumn("dist_sq", NativeVecFns.l2DistSq(spark, col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(
        graft.expr.TopKAgg.topKByScore(spark,
          negate(col("dist_sq")), col("cid").cast("long"), 1).as("top"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"),
        element_at(col("top"), 1).getField("id")
          .cast(centroids.schema("cid").dataType).as("cid"),
        negate(element_at(col("top"), 1).getField("score")).as("dist_sq"))
  }

  /** One Lloyd update: new centroid = mean of assigned vectors (empty
    * clusters keep their previous centroid). */
  def update(assigned: DataFrame, centroids: DataFrame): DataFrame = {
    val fresh = assigned
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cid", "pos").agg(avg(col("x").cast("double")).as("c"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cid"), transform(col("pc"), p => p("c")).as("centroid"))
    // keep previous centroids for clusters that lost all members
    centroids.select(col("cid"), col("centroid").as("prev"))
      .join(fresh.withColumnRenamed("centroid", "next"), Seq("cid"), "left_outer")
      .select(col("cid"), coalesce(col("next"), col("prev")).as("centroid"))
  }

  /** Deterministic init: the k lowest-id vectors as seeds. cid comes from
    * row_number over k rows (trivial window) — not
    * monotonically_increasing_id, whose partition bits (n<<33) would
    * overflow the int cast if the post-limit plan ever had >1 partition. */
  def init(vectors: DataFrame, k: Int): DataFrame =
    vectors.orderBy("vec_id").limit(k)
      .select(
        (row_number().over(Window.orderBy("vec_id")) - 1).as("cid"),
        graft.functions.VecFns.toDouble(col("embedding")).as("centroid"))

  /** Lazy-chain depth bound: each round references the previous round's
    * plan ~3× (assign + update's two sides), and cache substitution only
    * happens at PHYSICAL planning — Catalyst analyzes the full logical
    * tree first, so analysis work grows ~3^iters. ≤6 rounds is a few
    * hundred nodes (negligible); past that the per-round eager path's
    * k-row count() actions are far cheaper than exponential analysis. */
  private val MaxLazyIters = 6

  /** Train: `iters` Lloyd rounds; returns (centroids, inertia-per-iter).
    *
    * Default path (`trackInertia = false`) is COLLECT-FREE: each round's
    * k-row centroid table is a lazily-persisted plan fragment referencing
    * the previous round's, and ONE `count()` at the end evaluates the
    * whole chain (the cache manager materializes every round exactly once
    * — each fragment appears multiple times in the nested plan, but all
    * references resolve to the same InMemoryRelation). No per-round
    * driver action for iters ≤ [[MaxLazyIters]]; deeper trainings switch
    * to one k-row count() per round (still collect-free — no DATA reaches
    * the driver) to keep logical-plan analysis linear in iters.
    *
    * `trackInertia = true` adds one scalar `collect` per round (Σ dist²
    * of the round's assignment — the monitored invariant, which must
    * never increase); use it for convergence monitoring, not production
    * training.
    *
    * OWNERSHIP: the returned centroid frame is persisted (k rows);
    * the CALLER unpersists it once consumed — e.g. the snapshot-store
    * builders (`EmbeddingQueries.trainedCentroids`,
    * `IncrementalIvf.writeIndex`) write it to parquet and unpersist
    * immediately. A long-lived caller that drops the reference without
    * unpersisting leaks one k-row cache entry per (process, dir). */
  def fit(vectors: DataFrame, k: Int, iters: Int,
          trackInertia: Boolean = false): (DataFrame, Seq[Double]) = {
    if (!trackInertia && iters <= MaxLazyIters) {
      val steps = scala.collection.mutable.ListBuffer(init(vectors, k).persist())
      (0 until iters).foreach { _ =>
        steps += update(assign(vectors, steps.last), steps.last).persist()
      }
      val out = steps.last
      out.count() // the single materialization of the whole training chain
      steps.init.foreach(_.unpersist())
      (out, Seq.empty)
    } else if (!trackInertia) {
      // localCheckpoint (not cache+count): caching leaves the LOGICAL plan
      // intact — analysis would still traverse the whole chain every round
      // — while the eager checkpoint truncates lineage to a LogicalRDD,
      // keeping per-round plan size O(1) (same pattern as
      // ConnectedComponents' iteration). k rows per round, no data to the
      // driver.
      var cents = init(vectors, k).localCheckpoint(true)
      (0 until iters).foreach { _ =>
        cents = update(assign(vectors, cents), cents).localCheckpoint(true)
      }
      (cents, Seq.empty)
    } else {
      var cents = init(vectors, k).cache()
      val inertia = scala.collection.mutable.ListBuffer.empty[Double]
      (0 until iters).foreach { _ =>
        val assigned = assign(vectors, cents).cache()
        inertia += assigned.agg(sum("dist_sq")).collect()(0).getDouble(0)
        val next = update(assigned, cents).cache()
        next.count()
        assigned.unpersist()
        cents.unpersist()
        cents = next
      }
      (cents, inertia.toSeq)
    }
  }

  /** Sampled-fit training — the flat-cost path for the steepest term in
    * the IVF tier's scale profile (q89/q94 grow ~3.5× per data decade
    * because Lloyd scans EVERY vector every round at fixed k, while the
    * centroids a 1-in-`denom` sample produces are statistically the
    * same: Lloyd converges on cluster MEANS, and a uniform sample's
    * per-cell means concentrate around the full corpus's at O(1/√cell)
    * error — far below inter-centroid spacing for any usable cell size).
    *
    * The sample is the q49 recipe: an overflow-safe Knuth multiplicative
    * hash of `vec_id` (pre-modded by 1e9+7 so replica-offset ids ≥ 2^33
    * under ANSI mode can't overflow the multiply), keeping ids with
    * hash % denom == 0 — deterministic, parallelism-independent, no RNG.
    * Training cost drops by denom× per round; assignment of the full
    * corpus (the cheap, single-pass term) is unchanged downstream.
    *
    * Centroid-quality bound and full-set recall preservation are
    * MEASURED, not assumed, in KMeansSpec (sampled-vs-full centroid
    * displacement ≪ inter-centroid spacing; IVF recall vs exact top-k
    * preserved). Oracle queries pin the full-fit path — this is the
    * opt-in production knob. */
  def fitSampled(vectors: DataFrame, k: Int, iters: Int,
                 denom: Int = 10): (DataFrame, Seq[Double]) = {
    require(denom >= 1, "denom must be >= 1")
    val sample = vectors.filter(
      pmod(pmod(col("vec_id"), lit(1000000007L)) * 2654435761L,
        lit(1000000007L)) % denom === 0)
    fit(sample, k, iters)
  }

  /** Each vector's `nProbe` nearest cells as (vec_id, embedding, cid,
    * rn ∈ 1..nProbe) — the probe-side ranking every IVF search starts
    * with. Same aggregate-not-window shape as [[assign]] (which is the
    * nProbe = 1 case): the k-deep (dist asc, cid asc) selection runs as
    * a map-side-combining [[TopKAgg]] whose per-vector state is nProbe
    * (score, cid) pairs, so the N×k cross-join stream never reaches an
    * exchange or a sort. */
  def probeCells(vectors: DataFrame, centroids: DataFrame, nProbe: Int): DataFrame = {
    val spark = vectors.sparkSession
    vectors.crossJoin(broadcast(centroids))
      .withColumn("dist_sq", NativeVecFns.l2DistSq(spark, col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(
        graft.expr.TopKAgg.topKByScore(spark,
          negate(col("dist_sq")), col("cid").cast("long"), nProbe).as("top"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("embedding"),
        col("t.id").cast(centroids.schema("cid").dataType).as("cid"),
        (col("pos") + 1).as("rn"))
  }

  /** IVF search: restrict the exact search to the `nProbe` centroids
    * nearest the query side — the candidate join keys on cid, replacing
    * the all-pairs cross join. */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val spark = vectors.sparkSession
    val cand = probeCells(vectors, centroids, nProbe)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("cid"))
    val cells = assign(vectors, centroids)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("cid"))
    val pairs = cand.join(cells, Seq("cid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("b_emb"))
          / (NativeVecFns.norm(spark, col("a_emb")) * NativeVecFns.norm(spark, col("b_emb"))))
    pairs.groupBy("a_id")
      .agg(graft.expr.TopKAgg.topKByScore(spark, col("sim"), col("b_id"), k).as("top"))
      .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), col("t.score").as("cosine_sim"))
  }
}
