package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.{NativeVecFns, TopKAgg}

/** Incremental IVF (inverted-file) ANN index maintenance — the embedding
  * twin of [[IncrementalDedup]]'s maintained edge store: ingest delta
  * vectors into a TRAINED index without retraining the quantizer.
  *
  * Store layout (two parquet tables under one root):
  *  - `centroids/` — the frozen coarse quantizer (cid, centroid), k rows,
  *    trained ONCE on the seed corpus by [[graft.ml.KMeans.fit]]. Broadcast
  *    at every use; never grows.
  *  - `index/` — the inverted lists (vec_id, embedding, nrm, cid),
  *    PARTITIONED BY (ingest_batch, cid): the outer level makes batch
  *    replays idempotent (dynamic partition overwrite keyed by batch id,
  *    the [[IncrementalDedup.ingestBatch]] recipe), the inner level means
  *    a cell-targeted read touches only its cells' files.
  *
  * The invariant that makes incremental maintenance EXACT (not an
  * approximation): with the quantizer frozen, a vector's cell assignment
  * is a pure function of (vector, centroids) — existing index rows can
  * never move cells when a delta arrives, so
  * `index(state ∪ delta) ≡ assign(state ∪ delta, centroids)` — precisely
  * the from-scratch rebuild against the same quantizer
  * (spec-proven in IncrementalIvfSpec; q94 hash-proves search results
  * against a DuckDB oracle that replays training + assignment). This is
  * how production IVF deployments run at 100 TB: the quantizer retrains
  * per corpus snapshot, while vectors stream into cells continuously.
  */
object IncrementalIvf {

  /** Seed the store: train the coarse quantizer on the state corpus
    * (deterministic k-means init — the k lowest-id vectors), freeze it
    * under `root/centroids`, and write the state's inverted lists under
    * `ingest_batch=-1`. The index write inherits the assignment's full
    * parallelism — no single-task funnel (the edge-store lesson). */
  def writeIndex(state: DataFrame, root: String,
                 k: Int, iters: Int): Unit = {
    val (cents, _) = graft.ml.KMeans.fit(state, k, iters)
    // k rows by construction — the one legitimately tiny table here
    cents.coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    assignTo(state, cents).withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch", "cid")
      .parquet(s"$root/index")
    cents.unpersist()
    ()
  }

  /** The frozen quantizer (cid, centroid). */
  def centroids(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/centroids")

  /** Nearest-cell assignment against a quantizer frame — delegates to
    * the same ranked-probe kernel q89 searches with
    * ([[graft.queries.EmbeddingQueries.ivfRanked]], rn = 1), so the
    * store's assignment tiebreak (dist asc, cid asc) cannot diverge from
    * the search path's. */
  private def assignTo(vecs: DataFrame, cents: DataFrame): DataFrame =
    graft.queries.EmbeddingQueries.ivfRanked(vecs, cents, nprobe = 1)
      .select("vec_id", "embedding", "nrm", "cid")

  /** Ingest one delta batch IDEMPOTENTLY and WITHOUT retraining: assign
    * the delta to the frozen quantizer's cells and dynamic-overwrite
    * exactly this batch's partitions — an at-least-once replay replaces
    * its own rows instead of appending a second copy. Cost per ingest:
    * O(|delta| · k) distance evaluations + a delta-sized write; the
    * existing index is never read, shuffled, or rewritten. */
  def ingestBatch(spark: SparkSession, root: String, delta: DataFrame,
                  batchId: Long): Unit = {
    assignTo(delta, centroids(spark, root))
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "cid").parquet(s"$root/index")
    ()
  }

  /** The maintained inverted index: every ingested vector with its cell. */
  def index(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/index").select("vec_id", "embedding", "nrm", "cid")

  /** IVF top-k cosine search over the maintained index with the frozen
    * quantizer: each probe ranks its `nprobe` nearest cells (broadcast
    * k-row centroid frame), candidates come from a cid equi-join against
    * the inverted lists (cost |index| · nprobe / k — never
    * probes × index), exact-cosine rerank keeps `topK` per probe via the
    * bounded-state [[TopKAgg]]. Output shape = q89's
    * (vec_id, neighbor_id, rank, cosine_sim). */
  def search(spark: SparkSession, root: String, probes: DataFrame,
             nprobe: Int, topK: Int): DataFrame = {
    val ranked = graft.queries.EmbeddingQueries
      .ivfRanked(probes, centroids(spark, root), nprobe)
    val build = index(spark, root).select(col("cid"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    ranked.select(col("cid"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      .join(build, Seq("cid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), topK).as("top"))
      .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("cosine_sim"))
  }
}
