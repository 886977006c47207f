package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VecFns
import graft.expr.{NativeVecFns, TopKAgg}

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (`vec_id, embedding: array<float>[64], label`) —
  * the training-pipeline similarity ops of SURVEY §7.1 step 7.
  *
  * Three tiers:
  *  - q31: brute-force cosine top-k — the correctness baseline; O(N²)
  *    pairs, feasible at verify scale and the reference for recall.
  *  - q32: random-hyperplane LSH — the scale path: bucket on an
  *    8-bit signature, search only within buckets (the join shuffles on
  *    the bucket key; expected bucket size N/256 at 100 TB, so the
  *    quadratic term drops by ~256²/256 = 256×).
  *  - q33: IVF-style coarse quantization — centroids from the `label`
  *    partition, nearest-centroid assignment (broadcast 10×64 floats).
  */
object EmbeddingQueries {

  private[graft] val Dim = 64

  /** Brute-force (exact) cosine top-3 per vector, via the dense-compute
    * tier [[graft.ml.BlockTopK]]: the probe side streams once against a
    * broadcast pre-normalized build side and only k rows per vector ever
    * exist — a relational pair join would materialize all N·(N−1) rows
    * (each carrying two 64-float arrays) just for the aggregate to throw
    * all but k away (~3× slower at sf0.1, measured). Scores and
    * tiebreaks are bit-identical to the relational TopKAgg formulation
    * (BlockTopKSpec) — the relational plan shape stays oracle-covered in
    * q32's bucket join. Beyond one broadcast budget the sharded variant
    * (`cosineTopKSharded`) is the same kernel. */
  def q31CosineTopK(spark: SparkSession, dir: String): DataFrame =
    graft.ml.BlockTopK.cosineTopK(Tables.embeddings(spark, dir), 3)
      .toDF()
      .withColumn("cosine_sim", round(col("cosine_sim"), 4))

  val q31CosineTopKSql: String = {
    val dot = VecFns.ddbDot("a.embedding", "b.embedding", Dim)
    val na = VecFns.ddbNorm("a.embedding", Dim)
    val nb = VecFns.ddbNorm("b.embedding", Dim)
    s"""WITH sims AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $dot / ($na * $nb) AS sim
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS cosine_sim
       |FROM (
       |  SELECT vec_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims
       |) WHERE rank <= 3""".stripMargin
  }

  /** LSH-bucketed ANN, parameterized on the plane count: `nbits`
    * random-hyperplane bits → bucket; exact cosine rerank *within* each
    * bucket, top-k. The bucket equi-join replaces q31's cross join —
    * this is the plan shape that survives 100 TB, PROVIDED nbits scales
    * with the corpus: a fixed width is N²/2^bits candidate growth, so
    * production callers derive it via [[VecFns.lshBitsFor]] (bucket
    * count linear in N, per-bucket work O(target²)); the oracle pins
    * nbits = 8 for a byte-stable DuckDB twin. Bit-width invariance of
    * the plan shape and the per-bucket candidate bound are spec-asserted
    * (EmbeddingQueriesSpec). */
  def annLshBucketed(df: DataFrame, nbits: Int = -1, k: Int = 3): DataFrame = {
    val spark = df.sparkSession
    // DEFAULT PATH = the derived width (r11 flip): callers who don't pin
    // nbits get `lshBitsFor`'s corpus-scaled bucket count — the
    // configuration a deployment should run — while the gate queries pin
    // their widths explicitly for byte-stable oracles. The derivation
    // floors at 8 bits, so at gate SFs default ≡ q32's pinned plan.
    val bits = if (nbits > 0) nbits else VecFns.lshBitsFor(df.count())
    val e = df.select(
      col("vec_id"), col("embedding"),
      NativeVecFns.norm(spark, col("embedding")).as("nrm"),
      NativeVecFns.rhpBucket(spark, col("embedding"), bits).as("bucket"))
    val a = e.select(col("bucket"), col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = e.select(col("bucket"), col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val sims = a.join(b, Seq("bucket"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim", NativeVecFns.dot(spark, col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
    sims.groupBy("a_id", "bucket")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), k).as("top"))
      .select(col("a_id"), col("bucket"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("a_id").as("vec_id"), col("bucket"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("cosine_sim"))
  }

  def q32AnnLsh(spark: SparkSession, dir: String): DataFrame =
    annLshBucketed(Tables.embeddings(spark, dir), nbits = 8, k = 3)

  /** q117: the LSH WIDTH LEVER under the oracle gate — q32's exact
    * operator at nbits = 12, the width `VecFns.lshBitsFor` derives for
    * the sf10 corpus (200k vectors / 64-per-bucket target → 4096
    * buckets). q32's pinned nbits = 8 is right at the gate scale but
    * quadratic-over-fixed-width at sf10 (N²/256 candidate pairs —
    * measured 87.6 s, BASELINE.md); this query pins the SAME semantics
    * one width up, so the production fix is itself oracle-proven and
    * benched at every SF. At toy scale the wider buckets are simply
    * sparser (fewer candidate pairs, same correctness rule). */
  def q117AnnLshWide(spark: SparkSession, dir: String): DataFrame =
    annLshBucketed(Tables.embeddings(spark, dir), nbits = 12, k = 3)

  val q117AnnLshWideSql: String = {
    val bucket = VecFns.ddbRhpBucket("embedding", Dim, 12)
    val dot = VecFns.ddbDot("a.embedding", "b.embedding", Dim)
    val na = VecFns.ddbNorm("a.embedding", Dim)
    val nb = VecFns.ddbNorm("b.embedding", Dim)
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings
       |),
       |sims AS (
       |  SELECT a.vec_id AS vec_id, a.bucket AS bucket, b.vec_id AS neighbor_id,
       |    $dot / ($na * $nb) AS sim
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |)
       |SELECT vec_id, bucket, neighbor_id, rank, round(sim, 4) AS cosine_sim
       |FROM (
       |  SELECT vec_id, bucket, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims
       |) WHERE rank <= 3""".stripMargin
  }

  val q32AnnLshSql: String = {
    val bucket = VecFns.ddbRhpBucket("embedding", Dim, 8)
    val dot = VecFns.ddbDot("a.embedding", "b.embedding", Dim)
    val na = VecFns.ddbNorm("a.embedding", Dim)
    val nb = VecFns.ddbNorm("b.embedding", Dim)
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings
       |),
       |sims AS (
       |  SELECT a.vec_id AS vec_id, a.bucket AS bucket, b.vec_id AS neighbor_id,
       |    $dot / ($na * $nb) AS sim
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |)
       |SELECT vec_id, bucket, neighbor_id, rank, round(sim, 4) AS cosine_sim
       |FROM (
       |  SELECT vec_id, bucket, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims
       |) WHERE rank <= 3""".stripMargin
  }

  /** Multi-probe RHP-LSH (recall knob for q32's single-probe scheme):
    * each query vector probes its own bucket PLUS the `probes` buckets at
    * Hamming distance 1 (one signature bit flipped — the nearest-boundary
    * buckets), then exact-cosine reranks the union of candidates to a
    * global top-k. Single-probe recall suffers exactly when a true
    * neighbor falls on the far side of one hyperplane; flip-1 probing
    * recovers those at `probes+1`× candidate cost — still a bucket
    * equi-join (the probe side explodes ≤ probes+1 rows per vector), no
    * cross join, so the 100 TB shape is unchanged.
    *
    * Recall floor on clustered data is spec-asserted
    * (EmbeddingQueriesSpec); on unstructured embeddings (like the
    * synthetic testdata set — measured near-chance cosine structure) no
    * LSH family separates neighbors, which is a property of the data,
    * not the operator. */
  def annLshMultiProbe(df: DataFrame, dim: Int, nbits: Int, k: Int, probes: Int): DataFrame = {
    require(probes >= 0 && probes <= nbits, s"probes must be in [0, $nbits]")
    val spark = df.sparkSession
    val e = df.select(
      col("vec_id"), col("embedding"),
      NativeVecFns.norm(spark, col("embedding")).as("nrm"),
      NativeVecFns.rhpBucket(spark, col("embedding"), nbits).as("bucket"))
    // distinct by construction: own bucket + single-bit flips
    val probeBuckets = array(
      col("bucket") +: (0 until probes).map(i => col("bucket").bitwiseXOR(lit(1 << i))): _*)
    val a = e.select(explode(probeBuckets).as("bucket"),
      col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = e.select(col("bucket"),
      col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val sims = a.join(b, Seq("bucket"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim", NativeVecFns.dot(spark, col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
    sims.groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), k).as("top"))
      .select(col("a_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("a_id").as("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), col("t.score").as("cosine_sim"))
  }

  /** Multi-probe LSH under the oracle gate (probes = 2): each vector
    * probes its own bucket plus the two flip-1-bit buckets (bits 0 and
    * 1); the DuckDB twin computes the identical probe set via `xor`,
    * proving the recall knob end-to-end — candidate generation, rerank,
    * and tiebreaks — not just the plan shape. */
  def q71AnnMultiProbe(spark: SparkSession, dir: String): DataFrame =
    annLshMultiProbe(Tables.embeddings(spark, dir), Dim, nbits = 8, k = 3, probes = 2)
      .withColumn("cosine_sim", round(col("cosine_sim"), 4))

  val q71AnnMultiProbeSql: String = {
    val bucket = VecFns.ddbRhpBucket("embedding", Dim, 8)
    val dot = VecFns.ddbDot("a.embedding", "b.embedding", Dim)
    val na = VecFns.ddbNorm("a.embedding", Dim)
    val nb = VecFns.ddbNorm("b.embedding", Dim)
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings
       |),
       |p AS (
       |  SELECT vec_id, embedding,
       |    unnest([bucket, xor(bucket, 1), xor(bucket, 2)]) AS bucket
       |  FROM e
       |),
       |sims AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $dot / ($na * $nb) AS sim
       |  FROM p a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS cosine_sim
       |FROM (
       |  SELECT vec_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims
       |) WHERE rank <= 3""".stripMargin
  }

  /** Embedding-cosine near-dup — the similarity-space member of the
    * dedup family (exact q23, MinHash q30, SimHash q29, n-gram q27):
    * LSH-blocked candidate pairs above a cosine threshold form a graph
    * whose components are duplicate clusters; every vector keeps the
    * component-minimum id as canonical. Blocking is q32's bucket
    * equi-join; the closure runs the large-star/small-star engine: a
    * cosine threshold over weakly-structured embeddings yields
    * CHAIN-like graphs (measured diameter 11 at sf0.1, growing with
    * corpus size), where star's O(log²)-round bound beats
    * diameter-bound propagation (measured 1.9 s vs 2.5 s) — q48 keeps
    * propagation because shingle-cluster graphs stay shallow. The 0.28
    * threshold clears every observed sim by ≥1.5e-7 across sf0.001-0.1
    * (measured) — cross-engine classify-flip safe.
    * Oracle: identical blocking in DuckDB + recursive-CTE closure
    * (components are unique, so the closure engine cannot show). */
  /** LSH-blocked above-threshold candidate pairs (src < dst), the edge
    * builder behind q53's closure. `nbits` is the corpus-size knob (see
    * [[annLshBucketed]]'s scale note / [[VecFns.lshBitsFor]]). */
  def embedNearDupPairs(df: DataFrame, nbits: Int, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    val e = df.select(
      col("vec_id"), col("embedding"),
      NativeVecFns.norm(spark, col("embedding")).as("nrm"),
      NativeVecFns.rhpBucket(spark, col("embedding"), nbits).as("bucket"))
    val a = e.select(col("bucket"), col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = e.select(col("bucket"), col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", NativeVecFns.dot(spark, col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("sim") > threshold)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
  }

  /** Write-once embedding similarity-graph edge store — the q53 twin of
    * the text tier's `nearDupEdges` (r7's fix for the same cost class):
    * the LSH-blocked ≥0.28 pair set is a property of the corpus
    * snapshot, built ONCE per (process, dir) and read back as a tiny
    * parquet by every downstream run, so repeat executions (bench reps,
    * multiple graph consumers) pay a parquet re-scan instead of the full
    * signature + bucket-join derivation. Incremental refresh under
    * deltas follows the `IncrementalDedup.ingestBatchWithEdges` pattern
    * (signatures are pure functions of the embedding, so state–state
    * edges are immutable). */
  private val embedEdgeStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def embedNearDupEdges(spark: SparkSession, dir: String): DataFrame = {
    val root = embedEdgeStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("embededges", d)
      embedNearDupPairs(Tables.embeddings(spark, d), nbits = 8, threshold = 0.28)
        // corpus-sized on near-dup-heavy data — same no-single-task-write
        // contract as the text edge stores (src-range layout)
        .repartitionByRange(
          spark.sessionState.conf.numShufflePartitions, col("src"))
        .write.mode("overwrite").parquet(r)
      r
    })
    spark.read.parquet(root)
  }

  def q53EmbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = embedNearDupEdges(spark, dir)
    val verts = Tables.embeddings(spark, dir).select(col("vec_id").as("id"))
    graft.ml.ConnectedComponents.componentsStar(verts, pairs)
      .select(col("id").as("vec_id"), col("component").as("canonical_id"),
        (col("id") =!= col("component")).as("is_duplicate"))
  }

  val q53EmbedNearDupSql: String = {
    val bucket = VecFns.ddbRhpBucket("embedding", Dim, 8)
    // fast shapes (r15): pre-cast DOUBLE[Dim] arrays + per-vector norms
    // + array-kernel dots make the 78M-pair bucket join feasible at
    // sf10 (the inline-norm lambda form was 3 folds per pair — over
    // the 1500 s cap). The RHP bucket alone keeps the bit-exact lambda
    // fold: a hyperplane sign boundary has no margin guarantee.
    // Closure: two EXACT min-contraction rounds (m1/m2 — map every
    // vertex to the min of its closed neighborhood; components and
    // their minima are invariant under this, since the mapped label is
    // inside the component and the component minimum maps to itself)
    // run BEFORE the recursive reach. Without them the reach table is
    // Σ|comp|² pairs — at sf10 the near-dup graph is 341 components,
    // the largest 5.4k vertices (~10⁹ pairs, infeasible); dense
    // components collapse to a handful of local minima per round, so
    // the recursion closes over the tiny quotient and the per-vertex
    // canonical composes back through lab = m2 ∘ m1.
    s"""WITH RECURSIVE e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[$Dim] AS emb,
       |    sqrt(array_inner_product(embedding::DOUBLE[$Dim], embedding::DOUBLE[$Dim])) AS nrm,
       |    $bucket AS bucket
       |  FROM embeddings
       |),
       |cand AS MATERIALIZED (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE array_inner_product(a.emb, b.emb) / (a.nrm * b.nrm) > 0.28
       |),
       |bi AS MATERIALIZED (
       |  SELECT va AS s, vb AS t FROM cand
       |  UNION
       |  SELECT vb AS s, va AS t FROM cand
       |),
       |m1 AS MATERIALIZED (
       |  SELECT v.vec_id AS v, least(v.vec_id, coalesce(min(bi.t), v.vec_id)) AS l
       |  FROM embeddings v LEFT JOIN bi ON bi.s = v.vec_id
       |  GROUP BY v.vec_id
       |),
       |e1 AS MATERIALIZED (
       |  SELECT DISTINCT a.l AS s, b.l AS t
       |  FROM bi JOIN m1 a ON bi.s = a.v JOIN m1 b ON bi.t = b.v
       |  WHERE a.l <> b.l
       |),
       |m2 AS MATERIALIZED (
       |  SELECT n.v AS v, least(n.v, coalesce(min(e1.t), n.v)) AS l
       |  FROM (SELECT DISTINCT l AS v FROM m1) n LEFT JOIN e1 ON e1.s = n.v
       |  GROUP BY n.v
       |),
       |e2 AS MATERIALIZED (
       |  SELECT DISTINCT a.l AS s, b.l AS t
       |  FROM e1 JOIN m2 a ON e1.s = a.v JOIN m2 b ON e1.t = b.v
       |  WHERE a.l <> b.l
       |),
       |reach(s, t) AS (
       |  SELECT s, t FROM e2
       |  UNION
       |  SELECT r.s, e2.t FROM reach r JOIN e2 ON r.t = e2.s
       |),
       |lab AS MATERIALIZED (
       |  SELECT m1.v AS v, m2.l AS l FROM m1 JOIN m2 ON m2.v = m1.l
       |),
       |cq AS MATERIALIZED (
       |  SELECT n.l AS l, least(n.l, coalesce(min(r.t), n.l)) AS c
       |  FROM (SELECT DISTINCT l FROM lab) n LEFT JOIN reach r ON r.s = n.l
       |  GROUP BY n.l
       |)
       |SELECT v.vec_id,
       |  cq.c AS canonical_id,
       |  v.vec_id <> cq.c AS is_duplicate
       |FROM embeddings v JOIN lab ON lab.v = v.vec_id JOIN cq ON cq.l = lab.l""".stripMargin
  }

  /** IVF-style coarse quantization: per-label centroids (posexplode →
    * groupBy(label, pos) avg → rebuilt in pos order), broadcast to every
    * vector, nearest centroid by squared L2. Output distances rounded —
    * centroid sums are shuffle-order-dependent in their last bits, but
    * 4-decimal rounding and inter-centroid margins absorb that. */
  def q33IvfCentroid(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x").cast("double")).as("c"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label").as("c_label"), transform(col("pc"), p => p("c")).as("centroid"))
    // aggregate-not-window argmin (the r14 spill fix — KMeans.assign's
    // shape): map-side combine instead of exchanging + sorting N×k rows
    val best = e.select(col("vec_id"), col("label"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("dist_sq", NativeVecFns.l2DistSq(spark, col("embedding"), col("centroid")))
      .groupBy(col("vec_id"), col("label"))
      .agg(graft.expr.TopKAgg.topKByScore(spark,
        negate(col("dist_sq")), col("c_label").cast("long"), 1).as("top"))
    best
      .select(col("vec_id"), col("label"),
        element_at(col("top"), 1).getField("id").cast("int").as("nearest_label"),
        round(negate(element_at(col("top"), 1).getField("score")), 4).as("dist_sq"))
      .withColumn("is_own_cluster", col("nearest_label") === col("label"))
  }

  val q33IvfCentroidSql: String = {
    val dist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", Dim)
    s"""WITH cd AS (
       |  SELECT label, pos, avg(x) AS c
       |  FROM (SELECT label, unnest(embedding)::DOUBLE AS x,
       |               generate_subscripts(embedding, 1) AS pos
       |        FROM embeddings)
       |  GROUP BY label, pos
       |),
       |cents AS (
       |  SELECT label AS c_label, list(c ORDER BY pos) AS centroid FROM cd GROUP BY label
       |),
       |dists AS (
       |  SELECT e.vec_id, e.label, c.c_label, $dist AS dist_sq
       |  FROM embeddings e CROSS JOIN cents c
       |)
       |SELECT vec_id, label, c_label AS nearest_label,
       |  round(dist_sq, 4) AS dist_sq,
       |  c_label = label AS is_own_cluster
       |FROM (
       |  SELECT vec_id, label, c_label, dist_sq,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist_sq ASC, c_label ASC) AS rn
       |  FROM dists
       |) WHERE rn = 1""".stripMargin
  }

  /** k-means coarse-quantizer TRAINING, materialized once per (process,
    * data dir): [[graft.ml.KMeans.fit]] with deterministic init (the k
    * lowest-id vectors), `SemKIters` Lloyd rounds, written to a
    * write-once parquet store — the offline index build an IVF/SemDeDup
    * deployment runs once per corpus snapshot, not per query (same
    * pattern as the near-dup edge store and the incremental-dedup
    * signature store). k is a REAL knob: independent of any schema
    * accident like label cardinality. */
  private[graft] val SemK = 32
  private[graft] val SemKIters = 2
  private val centroidStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def trainedCentroids(spark: SparkSession, dir: String): DataFrame = {
    val root = centroidStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("kmeans", d)
      val vecs = Tables.embeddings(spark, d).select("vec_id", "embedding")
      val (cents, _) = graft.ml.KMeans.fit(vecs, SemK, SemKIters)
      cents.coalesce(1).write.mode("overwrite").parquet(r)
      cents.unpersist()
      r
    })
    spark.read.parquet(root)
  }

  /** The PRODUCTION quantizer build, materialized once per (process,
    * dir) like [[trainedCentroids]]: k derived from the corpus
    * ([[graft.operators.IncrementalIvf.kFor]] — the √N cell rule, so
    * per-cell candidate load stays ≈√N as the corpus grows) and Lloyd
    * run on [[graft.ml.KMeans.fitSampled]]'s deterministic 1-in-4
    * multiplicative-hash sample (training cost ÷4 per round; the
    * centroid-displacement and recall-preservation bounds are measured
    * in KMeansSpec). q89/q94 pin (k = 32, full fit) as gate semantics;
    * q118 puts THIS configuration — the one a 100 TB deployment would
    * actually run — under the same oracle gate. */
  private val scaledCentroidStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def scaledCentroids(spark: SparkSession, dir: String): DataFrame = {
    val root = scaledCentroidStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("kmeansscaled", d)
      val vecs = Tables.embeddings(spark, d).select("vec_id", "embedding")
      val k = graft.operators.IncrementalIvf.kFor(vecs.count())
      val (cents, _) = graft.ml.KMeans.fitSampled(vecs, k, SemKIters, denom = 4)
      cents.coalesce(1).write.mode("overwrite").parquet(r)
      cents.unpersist()
      r
    })
    spark.read.parquet(root)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * cluster the embedding space coarsely with TRAINED k-means centroids
    * (k = [[SemK]] = 32, [[trainedCentroids]] — the published method's
    * k-means, not a schema-derived proxy), then prune, WITHIN each
    * cluster only, every vector that has a lower-id near-duplicate above
    * the cosine threshold. Greedy keep-lowest-id is the published
    * tie-break made deterministic; unlike q53's closure this is a single
    * semi-join — no iteration. Oracle: the FULL training replayed in
    * DuckDB — deterministic init + both Lloyd rounds unrolled as CTEs —
    * then the identical assignment and prune.
    *
    * 100 TB shape: centroids broadcast (k×dim, not corpus); the pairwise
    * cosine runs INSIDE clusters only — k is the knob that bounds the
    * quadratic term (the published method's property), and the pair join
    * is an equi-join on the cluster key, never corpus×corpus. Threshold
    * 0.28 = q53's measured classify-flip-safe margin. Cross-engine float
    * safety re-measured for the trained-centroid form at sf0.01: the
    * final-assignment argmin margin (2nd-best − best distance) is
    * ≥ 6.7e-4 and the prune threshold clears every intra-cluster pair by
    * ≥ 2.5e-5 — both ≥9 orders above summation-order wobble. */
  def q74SemDedup(spark: SparkSession, dir: String): DataFrame =
    semDedupWith(spark, Tables.embeddings(spark, dir),
      trainedCentroids(spark, dir))

  /** q119: SemDeDup at the PRODUCTION quantizer — q74's exact prune
    * semantics over [[scaledCentroids]] (k = `kFor(N)` √N cells, Lloyd
    * on the deterministic 1-in-4 sample). The third and last
    * fixed-width row of the sf10 scaling table closed under the gate
    * (q32→q117 for LSH width, q89→q118 for IVF cells, q74→this for
    * SemDeDup clusters): intra-cluster pair cost drops from Σ(N/32)²
    * to Σ(N/√N)² = N·(N/k), and the DuckDB oracle replays the sampled
    * √N training + identical prune, cell-exact. */
  def q119SemDedupScaled(spark: SparkSession, dir: String): DataFrame =
    semDedupWith(spark, Tables.embeddings(spark, dir),
      scaledCentroids(spark, dir))

  private def semDedupWith(spark: SparkSession, e: DataFrame,
                           centroids: DataFrame): DataFrame = {
    // aggregate-not-window argmin (KMeans.assign — the r14 spill fix):
    // at q119's k = √N the window form exchanged + sorted N·√N rows
    val asg = graft.ml.KMeans.assign(
        e.select(col("vec_id"), col("embedding")), centroids)
      .select(col("vec_id"), col("embedding"),
        NativeVecFns.norm(spark, col("embedding")).as("nrm"), col("cid").as("cluster"))
      // feeds both sides of the intra-cluster pair join
      .persist()
    val pruned = asg.as("a")
      .join(asg.as("b"),
        col("a.cluster") === col("b.cluster") && col("b.vec_id") < col("a.vec_id"))
      .filter(NativeVecFns.dot(spark, col("a.embedding"), col("b.embedding"))
        / (col("a.nrm") * col("b.nrm")) > 0.28)
      .select(col("a.vec_id").as("vec_id")).distinct()
      .withColumn("is_pruned", lit(true))
    asg.join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("is_pruned"), lit(false)).as("is_pruned"))
  }

  /** WITH-body CTE chain replaying [[trainedCentroids]]'s full k-means
    * training in DuckDB over source relation `src` — deterministic init
    * (`c0` = the [[SemK]] lowest-id vectors) + [[SemKIters]] unrolled
    * Lloyd rounds — ending in `c2` = the trained centroid table. Shared
    * by the q74 and q89 oracles (src = the full `embeddings` view) and
    * the q94 oracle (src = the seed subset the incremental store trained
    * on). */
  private def kmeansTrainSqlCtesOver(src: String, kLimit: String = SemK.toString,
                                     dim: Int = Dim, suffix: String = ""): String = {
    val dist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", dim)
    // one Lloyd round: nearest-centroid assignment (deterministic (dist,
    // cid) tiebreak, mirroring KMeans.assign), per-(cid, pos) mean,
    // empty clusters keep the previous centroid (KMeans.update)
    def lloyd(prevC: String, asgCte: String, freshCte: String, outCte: String): String =
      s"""$asgCte AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT e.vec_id, e.embedding, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $dist ASC, c.cid ASC) AS rn
         |    FROM $src e CROSS JOIN $prevC c
         |  ) WHERE rn = 1
         |),
         |$freshCte AS (
         |  SELECT cid, list(c ORDER BY pos) AS centroid FROM (
         |    SELECT cid, pos, avg(x) AS c
         |    FROM (SELECT cid, unnest(embedding)::DOUBLE AS x,
         |                 generate_subscripts(embedding, 1) AS pos
         |          FROM $asgCte)
         |    GROUP BY cid, pos
         |  ) GROUP BY cid
         |),
         |$outCte AS (
         |  SELECT p.cid, coalesce(f.centroid, p.centroid) AS centroid
         |  FROM $prevC p LEFT JOIN $freshCte f ON p.cid = f.cid
         |)""".stripMargin
    s"""c0$suffix AS (
       |  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INTEGER AS cid,
       |    list_transform(embedding, x -> x::DOUBLE) AS centroid
       |  FROM $src ORDER BY vec_id LIMIT $kLimit
       |),
       |${lloyd(s"c0$suffix", s"a1$suffix", s"f1$suffix", s"c1$suffix")},
       |${lloyd(s"c1$suffix", s"a2$suffix", s"f2$suffix", s"c2$suffix")}""".stripMargin
  }

  private val kmeansTrainSqlCtes: String = kmeansTrainSqlCtesOver("embeddings")

  /** The q118/q119 PRODUCTION training chain: `fitSampled`'s
    * deterministic 1-in-4 multiplicative-hash sample as a CTE (`vec_id`
    * pre-modded by 1e9+7 — the overflow-safe q49 recipe, bit-identical
    * across engines on nonnegative ids), k = ⌈√N⌉ of the FULL corpus
    * via a scalar-subquery LIMIT mirroring [[graft.operators
    * .IncrementalIvf.kFor]] INCLUDING its [4, 2^18] clamp
    * (GREATEST/LEAST — unreachable for gate corpora, but the twins must
    * not diverge on a tiny or huge one), then the same two unrolled
    * Lloyd rounds over the sample. */
  private val sampledScaledTrainSqlCtes: String =
    s"""kv AS (SELECT GREATEST(4, LEAST(262144, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS k FROM embeddings),
       |smp AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE ((vec_id % 1000000007) * 2654435761) % 1000000007 % 4 = 0
       |),
       |${kmeansTrainSqlCtesOver("smp", kLimit = "(SELECT k FROM kv)")}""".stripMargin

  // ────────── fast-shape oracle twins (r15: the sf10 feasibility fix) ──────────

  /** DuckDB fast-shape builders for the four oracles that were "oracle
    * infeasible at sf10" (q53/q94/q118/q119, CORRECTNESS_sf10 r13/r14).
    * The straight relational replay died on SHAPE, not on fundamental
    * cost: (1) the Lloyd/assignment windows dragged the 64-float
    * embedding list through a `row_number` partition over the N×k
    * candidate stream (the q92 wide-row-window lesson — ~500 B/row
    * through DuckDB's external sort was the "allocator OOM at 200k
    * vectors"), and (2) every distance was a `list_reduce` lambda fold
    * (~1.1M evals/s system-wide), which at q94's 2.5B-pair tail is
    * ~40 min alone. The fast twins fix the shape: embeddings cast ONCE
    * to a fixed-size `DOUBLE[dim]` ARRAY in a MATERIALIZED CTE with the
    * norm precomputed per vector (not per pair), distances through
    * DuckDB's native `array_distance`/`array_inner_product` kernels,
    * and every window fed a NARROW (vec_id, cid, dist) projection with
    * the embedding joined back afterwards. Measured at sf10 (200k
    * vectors): q118's FULL training+search replay drops from OOM to
    * 89 s; q94's 2.5B-pair rerank from ~2200 s to ~620 s.
    *
    * Float-safety: the array kernels sum in a different association
    * order than the left-fold lambdas (which mirror the Spark fold
    * bit-exactly), so distances/sims wobble ~1e-13 relative. That is
    * 5-9 orders below every margin the cross-engine analysis already
    * relies on (assignment argmin ≥ 6.7e-4, probe boundary ≥ 1.1e-4,
    * threshold clearance ≥ 1.5e-7) and smaller in kind than the
    * avg()-order wobble the training replay has always tolerated
    * (centroid sums are engine-ordered on both engines). The ONE
    * computation kept in lambda form is q53's RHP bucket: a hyperplane
    * sign boundary has no margin guarantee, so its dot keeps the
    * bit-exact fold order. The slow twins stay in place for every
    * other consumer (q74/q89/the PQ subspace chains) — fast/slow pairs
    * must stay semantically identical; the gate cross-checks both
    * against the same Spark results at every SF. */
  private def embdFastCte(dim: Int, src: String = "embeddings"): String =
    s"""embd AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[$dim] AS emb,
       |    sqrt(array_inner_product(embedding::DOUBLE[$dim], embedding::DOUBLE[$dim])) AS nrm
       |  FROM $src
       |)""".stripMargin

  /** Fast twin of [[kmeansTrainSqlCtesOver]]: `src` must provide
    * (vec_id, emb DOUBLE[dim]); ends in `c2` with `centroid` as a
    * DOUBLE[dim] array. Carryover of empty clusters is UNION ALL +
    * ANTI JOIN because DuckDB 1.0's `coalesce` is unimplemented for
    * fixed-size arrays — same set as the slow twin's LEFT JOIN +
    * coalesce (cid is unique on both sides). */
  private def kmeansTrainFastSqlCtesOver(src: String, kLimit: String, dim: Int): String = {
    def lloyd(prev: String, n: Int): String =
      s"""a$n AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
         |    FROM (SELECT e.vec_id, c.cid, array_distance(e.emb, c.centroid) AS d
         |          FROM $src e CROSS JOIN $prev c) nd
         |  ) WHERE rn = 1
         |),
         |f$n AS (
         |  SELECT cid, list(c ORDER BY pos)::DOUBLE[$dim] AS centroid FROM (
         |    SELECT cid, pos, avg(x) AS c FROM (
         |      SELECT a.cid AS cid, unnest(e.emb::DOUBLE[]) AS x,
         |             generate_subscripts(e.emb::DOUBLE[], 1) AS pos
         |      FROM a$n a JOIN $src e ON e.vec_id = a.vec_id) u
         |    GROUP BY cid, pos) g
         |  GROUP BY cid
         |),
         |c$n AS MATERIALIZED (
         |  SELECT cid, centroid FROM f$n
         |  UNION ALL
         |  SELECT p.cid, p.centroid FROM c${n - 1} p ANTI JOIN f$n f ON p.cid = f.cid
         |)""".stripMargin
    s"""c0 AS MATERIALIZED (
       |  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INTEGER AS cid, emb AS centroid
       |  FROM (SELECT * FROM $src ORDER BY vec_id LIMIT $kLimit) s0
       |),
       |${lloyd("c0", 1)},
       |${lloyd("c1", 2)}""".stripMargin
  }

  /** Fast twin of [[sampledScaledTrainSqlCtes]] — sample drawn from the
    * pre-cast `embd` CTE (same ids, same doubles). */
  private val sampledScaledTrainFastSqlCtes: String =
    s"""kv AS (SELECT GREATEST(4, LEAST(262144, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS k FROM embeddings),
       |smp AS MATERIALIZED (
       |  SELECT vec_id, emb FROM embd
       |  WHERE ((vec_id % 1000000007) * 2654435761) % 1000000007 % 4 = 0
       |),
       |${kmeansTrainFastSqlCtesOver("smp", "(SELECT k FROM kv)", Dim)}""".stripMargin

  /** Fast twin of [[ivfSearchSqlOver]]'s probe/rerank tail: narrow
    * ranked window, embeddings joined back, array-kernel sims.
    *
    * `histCutoff` replaces the single global rank window with an exact
    * two-pass top-k: q94's k = 32 cells hold ~6250 members at sf10, so
    * its rerank stream is ~2.5B rows — one global rank window
    * external-sorts ~60 GB (measured: 25 min of spill thrash, over the
    * oracle cap; a 16-way UNION ALL shard variant OOM-killed instead —
    * DuckDB schedules the branch sorts concurrently). The cutoff form
    * never sorts the stream: pass 1 aggregates a per-probe 256-bucket
    * histogram of sims (hash agg, streaming), `cut` derives lb = the
    * lower edge of the bucket holding the 3rd-largest sim (so the true
    * top-3 all satisfy sim ≥ lb, whatever the ties — a LOWER bound,
    * never an over-cut), pass 2 recomputes the same sims (bit-identical
    * kernel, deterministic) and ranks only the ~1/256-tail survivors.
    * Both passes are dot-bound (~2 × the stream's dot cost), no sort
    * ever sees more than the survivor set. q118's √N cells keep its
    * stream at ~178M rows, so it stays on the plain single-window
    * form. */
  private def ivfSearchFastSqlOver(trainCtes: String, histCutoff: Boolean = false): String = {
    // Parquet-spine pair stream (r15, the q94-at-sf10 thread-starvation
    // fix): DuckDB 1.0 parallelizes a pipeline by its SOURCE — parquet
    // scans split by row group, but a materialized-CTE scan feeds ~2
    // threads no matter the box (measured: the rkw-probed form ran the
    // 2.5B-pair stream at 198% CPU on 32 cores, 1.6M pairs/s; a chunk-
    // replication salt didn't help because the salted CTE is still the
    // source). Driving the probe side from the PARQUET table itself —
    // `embeddings e` contributes only the vec_id spine; rkw/bw become
    // build-side hash lookups — runs the identical pair multiset at
    // 52M pairs/s (33x). Pair-level sims are bit-identical (same operands,
    // same kernel); only pipeline parallelism changes.
    val pairStream =
      s"""SELECT r.vec_id AS vec_id, b.vec_id AS neighbor_id,
         |      array_inner_product(r.emb, b.emb) / (r.nrm * b.nrm) AS sim
         |    FROM embeddings e
         |    JOIN rkw r ON r.vec_id = e.vec_id
         |    JOIN bw b ON b.cid = r.cid AND b.vec_id <> r.vec_id""".stripMargin
    val bwCte =
      s"""bw AS MATERIALIZED (
         |  SELECT vec_id, emb, nrm, cid FROM rkw WHERE rn = 1
         |),
         |""".stripMargin
    val tail =
      if (!histCutoff)
        s"""${bwCte}sims AS (
           |  SELECT vec_id, neighbor_id, sim FROM (
           |    $pairStream) s
           |)
           |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS cosine_sim
           |FROM (
           |  SELECT vec_id, neighbor_id, sim,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY sim DESC, neighbor_id ASC) AS rank
           |  FROM sims
           |) WHERE rank <= 3""".stripMargin
      else
        s"""${bwCte}hist AS MATERIALIZED (
           |  SELECT vec_id, CAST(floor((sim + 1.0) * 128.0) AS INTEGER) AS bkt, count(*) AS cnt
           |  FROM ($pairStream) h
           |  GROUP BY 1, 2
           |),
           |cut AS MATERIALIZED (
           |  SELECT vec_id, coalesce(max(lb) FILTER (WHERE cum >= 3), -2.0) AS lb FROM (
           |    SELECT vec_id, bkt / 128.0 - 1.0 AS lb,
           |      sum(cnt) OVER (PARTITION BY vec_id ORDER BY bkt DESC) AS cum
           |    FROM hist) c
           |  GROUP BY vec_id
           |),
           |sims AS (
           |  SELECT vec_id, neighbor_id, sim
           |  FROM ($pairStream) s JOIN cut USING (vec_id)
           |  WHERE sim >= lb
           |)
           |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS cosine_sim
           |FROM (
           |  SELECT vec_id, neighbor_id, sim,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY sim DESC, neighbor_id ASC) AS rank
           |  FROM sims
           |) WHERE rank <= 3""".stripMargin
    s"""WITH ${embdFastCte(Dim)},
       |$trainCtes,
       |rkn AS MATERIALIZED (
       |  SELECT vec_id, cid, rn FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM (SELECT e.vec_id, c.cid, array_distance(e.emb, c.centroid) AS d
       |          FROM embd e CROSS JOIN c2 c) nd
       |  ) WHERE rn <= 2
       |),
       |rkw AS MATERIALIZED (
       |  SELECT r.vec_id, e.emb, e.nrm, r.cid, r.rn
       |  FROM rkn r JOIN embd e ON e.vec_id = r.vec_id
       |),
       |$tail""".stripMargin
  }

  /** Fast twin of [[semDedupSqlOver]]'s assignment/prune tail. */
  private def semDedupFastSqlOver(trainCtes: String): String =
    s"""WITH ${embdFastCte(Dim)},
       |$trainCtes,
       |asg AS MATERIALIZED (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM (SELECT e.vec_id, c.cid, array_distance(e.emb, c.centroid) AS d
       |          FROM embd e CROSS JOIN c2 c) nd
       |  ) WHERE rn = 1
       |),
       |asgw AS MATERIALIZED (
       |  SELECT a.vec_id, a.cluster, e.emb, e.nrm
       |  FROM asg a JOIN embd e ON e.vec_id = a.vec_id
       |),
       |pruned AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM asgw a JOIN asgw b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
       |  WHERE array_inner_product(a.emb, b.emb) / (a.nrm * b.nrm) > 0.28
       |)
       |SELECT s.vec_id, s.cluster, p.vec_id IS NOT NULL AS is_pruned
       |FROM asg s LEFT JOIN pruned p ON s.vec_id = p.vec_id""".stripMargin

  /** SemDeDup SQL tail over a WITH-body `trainCtes` chain ending in
    * `c2` — the oracle twin of [[semDedupWith]]; shared by q74
    * (full-fit chain) and q119 (sampled corpus-derived chain). */
  private def semDedupSqlOver(trainCtes: String): String = {
    val dist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", Dim)
    val dot = VecFns.ddbDot("a.embedding", "b.embedding", Dim)
    val na = VecFns.ddbNorm("a.embedding", Dim)
    val nb = VecFns.ddbNorm("b.embedding", Dim)
    s"""WITH $trainCtes,
       |asg AS (
       |  SELECT vec_id, embedding, cid AS cluster FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $dist ASC, c.cid ASC) AS rn
       |    FROM embeddings e CROSS JOIN c2 c
       |  ) WHERE rn = 1
       |),
       |pruned AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
       |  WHERE $dot / ($na * $nb) > 0.28
       |)
       |SELECT s.vec_id, s.cluster, p.vec_id IS NOT NULL AS is_pruned
       |FROM asg s LEFT JOIN pruned p ON s.vec_id = p.vec_id""".stripMargin
  }

  val q74SemDedupSql: String = semDedupSqlOver(kmeansTrainSqlCtes)

  /** q119's oracle: the q118 sampled corpus-derived training chain +
    * q74's identical assignment/prune tail, in the fast shapes (the
    * slow twin OOM'd at sf10 — see the fast-builder scaladoc). */
  val q119SemDedupScaledSql: String = semDedupFastSqlOver(sampledScaledTrainFastSqlCtes)

  /** TRAINED-QUANTIZER IVF ANN with an nprobe knob — the scale-path
    * upgrade of q33 (whose per-label centroids make cluster count an
    * accident of the schema, not a parameter): coarse-quantize every
    * vector to its nearest TRAINED k-means centroid
    * ([[trainedCentroids]], k = [[SemK]] = 32 — the same write-once
    * store q74 reads), then each query probes its `nprobe` = 2 nearest
    * cells and exact-cosine reranks only their members to a top-3. One
    * ranked centroid-distance frame serves both roles: rn = 1 is the
    * inverted-list assignment (build side), rn ≤ 2 the probe list —
    * cells are disjoint, so no candidate dedup is needed.
    *
    * 100 TB: centroids broadcast (k×dim); the search is a cid equi-join
    * (candidate cost |corpus|·nprobe/k), never corpus×corpus; k and
    * nprobe are the published IVF recall/cost knobs. Oracle: the full
    * k-means training replayed in DuckDB (shared CTEs with q74) + the
    * identical probe/rerank. Cross-engine safety: the rn ≤ 2 cut adds a
    * probe-boundary margin on top of q74's assignment margin — the
    * 2nd-vs-3rd centroid-distance gap, measured ≥ 1.1e-4 at sf0.01
    * (9 orders above summation wobble). */
  /** Ranked probe cells for IVF search: each vector's `nprobe` nearest
    * centroids (rn = 1 is the inverted-list assignment, rn ≤ nprobe the
    * probe list). Shared by q89 and the replica-invariance smoke. */
  private[graft] def ivfRanked(vecs: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    val spark = vecs.sparkSession
    // aggregate-not-window probe ranking (KMeans.probeCells — the r14
    // spill fix): the N×k centroid-distance stream map-side-combines to
    // nprobe (score, cid) pairs per vector instead of hash-exchanging
    // and sorting the whole stream. nrm recomputes from the embedding
    // after the ranking — bit-identical to computing it before.
    graft.ml.KMeans.probeCells(
        vecs.select("vec_id", "embedding"), cents.select("cid", "centroid"), nprobe)
      .select(col("vec_id"), col("embedding"),
        NativeVecFns.norm(spark, col("embedding")).as("nrm"), col("cid"), col("rn"))
  }

  /** IVF probe/rerank tail shared by q89 and q118: rn = 1 is the
    * inverted-list build side, rn ≤ nprobe the probe side; exact cosine
    * rerank within probed cells to a top-3 via the single-shuffle
    * [[TopKAgg]]. Candidate cost |corpus|·nprobe·(N/k) — a cid
    * equi-join, never corpus×corpus.
    *
    * Cache ownership (the KMeans.fit contract): callers persist the
    * `ranked` frame because it feeds both join sides. The entry is
    * deliberately NOT unpersisted here — the caller returns the lazy
    * result, so the action runs outside this function. Because each
    * query's centroid store is memoized per (process, dir), the ranked
    * plan is IDENTICAL across invocations and Spark's CacheManager
    * dedupes by canonical plan: repeated bench reps reuse ONE cache
    * entry per (query, dir) — bounded, and the reuse is exactly what
    * makes timed reps price steady-state search. */
  private def ivfProbeRerank(spark: SparkSession, ranked: DataFrame): DataFrame = {
    val build = ranked.filter(col("rn") === 1).select(col("cid"),
      col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val probes = ranked.select(col("cid"),
      col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    probes.join(build, Seq("cid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), 3).as("top"))
      .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("cosine_sim"))
  }

  def q89IvfAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    ivfProbeRerank(spark,
      ivfRanked(e, trainedCentroids(spark, dir), nprobe = 2).persist())
  }

  /** q118: the PRODUCTION IVF configuration under the oracle gate —
    * q89's exact search semantics, but the quantizer is built the way a
    * 100 TB deployment would build it: k = `kFor(N)` (√N cells, the
    * corpus-derived width — 23 at the sf0.01 gate, 448 at sf10) and
    * training on `fitSampled`'s deterministic 1-in-4 sample instead of
    * the full corpus. q89 keeps (k = 32, full fit) pinned; this query
    * proves the two production levers — sampled training and
    * corpus-derived cell width — are not approximations that drift from
    * relational semantics: the DuckDB oracle replays the SAME sampled
    * training (multiplicative-hash sample CTE, √N LIMIT from a scalar
    * subquery, both Lloyd rounds) and the identical probe/rerank, and
    * the result is cell-exact. Completes the q117 story for the IVF
    * tier: every fixed-width term in the sf10 scaling table now has its
    * corpus-derived fix itself oracle-proven. */
  def q118IvfScaled(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    ivfProbeRerank(spark,
      ivfRanked(e, scaledCentroids(spark, dir), nprobe = 2).persist())
  }

  /** IVF probe/rerank SQL tail over a WITH-body `trainCtes` chain ending
    * in `c2` (the trained centroid table) — the oracle twin of
    * [[ivfProbeRerank]]; shared by q89 (full-fit chain) and q118
    * (sampled corpus-derived chain). */
  private def ivfSearchSqlOver(trainCtes: String,
                               corpusSrc: String = "embeddings",
                               headCtes: String = ""): String = {
    val dist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", Dim)
    val dot = VecFns.ddbDot("p.embedding", "b.embedding", Dim)
    val np = VecFns.ddbNorm("p.embedding", Dim)
    val nb = VecFns.ddbNorm("b.embedding", Dim)
    s"""WITH $headCtes$trainCtes,
       |rk AS (
       |  SELECT vec_id, embedding, cid, rn FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $dist ASC, c.cid ASC) AS rn
       |    FROM $corpusSrc e CROSS JOIN c2 c
       |  ) WHERE rn <= 2
       |),
       |sims AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $dot / ($np * $nb) AS sim
       |  FROM rk p JOIN (SELECT * FROM rk WHERE rn = 1) b
       |    ON p.cid = b.cid AND p.vec_id <> b.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS cosine_sim
       |FROM (
       |  SELECT vec_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims
       |) WHERE rank <= 3""".stripMargin
  }

  val q89IvfAnnSql: String = ivfSearchSqlOver(kmeansTrainSqlCtes)

  /** q118's oracle: the production training chain + q89's identical
    * full-corpus probe/rerank, in the fast shapes (the slow twin OOM'd
    * at sf10 — see the fast-builder scaladoc; full replay = 89 s
    * there). */
  val q118IvfScaledSql: String = ivfSearchFastSqlOver(sampledScaledTrainFastSqlCtes)

  /** q94: INCREMENTAL IVF-INDEX MAINTENANCE under the oracle gate — the
    * ANN twin of q91's maintained edge store, and the operating mode an
    * IVF deployment actually runs at 100 TB: train the coarse quantizer
    * ONCE on the 90% seed corpus
    * ([[graft.operators.IncrementalIvf.writeIndex]]), ingest the
    * remaining 10% as a delta batch with the quantizer FROZEN
    * (`ingestBatch` — assign to existing cells, append to the
    * cell-partitioned index; no retrain, no index rewrite), then search
    * the MAINTAINED index (nprobe = 2, top-3).
    *
    * The DuckDB oracle replays the seed-only training (the q89 CTE
    * pattern over the 90% subset) and searches a from-scratch assignment
    * of the FULL corpus — so the driver hash-proves
    * `search(index(state ∪ delta)) ≡ search(rebuild)` cell-exact.
    * Store built once per (process, dir), like every snapshot store. */
  def q94IncrementalIvf(spark: SparkSession, dir: String): DataFrame = {
    val root = ivfStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("incivf", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      graft.operators.IncrementalIvf.writeIndex(e.filter(col("vec_id") % 10 =!= 7), r, SemK, SemKIters)
      graft.operators.IncrementalIvf.ingestBatch(
        spark, r, e.filter(col("vec_id") % 10 === 7), batchId = 1L)
      r
    })
    graft.operators.IncrementalIvf.search(spark, root,
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      nprobe = 2, topK = 3)
  }

  private val ivfStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  // q89's probe/rerank tail, but c2 trains on the SEED subset only —
  // the rebuild the maintained index must equal. Fast shapes (r15): at
  // sf10 the k = 32 cells hold ~6250 members each, so the rerank is
  // ~2.5B candidate pairs — the lambda-fold form was ~40 min (over the
  // 1500 s cap); the array-kernel form is ~620 s.
  val q94IncrementalIvfSql: String = ivfSearchFastSqlOver(
    s"""seedf AS MATERIALIZED (SELECT vec_id, emb FROM embd WHERE vec_id % 10 <> 7),
       |${kmeansTrainFastSqlCtesOver("seedf", SemK.toString, Dim)}""".stripMargin,
    histCutoff = true)

  /** ANN RECALL EVALUATION — the quality gate every approximate index
    * needs before it replaces the exact baseline in a pipeline: for a
    * deterministic 10% probe sample (`vec_id % 10 = 3`), compute exact
    * cosine top-3 ground truth and score q32's single-probe LSH answer
    * set against it — per probe, hits and recall in exact basis points.
    *
    * Ground truth is necessarily O(|sample|·N) — that cost is the reason
    * recall is measured on a sample, and the sample predicate is the
    * knob. The exact side is a broadcast of the probe sample against one
    * streaming pass of the corpus (no shuffle until the k-row-per-probe
    * partial top-k aggregate); the approx side reuses q32's bucket
    * equi-join verbatim. Hit counting is a (vec_id, neighbor_id)-keyed
    * left join of two ≤3-rows-per-probe frames — integers only, so the
    * cross-engine hash is exact. */
  def q88AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("embedding"),
      NativeVecFns.norm(spark, col("embedding")).as("nrm"))
    val probes = e.filter(col("vec_id") % 10 === 3).select(
      col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val exact = e.select(
        col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
      .join(broadcast(probes), col("a_id") =!= col("b_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), 3).as("top"))
      .select(col("a_id").as("vec_id"), explode(col("top")).as("t"))
      .select(col("vec_id"), col("t.id").as("neighbor_id"))
    val approx = q32AnnLsh(spark, dir)
      .filter(col("vec_id") % 10 === 3)
      .select(col("vec_id"), col("neighbor_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("vec_id", "neighbor_id"), "left")
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp", expr("(10000 * n_hit) div n_exact"))
  }

  /** Same narrow-materialization shape as [[annRecallShardedSqlWith]]
    * (the q92-at-sf10 disk-exhaustion lesson): sims CTEs materialize as
    * (a_id, b_id, sim) triples BEFORE the rank windows. */
  val q88AnnRecallSql: String = {
    val bucket = VecFns.ddbRhpBucket("embedding", Dim, 8)
    val dot = VecFns.ddbDot("a.embedding", "b.embedding", Dim)
    val na = VecFns.ddbNorm("a.embedding", Dim)
    val nb = VecFns.ddbNorm("b.embedding", Dim)
    s"""WITH probes AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 3
       |),
       |sims_ex AS MATERIALIZED (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, $dot / ($na * $nb) AS sim
       |  FROM probes a JOIN embeddings b ON a.vec_id <> b.vec_id
       |),
       |exk AS (
       |  SELECT a_id AS vec_id, b_id AS neighbor_id FROM (
       |    SELECT a_id, b_id,
       |      row_number() OVER (PARTITION BY a_id
       |        ORDER BY sim DESC, b_id ASC) AS rnk
       |    FROM sims_ex
       |  ) WHERE rnk <= 3
       |),
       |e AS MATERIALIZED (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings
       |),
       |sims_ap AS MATERIALIZED (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, $dot / ($na * $nb) AS sim
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |  WHERE a.vec_id % 10 = 3
       |),
       |ap AS (
       |  SELECT a_id AS vec_id, b_id AS neighbor_id FROM (
       |    SELECT a_id, b_id,
       |      row_number() OVER (PARTITION BY a_id
       |        ORDER BY sim DESC, b_id ASC) AS rnk
       |    FROM sims_ap
       |  ) WHERE rnk <= 3
       |)
       |SELECT x.vec_id,
       |  count(*)::BIGINT AS n_exact,
       |  CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  (10000 * CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT))
       |    // count(*) AS recall_bp
       |FROM exk x LEFT JOIN ap
       |  ON x.vec_id = ap.vec_id AND x.neighbor_id = ap.neighbor_id
       |GROUP BY x.vec_id""".stripMargin
  }

  /** Sharded ANN recall evaluation — q88's computation keyed by a `shard`
    * column at EVERY stage: ground truth, LSH bucketing, and hit
    * counting never cross a shard boundary (probe side restricted to the
    * `vec_id % 10 = 3` sample like q88; the exact side broadcasts the
    * per-shard probe sample; the approx side joins on (shard, bucket)).
    *
    * This is the per-source / per-language recall report a production
    * index ships with, and the ANN tier's replica-invariance probe: 10
    * identical shards must reproduce the single-shard recall exactly per
    * shard (ScaleSmokeSpec) — the property that re-sharding a 100 TB
    * corpus cannot shift the eval. Input: (shard, vec_id, embedding).
    *
    * Cost honesty (same contract as q88): the exact side broadcasts the
    * probe sample WITH embeddings, so the sample predicate is not a
    * knob you may ignore — it must keep the probe set broadcast-sized
    * (thousands of probes, not a corpus fraction). At real scale you
    * tighten the predicate (`probeMod`, sized by [[probeModFor]]), not
    * the mechanism. */
  def annRecallSharded(df: DataFrame, nbits: Int = 8, k: Int = 3,
                       probeMod: Long = -1L): DataFrame = {
    val spark = df.sparkSession
    // DEFAULT PATH = the derived sample rate (r11 flip): an unpinned
    // probeMod sizes itself via [[probeModFor]] (≈2000 probes at any
    // corpus size — the O(probes·N) honest-eval term stays linear);
    // q92 pins 10 explicitly for its byte-stable oracle. The derivation
    // floors at 10, so at gate SFs default ≡ the pinned plan.
    val pm = if (probeMod > 0) probeMod else probeModFor(df.count())
    val e = df.select(col("shard"), col("vec_id"), col("embedding"),
      NativeVecFns.norm(spark, col("embedding")).as("nrm"),
      NativeVecFns.rhpBucket(spark, col("embedding"), nbits).as("bucket"))
    def sim = NativeVecFns.dot(spark, col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm"))
    // Ground truth via the dense probe-broadcast kernel (r11, the q120
    // sf100 watch item): the corpus streams ONCE against the broadcast
    // probe sample, each partition emitting only its probes·k local-best
    // candidates instead of probes·N joined pairs — the relational
    // broadcast-join form paid row-at-a-time expression eval on ~1.3e9
    // pairs at sf100 (measured 264.6 s; this kernel: see BASELINE.md).
    // Bit-identical by the partial-then-global top-k argument
    // (BlockTopKSpec) — the oracle is unchanged.
    val exactCands = graft.ml.BlockTopK.probeTopKCandidates(
      df.select(col("shard"), col("vec_id"), col("embedding")),
      df.filter(col("vec_id") % pm === 3)
        .select(col("shard"), col("vec_id"), col("embedding")), k)
    val exact = exactCands
      .groupBy("shard", "a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), k).as("top"))
      .select(col("shard"), col("a_id").as("vec_id"), explode(col("top")).as("t"))
      .select(col("shard"), col("vec_id"), col("t.id").as("neighbor_id"))
    val aSide = e.filter(col("vec_id") % pm === 3).select(col("shard"), col("bucket"),
      col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val bSide = e.select(col("shard"), col("bucket"),
      col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val approx = aSide.join(bSide, Seq("shard", "bucket"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim", sim)
      .groupBy("shard", "a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), k).as("top"))
      .select(col("shard"), col("a_id").as("vec_id"), explode(col("top")).as("t"))
      .select(col("shard"), col("vec_id"), col("t.id").as("neighbor_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("shard", "vec_id", "neighbor_id"), "left")
      .groupBy("shard", "vec_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp", expr("(10000 * n_hit) div n_exact"))
  }

  /** q92: [[annRecallSharded]] under the oracle gate — shards derived as
    * `vec_id % 3` (standing in for source/language partitions), so the
    * per-shard recall report machinery (per-shard ground truth, (shard,
    * bucket) candidate join, per-shard hit counts) is driver-proven
    * cell-exact, not just replica-invariance-spec'd. */
  def q92AnnRecallSharded(spark: SparkSession, dir: String): DataFrame =
    // probeMod PINNED at 10 (the gate rate; its static oracle SQL says 10)
    // — the unpinned default derives via probeModFor since the r11 flip
    annRecallSharded(Tables.embeddings(spark, dir).select(
      (col("vec_id") % 3).cast("int").as("shard"), col("vec_id"), col("embedding")),
      probeMod = 10L)

  /** Sharded-recall SQL with a pluggable probe-sample modulus — shared
    * by q92 (`probeModSql = "10"`, the pinned gate rate) and q120 (the
    * corpus-derived scalar subquery).
    *
    * Shape notes (the sf10 lesson, same family as the q86 MATERIALIZED
    * fix): the similarity joins are materialized as NARROW (a_id, b_id,
    * sim) CTEs BEFORE the rank windows — without the hint DuckDB 1.0
    * carries the 64-float embedding lists into the window sort and
    * spills ~500 B/row instead of 24 B/row (measured: 73 GB of spill at
    * sf10, disk-exhaustion death; narrow, it completes). The approx
    * side's rank filter is pushed to the probe sample before its
    * window — row_number is partition-local in `a_id`, so restricting
    * partitions early is identity-preserving. */
  private def annRecallShardedSqlWith(probeModSql: String): String = {
    val bucket = VecFns.ddbRhpBucket("embedding", Dim, 8)
    val dot = VecFns.ddbDot("a.embedding", "b.embedding", Dim)
    val na = VecFns.ddbNorm("a.embedding", Dim)
    val nb = VecFns.ddbNorm("b.embedding", Dim)
    s"""WITH probes AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % $probeModSql = 3
       |),
       |sims_ex AS MATERIALIZED (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, $dot / ($na * $nb) AS sim
       |  FROM probes a JOIN embeddings b
       |    ON a.vec_id <> b.vec_id AND a.vec_id % 3 = b.vec_id % 3
       |),
       |exk AS (
       |  SELECT a_id AS vec_id, b_id AS neighbor_id FROM (
       |    SELECT a_id, b_id,
       |      row_number() OVER (PARTITION BY a_id
       |        ORDER BY sim DESC, b_id ASC) AS rnk
       |    FROM sims_ex
       |  ) WHERE rnk <= 3
       |),
       |e AS MATERIALIZED (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings
       |),
       |sims_ap AS MATERIALIZED (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, $dot / ($na * $nb) AS sim
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |    AND a.vec_id % 3 = b.vec_id % 3
       |  WHERE a.vec_id % $probeModSql = 3
       |),
       |ap AS (
       |  SELECT a_id AS vec_id, b_id AS neighbor_id FROM (
       |    SELECT a_id, b_id,
       |      row_number() OVER (PARTITION BY a_id
       |        ORDER BY sim DESC, b_id ASC) AS rnk
       |    FROM sims_ap
       |  ) WHERE rnk <= 3
       |)
       |SELECT (x.vec_id % 3)::INT AS shard, x.vec_id,
       |  count(*)::BIGINT AS n_exact,
       |  CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  (10000 * CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT))
       |    // count(*) AS recall_bp
       |FROM exk x LEFT JOIN ap
       |  ON x.vec_id = ap.vec_id AND x.neighbor_id = ap.neighbor_id
       |GROUP BY x.vec_id""".stripMargin
  }

  val q92AnnRecallShardedSql: String = annRecallShardedSqlWith("10")

  /** Corpus-derived probe-sample modulus for the recall eval: target
    * ≈2000 probes regardless of corpus size (max(10, ⌈N/2000⌉) — 10 at
    * every gate SF, 100 at sf10), so the O(probes·N) honest-eval term
    * stays LINEAR in N instead of N²/10. The `lshBitsFor`/`kFor`
    * pattern applied to the eval tier: the q92 sf10 row's "sample rate
    * is the production knob" made a derivation, and q120 puts it under
    * the gate. */
  private[graft] def probeModFor(corpusCount: Long): Long =
    math.max(10L, math.ceil(corpusCount / 2000.0).toLong)

  /** q120: the recall eval's SAMPLE-RATE LEVER under the oracle gate —
    * q92's exact per-shard report at `probeMod = probeModFor(N)`. At
    * every gate SF (N ≤ 20k) the derivation floors at 10, so q120 ≡ q92
    * row-for-row there and the oracle re-proves the equivalence; at
    * sf10 it evaluates 2,000 probes instead of 20,000 — turning the one
    * sf10 row whose ORACLE died of its own O(sample·N) ground truth
    * into one DuckDB can check. */
  def q120RecallScaled(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    annRecallSharded(
      e.select((col("vec_id") % 3).cast("int").as("shard"),
        col("vec_id"), col("embedding")),
      probeMod = probeModFor(e.count()))
  }

  val q120RecallScaledSql: String = annRecallShardedSqlWith(
    "(SELECT GREATEST(10, CAST(CEIL(COUNT(*) / 2000.0) AS BIGINT)) FROM embeddings)")

  /** SQ8 SCALAR-QUANTIZED ANN — the index-compression tier (the
    * FAISS-style `SQ8` codec): store each vector as 64 one-byte codes
    * instead of 64 floats (4× smaller index — at 100 TB of vectors the
    * difference between an index that fits executor memory and one that
    * doesn't), search with ASYMMETRIC distance: the query keeps its full
    * float precision, only the database side is reconstructed from
    * codes (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", IEEE TPAMI 2011 — the symmetric/asymmetric distinction;
    * SQ8 is the M = dim, 8-bit special case).
    *
    * Codec: per-dimension corpus min/max (ONE aggregation pass → a
    * 1-row frame that broadcasts) define a uniform 256-level grid;
    * `code_i = floor((x_i − mn_i)/step_i + 0.5)` — floor(+0.5) instead
    * of round() so both engines run the identical IEEE double op chain
    * (no rounding-mode reconciliation), `least(255, ·)` guards the
    * x = max edge; reconstruction is `mn_i + code_i·step_i`. A
    * constant dimension (mx = mn) codes to 0 and reconstructs to mn.
    *
    * Search reuses q32's bucket plan verbatim: RHP-LSH on the ORIGINAL
    * floats (bucketing happens at index-build time, before the codes
    * replace the floats), candidate pairs via the bucket equi-join,
    * rerank by asymmetric cosine sim(query_float, recon(codes)). The
    * oracle replays codec + search end-to-end, so the driver hash
    * proves the quantizer itself (grid, clamping, reconstruction), not
    * just the plan. Max per-dim reconstruction error ≤ step/2 and the
    * [0,255] code range are spec-asserted (Sq8AnnSpec), along with the
    * no-cartesian plan gate.
    *
    * 100 TB shape: stats = one corpus pass collapsing to 128 doubles;
    * codec = per-row codegen; search = q32's bucket-keyed shuffle with
    * a 4×-smaller build side.
    *
    * The codec half lives in [[sq8Recon]]: per-dim min/max grid from one
    * aggregation pass, codes folded straight into their reconstruction
    * (`mn_i + code_i·step_i` — the byte codes themselves never need to
    * exist as a column; a real index sink would store
    * `(x − mn)/step` bytes and reconstruct at read); the search half is
    * [[q97Sq8Ann]] below. `sq8Recon` returns (vec_id, embedding, recon). */
  private[graft] def sq8Recon(df: DataFrame, dim: Int): DataFrame = {
    val stats = df.agg(
      array((0 until dim).map(i =>
        min(element_at(col("embedding"), i + 1).cast("double"))): _*).as("mins"),
      array((0 until dim).map(i =>
        max(element_at(col("embedding"), i + 1).cast("double"))): _*).as("maxs"))
    df.crossJoin(broadcast(stats))
      .withColumn("recon", transform(sequence(lit(0), lit(dim - 1)), i => {
        val x = element_at(col("embedding"), i + lit(1)).cast("double")
        val mn = element_at(col("mins"), i + lit(1))
        val mx = element_at(col("maxs"), i + lit(1))
        val step = (mx - mn) / lit(255.0)
        val code = least(lit(255.0), floor((x - mn) / step + lit(0.5)))
        when(mx === mn, mn).otherwise(mn + code * step)
      }))
      .select(col("vec_id"), col("embedding"), col("recon"))
  }

  def q97Sq8Ann(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val coded = sq8Recon(e, Dim)
      .select(col("vec_id"), col("recon"),
        NativeVecFns.norm(spark, col("recon")).as("r_nrm"),
        NativeVecFns.rhpBucket(spark, col("embedding"), 8).as("bucket"))
    val probes = e.select(
      NativeVecFns.rhpBucket(spark, col("embedding"), 8).as("bucket"),
      col("vec_id").as("a_id"), col("embedding").as("a_emb"),
      NativeVecFns.norm(spark, col("embedding")).as("a_nrm"))
    probes.join(coded, Seq("bucket"))
      .filter(col("a_id") =!= col("vec_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("recon")) / (col("a_nrm") * col("r_nrm")))
      .groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("vec_id"), 3).as("top"))
      .select(col("a_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("a_id").as("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("qsim"))
  }

  val q97Sq8AnnSql: String = {
    val bucket = VecFns.ddbRhpBucket("embedding", Dim, 8)
    val dot = VecFns.ddbDot("a.embedding", "b.recon", Dim)
    val na = VecFns.ddbNorm("a.embedding", Dim)
    val nb = VecFns.ddbNorm("b.recon", Dim)
    s"""WITH stats AS (
       |  SELECT t.i AS i,
       |    min(e.embedding[t.i + 1]::DOUBLE) AS mn,
       |    max(e.embedding[t.i + 1]::DOUBLE) AS mx
       |  FROM embeddings e, range(${Dim}) t(i)
       |  GROUP BY t.i
       |),
       |s AS (
       |  SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs FROM stats
       |),
       |coded AS (
       |  SELECT vec_id,
       |    list_transform(range(${Dim}), i ->
       |      CASE WHEN s.maxs[i+1] = s.mins[i+1] THEN s.mins[i+1]
       |      ELSE s.mins[i+1]
       |        + least(255.0::DOUBLE,
       |            floor((embedding[i+1]::DOUBLE - s.mins[i+1])
       |                  / ((s.maxs[i+1] - s.mins[i+1]) / 255.0) + 0.5))
       |          * ((s.maxs[i+1] - s.mins[i+1]) / 255.0)
       |      END) AS recon,
       |    $bucket AS bucket
       |  FROM embeddings, s
       |),
       |sims AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $dot / ($na * $nb) AS sim
       |  FROM embeddings a
       |  JOIN coded b
       |    ON $bucket = b.bucket AND a.vec_id <> b.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS qsim
       |FROM (
       |  SELECT vec_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims
       |) WHERE rank <= 3""".stripMargin
  }

  /** PQ configuration: m = 8 subspaces of Dim/m = 8 floats. The codebook
    * width is CORPUS-DERIVED ([[graft.ml.ProductQuantizer.ksFor]] —
    * ⌊N/32⌋ clamped to [16, 256]): the FAISS byte-code production config
    * (ks = 256) is the ceiling, reached at ≥8k vectors, while gate
    * corpora train a width their size can support — the q118 pattern, so
    * ONE static oracle SQL (scalar-subquery ks) is correct at every SF. */
  private[graft] val PqM = 8
  private val PqSub = Dim / PqM

  /** IVF-PQ index build, once per (process, dir) like every snapshot
    * store: per-subspace codebooks from `fitSampled`'s deterministic
    * 1-in-4 sample (the q118 production-training recipe), full-corpus
    * encode (one broadcast join against the m·ks-row codebook), coarse
    * cell per vector from the SAME trained quantizer q89 searches with.
    * The stored index is (vec_id, cid, codes: array<int>[m]) — 8 codes
    * standing in for 64 floats (32× at the byte-code ceiling; a
    * production sink would pack them tinyint). */
  private val pqStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def pqStore(spark: SparkSession, dir: String): (String, String) =
    pqStoreRoots.computeIfAbsent(dir, { d =>
      val rb = graft.core.StorePaths.root("pqbook", d)
      val rc = graft.core.StorePaths.root("pqcodes", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      val ks = graft.ml.ProductQuantizer.ksFor(e.count())
      graft.ml.ProductQuantizer.train(e, Dim, PqM, ks, SemKIters, denom = 4)
        .coalesce(1).write.mode("overwrite").parquet(rb) // m·ks rows
      val book = spark.read.parquet(rb)
      val cids = graft.ml.KMeans.assign(e, trainedCentroids(spark, d))
        .select(col("vec_id"), col("cid"))
      graft.ml.ProductQuantizer.encode(e, book, Dim, PqM)
        .join(cids, Seq("vec_id"))
        .write.mode("overwrite").parquet(rc)
      (rb, rc)
    })

  /** q122: IVF-PQ ANN — the index-compression step past q97's SQ8
    * (Jégou et al. 2011): candidates from q89's trained-quantizer cid
    * equi-join (nprobe = 2), reranked by ASYMMETRIC distance — the
    * query keeps full float precision, the database side is
    * reconstructed from its m = 8 product codes through a plan-literal
    * lookup table (≈16 KB; no join, no shuffle, codegen'd elementwise).
    * The DuckDB oracle replays ALL NINE trainings (the coarse k = 32
    * chain + 8 per-subspace sampled codebook chains with ks derived
    * in-SQL), the encode argmin, the reconstruction, and the identical
    * probe/rerank — so the driver hash-proves the quantizer end-to-end,
    * not just the plan shape.
    *
    * 100 TB shape: codebooks are m·ks·8 doubles (16 KB) — plan
    * literals; encode is one broadcast join at build time; search cost
    * = q89's candidate join with a 32×-smaller build side payload.
    * Margin audit (tools.PqMarginProbe, sf0.01): min subspace-code
    * argmin gap 1.1e-5, min rank-boundary gap 1.9e-5 — ≥10 orders
    * above the engines' summation wobble on 8-term double sums. */
  def q122IvfPqAnn(spark: SparkSession, dir: String): DataFrame = {
    val (rb, rc) = pqStore(spark, dir)
    val book = spark.read.parquet(rb)
    val cand = graft.ml.ProductQuantizer
      .withRecon(spark, spark.read.parquet(rc), book, PqM)
      .select(col("cid"), col("vec_id").as("b_id"), col("recon"), col("rnrm"))
    val probes = ivfRanked(Tables.embeddings(spark, dir),
        trainedCentroids(spark, dir), nprobe = 2)
      .select(col("cid"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    probes.join(cand, Seq("cid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("recon")) / (col("a_nrm") * col("rnrm")))
      .groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), 3).as("top"))
      .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("adc_sim"))
  }

  /** IVF-PQ search oracle SQL over a pluggable TRAINING source relation
    * (`trainSrc`): both quantizers train on `trainSrc` (q122 = the full
    * corpus; q124 = the 90% seed — the incremental store's frozen-
    * quantizer rebuild), while encode + probes always run over the FULL
    * corpus. `headCtes` prepends extra CTE definitions (must end with
    * ",\n" when nonempty). `coarseKLimit` is the coarse quantizer's
    * k as a SQL expression — SemK for the pinned-gate queries, a
    * scalar-subquery √N for the derived-width q127. `corpusSrc` is the
    * relation encode + probes run over — `embeddings` everywhere except
    * q129, whose live view excludes the tombstoned ids. `refine` > 0
    * appends the exact-rerank tail (q128): ADC keeps the top `refine`
    * per probe, full-precision vectors join back in, and the final
    * top-3 ranks by exact cosine. */
  private def ivfPqSearchSqlOver(trainSrc: String, headCtes: String = "",
                                 coarseKLimit: String = SemK.toString,
                                 corpusSrc: String = "embeddings",
                                 refine: Int = 0,
                                 candFilter: String = ""): String = {
    val coarseDist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", Dim)
    val dot = VecFns.ddbDot("p.embedding", "r.recon", Dim)
    val np = VecFns.ddbNorm("p.embedding", Dim)
    val nr = VecFns.ddbNorm("r.recon", Dim)
    val tail =
      if (refine <= 0)
        s"""SELECT vec_id, neighbor_id, rank, round(sim, 4) AS adc_sim
           |FROM (
           |  SELECT vec_id, neighbor_id, sim,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY sim DESC, neighbor_id ASC) AS rank
           |  FROM sims
           |) WHERE rank <= 3""".stripMargin
      else {
        val xdot = VecFns.ddbDot("p.embedding", "b.embedding", Dim)
        val xnp = VecFns.ddbNorm("p.embedding", Dim)
        val xnb = VecFns.ddbNorm("b.embedding", Dim)
        s""", adc AS (
           |  SELECT vec_id, neighbor_id FROM (
           |    SELECT vec_id, neighbor_id,
           |      row_number() OVER (PARTITION BY vec_id
           |        ORDER BY sim DESC, neighbor_id ASC) AS rank
           |    FROM sims
           |  ) WHERE rank <= $refine
           |),
           |ref AS (
           |  SELECT a.vec_id AS vec_id, a.neighbor_id AS neighbor_id,
           |    $xdot / ($xnp * $xnb) AS sim
           |  FROM adc a
           |  JOIN $corpusSrc p ON p.vec_id = a.vec_id
           |  JOIN $corpusSrc b ON b.vec_id = a.neighbor_id
           |)
           |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS exact_sim
           |FROM (
           |  SELECT vec_id, neighbor_id, sim,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY sim DESC, neighbor_id ASC) AS rank
           |  FROM ref
           |) WHERE rank <= 3""".stripMargin
      }
    // one training + encode chain per subspace, over the shared sample
    val chains = (0 until PqM).map { s =>
      val lo = s * PqSub + 1; val hi = (s + 1) * PqSub
      val encDist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", PqSub)
      s"""sub${s}s AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM smp),
         |${kmeansTrainSqlCtesOver(s"sub${s}s", kLimit = "(SELECT ks FROM ksv)", dim = PqSub, suffix = s"_p$s")},
         |sub${s}f AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM $corpusSrc),
         |enc$s AS (
         |  SELECT vec_id, $s AS s, centroid FROM (
         |    SELECT e.vec_id, c.centroid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $encDist ASC, c.cid ASC) AS rn
         |    FROM sub${s}f e CROSS JOIN c2_p$s c
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $headCtes${kmeansTrainSqlCtesOver(trainSrc, kLimit = coarseKLimit)},
       |ksv AS (SELECT LEAST(256, GREATEST(16, CAST(FLOOR(COUNT(*) / 32.0) AS BIGINT))) AS ks FROM $trainSrc),
       |smp AS (
       |  SELECT vec_id, embedding FROM $trainSrc
       |  WHERE ((vec_id % 1000000007) * 2654435761) % 1000000007 % 4 = 0
       |),
       |$chains,
       |rc AS MATERIALIZED (
       |  SELECT vec_id, flatten(list(centroid ORDER BY s)) AS recon
       |  FROM (SELECT * FROM enc0 UNION ALL SELECT * FROM enc1 UNION ALL
       |        SELECT * FROM enc2 UNION ALL SELECT * FROM enc3 UNION ALL
       |        SELECT * FROM enc4 UNION ALL SELECT * FROM enc5 UNION ALL
       |        SELECT * FROM enc6 UNION ALL SELECT * FROM enc7)
       |  GROUP BY vec_id
       |),
       |rk AS (
       |  SELECT vec_id, embedding, cid, rn FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $coarseDist ASC, c.cid ASC) AS rn
       |    FROM $corpusSrc e CROSS JOIN c2 c
       |  ) WHERE rn <= 2
       |),
       |sims AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $dot / ($np * $nr) AS sim
       |  FROM rk p JOIN (SELECT * FROM rk WHERE rn = 1) b
       |    ON p.cid = b.cid AND p.vec_id <> b.vec_id $candFilter
       |  JOIN rc r ON r.vec_id = b.vec_id
       |)
       |$tail""".stripMargin
  }

  val q122IvfPqAnnSql: String = ivfPqSearchSqlOver("embeddings")

  /** q124: INCREMENTAL IVF-PQ MAINTENANCE under the oracle gate — the
    * FAISS `IVFxx,PQyy` deployment's operating mode, q94's frozen-
    * quantizer invariant extended to BOTH quantizers: coarse cells AND
    * the m per-subspace codebooks train once on the 90% seed
    * ([[graft.operators.IncrementalIvfPq.writeIndex]] — coarse k pinned
    * at SemK for the gate, codebook ks derived from the SEED corpus),
    * the held-out 10% ingests with everything frozen (`ingestBatch` —
    * assign + encode, batch-keyed dynamic overwrite, no retrain, no
    * index rewrite), and the search runs over the MAINTAINED compressed
    * store. The oracle replays seed-only training (coarse chain + 8
    * codebook chains over the seed sample) and encodes the FULL corpus
    * from scratch — so the driver hash-proves
    * `search(codes(state ∪ delta)) ≡ search(rebuild)`: ingest leaves
    * the compressed index exactly where a from-scratch encode against
    * the same frozen quantizers would put it. */
  private val ivfPqStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The q124 store, built once per (process, dir): seed-train on 90%,
    * ingest the held-out 10% frozen. Shared by q124/q128/q132. */
  private def ivfPqIncStore(spark: SparkSession, dir: String): String =
    ivfPqStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("incivfpq", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      graft.operators.IncrementalIvfPq.writeIndex(
        e.filter(col("vec_id") % 10 =!= 7), r, Dim, k = SemK, iters = SemKIters)
      graft.operators.IncrementalIvfPq.ingestBatch(
        spark, r, e.filter(col("vec_id") % 10 === 7), batchId = 1L)
      r
    })

  def q124IvfPqIncremental(spark: SparkSession, dir: String): DataFrame =
    graft.operators.IncrementalIvfPq.search(spark, ivfPqIncStore(spark, dir),
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      nprobe = 2, topK = 3)

  val q124IvfPqIncrementalSql: String = ivfPqSearchSqlOver("emb_seed",
    "emb_seed AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 7),\n")

  /** q127: q124's incremental IVF-PQ at PRODUCTION-DERIVED widths — the
    * q118 lever applied to the maintained compressed store. The pinned
    * k = 32 gate construction means q124's cells hold N/32 vectors and
    * its candidate join grows as nprobe·N²/32 — the same fixed-width
    * scale wall every lever query exists to close. Here the seed store
    * derives BOTH widths from the corpus it trains on
    * ([[graft.operators.IncrementalIvf.kFor]] √N coarse cells,
    * [[graft.ml.ProductQuantizer.ksFor]] codebook width — writeIndex's
    * default path), so candidate cost is nprobe·N·√N and the oracle
    * derives the identical k in-SQL (scalar-subquery √N of the seed,
    * the q118 recipe). Everything else — frozen quantizers, idempotent
    * delta ingest, ADC search over the maintained lists — is q124. */
  private val ivfPqScaledRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def q127IvfPqIncrementalScaled(spark: SparkSession, dir: String): DataFrame = {
    val root = ivfPqScaledRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("incivfpqsc", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      graft.operators.IncrementalIvfPq.writeIndex(
        e.filter(col("vec_id") % 10 =!= 7), r, Dim, iters = SemKIters)
      graft.operators.IncrementalIvfPq.ingestBatch(
        spark, r, e.filter(col("vec_id") % 10 === 7), batchId = 1L)
      r
    })
    graft.operators.IncrementalIvfPq.search(spark, root,
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      nprobe = 2, topK = 3)
  }

  val q127IvfPqIncrementalScaledSql: String = ivfPqSearchSqlOver("emb_seed",
    """emb_seed AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 7),
      |kv AS (SELECT GREATEST(4, LEAST(262144, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS k FROM emb_seed),
      |""".stripMargin,
    coarseKLimit = "(SELECT k FROM kv)")

  /** q128: IVF-PQ search with an EXACT RE-RANK refine stage over q124's
    * maintained store — FAISS's `IndexRefineFlat` / IVFADC+R (Jégou et
    * al. 2011 §V): the compressed lists shortlist kFactor·topK = 12
    * candidates per probe by asymmetric distance (8 B/candidate — the
    * cheap pass), then ONLY the shortlist fetches full-precision vectors
    * (one linear vec_id equi-join, |probes|·12 rows, never a float cell
    * scan) and the final top-3 ranks by exact cosine. The accuracy/IO
    * dial every production PQ deployment ships: ADC recall at PQ cost,
    * exact ordering where it matters. Oracle = q124's nine-training
    * replay + the identical shortlist-then-rerank tail. */
  def q128IvfPqRefine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    graft.operators.IncrementalIvfPq.searchRefined(
      spark, ivfPqIncStore(spark, dir), e, e, nprobe = 2, topK = 3, kFactor = 4)
  }

  /** q132: FILTERED ANN — the metadata-predicate + vector-search
    * composition every production vector store ships (FAISS
    * `IDSelector`, the vector DBs' filtered search): only candidates
    * with `label < 3` (~30% of the corpus — the `label` column is the
    * testdata's metadata) may be returned. Spark-first this is a
    * left-semi equi-join applied EARLY — on the codes store before
    * reconstruction and rerank — so the predicate shrinks the candidate
    * join itself rather than post-filtering ranked output (which FAISS's
    * list scan must do). Probes keep their full nprobe cells; probes
    * whose cells hold fewer than 3 allowed candidates legally return
    * fewer rows. Oracle = q124's replay with the same IN-subquery on the
    * candidate side. */
  def q132IvfPqFiltered(spark: SparkSession, dir: String): DataFrame =
    graft.operators.IncrementalIvfPq.searchFiltered(
      spark, ivfPqIncStore(spark, dir),
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      Tables.embeddings(spark, dir).filter(col("label") < 3).select("vec_id"),
      nprobe = 2, topK = 3)

  val q132IvfPqFilteredSql: String = ivfPqSearchSqlOver("emb_seed",
    "emb_seed AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 7),\n",
    candFilter = "AND b.vec_id IN (SELECT vec_id FROM embeddings WHERE label < 3)")

  val q128IvfPqRefineSql: String = ivfPqSearchSqlOver("emb_seed",
    "emb_seed AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 7),\n",
    refine = 12)

  /** q129: DELETES in the maintained IVF-PQ store — the immutable-segment
    * tombstone (FAISS `remove_ids` semantics, Lucene/Delta delete-vector
    * shape): `deleteBatch` writes the deleted ids to a delete_batch-keyed
    * tombstone partition (replay-idempotent dynamic overwrite; the code
    * files never rewrite on the delete path), and search runs over the
    * LIVE view — one linear left-anti vec_id join. The delete set
    * (vec_id % 9 = 4) crosses BOTH the frozen seed codes and the ingested
    * delta codes, and the deleted ids vanish as probes AND as candidates.
    * Oracle = seed-only training replayed, encode + probes over the live
    * (post-delete) corpus — hash-proving
    * `search(live(codes ∪ delta − tombstones)) ≡ search(rebuild(corpus − deleted))`. */
  private val ivfPqDelRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def q129IvfPqDelete(spark: SparkSession, dir: String): DataFrame = {
    val root = ivfPqDelRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("incivfpqdel", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      graft.operators.IncrementalIvfPq.writeIndex(
        e.filter(col("vec_id") % 10 =!= 7), r, Dim, k = SemK, iters = SemKIters)
      graft.operators.IncrementalIvfPq.ingestBatch(
        spark, r, e.filter(col("vec_id") % 10 === 7), batchId = 1L)
      graft.operators.IncrementalIvfPq.deleteBatch(
        spark, r, e.filter(col("vec_id") % 9 === 4).select("vec_id"), batchId = 1L)
      r
    })
    graft.operators.IncrementalIvfPq.search(spark, root,
      Tables.embeddings(spark, dir).select("vec_id", "embedding")
        .filter(col("vec_id") % 9 =!= 4),
      nprobe = 2, topK = 3)
  }

  val q129IvfPqDeleteSql: String = ivfPqSearchSqlOver("emb_seed",
    """emb_seed AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 7),
      |emb_live AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 9 <> 4),
      |""".stripMargin,
    corpusSrc = "emb_live")

  /** q125: RESIDUAL IVF-PQ — the codebooks quantize `x − c(cell(x))`
    * instead of `x` (Jégou et al. 2011 §IV.B; what FAISS's `IVFxx,PQyy`
    * actually encodes). Residuals carry only the within-cell remainder
    * (their variance is the corpus variance MINUS what the coarse
    * quantizer already explained), so the same 8 bytes of codes spend
    * their precision on a smaller signal and reconstruction is
    * `c(cid) + decode(codes)` — the measured recall ladder
    * (tools.PqRecallProbe) shows how much of q122's raw-PQ damage this
    * recovers at identical index size. The store build adds exactly one
    * broadcast k-row join (cell centroid subtraction) to q122's
    * pipeline; search-side reconstruction adds the same broadcast join
    * before the elementwise decode, everything else — candidate cid
    * equi-join, ADC rerank, bounded-state top-k — is q122's plan.
    *
    * The DuckDB oracle replays the full residual pipeline: coarse
    * chain, full-corpus assignment, residual computation (float-corpus
    * minus double-centroid — bit-identical in both engines), 8 sampled
    * codebook trainings ON RESIDUALS, encode argmin, and the
    * centroid-plus-decode reconstruction. */
  private val pqrStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def pqrStore(spark: SparkSession, dir: String): (String, String) =
    pqrStoreRoots.computeIfAbsent(dir, { d =>
      val rb = graft.core.StorePaths.root("pqrbook", d)
      val rc = graft.core.StorePaths.root("pqrcodes", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      val cents = trainedCentroids(spark, d)
      val asg = graft.ml.KMeans.assign(e, cents).select(col("vec_id"), col("cid"))
      val res = e.join(asg, Seq("vec_id"))
        .join(broadcast(cents), Seq("cid"))
        .select(col("vec_id"), col("cid"),
          zip_with(col("embedding"), col("centroid"),
            (x, c) => x.cast("double") - c).as("embedding"))
      val ks = graft.ml.ProductQuantizer.ksFor(e.count())
      graft.ml.ProductQuantizer
        .train(res.select("vec_id", "embedding"), Dim, PqM, ks, SemKIters, denom = 4)
        .coalesce(1).write.mode("overwrite").parquet(rb)
      val book = spark.read.parquet(rb)
      graft.ml.ProductQuantizer.encode(res.select("vec_id", "embedding"), book, Dim, PqM)
        .join(res.select("vec_id", "cid"), Seq("vec_id"))
        .write.mode("overwrite").parquet(rc)
      (rb, rc)
    })

  def q125IvfPqResidual(spark: SparkSession, dir: String): DataFrame = {
    val (rb, rc) = pqrStore(spark, dir)
    val book = spark.read.parquet(rb)
    val cents = trainedCentroids(spark, dir)
    val dec = graft.ml.ProductQuantizer.decodeExpr(spark, book, PqM)
    val cand = spark.read.parquet(rc)
      .join(broadcast(cents), Seq("cid"))
      .withColumn("recon", zip_with(col("centroid"), dec(col("codes")), (c, r) => c + r))
      .withColumn("rnrm", NativeVecFns.norm(spark, col("recon")))
      .select(col("cid"), col("vec_id").as("b_id"), col("recon"), col("rnrm"))
    ivfRanked(Tables.embeddings(spark, dir), cents, nprobe = 2)
      .select(col("cid"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      .join(cand, Seq("cid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("recon")) / (col("a_nrm") * col("rnrm")))
      .groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), 3).as("top"))
      .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("adc_sim"))
  }

  /** The q125 oracle: q122's replay restructured for residuals — the
    * full-corpus coarse assignment (`rk`, now MATERIALIZED: it feeds the
    * residual table, both sim sides, and would otherwise inline the
    * whole coarse chain per reference) moves AHEAD of the codebook
    * chains so `resf` (residuals) can be their training/encode source,
    * and reconstruction re-adds the cell centroid (`rcf`). */
  val q125IvfPqResidualSql: String = ivfPqResidualFullSql("embeddings")

  /** The q125 oracle body over a pluggable corpus relation — q138 reuses
    * it verbatim over the structured-mixture corpus (`corpusSrc` =
    * `emb_struct`, defined in `headCtes`); with the defaults the emitted
    * string is exactly q125's. */
  private def ivfPqResidualFullSql(corpusSrc: String,
                                   headCtes: String = ""): String = {
    val coarseDist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", Dim)
    val dot = VecFns.ddbDot("p.embedding", "r.recon", Dim)
    val np = VecFns.ddbNorm("p.embedding", Dim)
    val nr = VecFns.ddbNorm("r.recon", Dim)
    val chains = (0 until PqM).map { s =>
      val lo = s * PqSub + 1; val hi = (s + 1) * PqSub
      val encDist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", PqSub)
      s"""sub${s}s AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM smp),
         |${kmeansTrainSqlCtesOver(s"sub${s}s", kLimit = "(SELECT ks FROM ksv)", dim = PqSub, suffix = s"_p$s")},
         |sub${s}f AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM resf),
         |enc$s AS (
         |  SELECT vec_id, $s AS s, centroid FROM (
         |    SELECT e.vec_id, c.centroid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $encDist ASC, c.cid ASC) AS rn
         |    FROM sub${s}f e CROSS JOIN c2_p$s c
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $headCtes${kmeansTrainSqlCtesOver(corpusSrc)},
       |ksv AS (SELECT LEAST(256, GREATEST(16, CAST(FLOOR(COUNT(*) / 32.0) AS BIGINT))) AS ks FROM $corpusSrc),
       |rk AS MATERIALIZED (
       |  SELECT vec_id, embedding, cid, rn FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $coarseDist ASC, c.cid ASC) AS rn
       |    FROM $corpusSrc e CROSS JOIN c2 c
       |  ) WHERE rn <= 2
       |),
       |resf AS MATERIALIZED (
       |  SELECT a.vec_id, a.cid,
       |    list_transform(range($Dim), i -> a.embedding[i+1]::DOUBLE - c.centroid[i+1]) AS embedding
       |  FROM (SELECT vec_id, embedding, cid FROM rk WHERE rn = 1) a
       |  JOIN c2 c ON a.cid = c.cid
       |),
       |smp AS (
       |  SELECT vec_id, embedding FROM resf
       |  WHERE ((vec_id % 1000000007) * 2654435761) % 1000000007 % 4 = 0
       |),
       |$chains,
       |rc AS MATERIALIZED (
       |  SELECT vec_id, flatten(list(centroid ORDER BY s)) AS recon
       |  FROM (SELECT * FROM enc0 UNION ALL SELECT * FROM enc1 UNION ALL
       |        SELECT * FROM enc2 UNION ALL SELECT * FROM enc3 UNION ALL
       |        SELECT * FROM enc4 UNION ALL SELECT * FROM enc5 UNION ALL
       |        SELECT * FROM enc6 UNION ALL SELECT * FROM enc7)
       |  GROUP BY vec_id
       |),
       |rcf AS MATERIALIZED (
       |  SELECT r.vec_id,
       |    list_transform(range($Dim), i -> c.centroid[i+1] + r.recon[i+1]) AS recon
       |  FROM rc r JOIN resf a ON a.vec_id = r.vec_id JOIN c2 c ON c.cid = a.cid
       |),
       |sims AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $dot / ($np * $nr) AS sim
       |  FROM rk p JOIN (SELECT * FROM rk WHERE rn = 1) b
       |    ON p.cid = b.cid AND p.vec_id <> b.vec_id
       |  JOIN rcf r ON r.vec_id = b.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS adc_sim
       |FROM (
       |  SELECT vec_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims
       |) WHERE rank <= 3""".stripMargin
  }

  /** q130/q131: the maintained store at the PRODUCTION CODEC — q124's
    * incremental IVF-PQ with [[graft.operators.IncrementalIvfPq
    * .writeIndex]]'s `residual = true`: codebooks train on the SEED's
    * residuals `x − c(cell(x))` (Jégou §IV.B — the true FAISS
    * `IVFxx,PQyy` encoding, which the measured recall ladder shows is
    * the right codec whenever the corpus clusters), both quantizers
    * freeze, the held-out 10% ingests as residual codes against them,
    * and search reconstructs centroid + decode. q131 stacks q128's
    * exact re-rank refine on the SAME store — the full FAISS
    * `IVFxx,PQyy + RefineFlat` production stack, maintained
    * incrementally, under one oracle. The oracle replays q125's
    * residual pipeline with seed-only training (coarse chain on the
    * seed, codebook chains on the SEED's residual sample) and a
    * full-corpus residual encode — the q124 maintenance invariant at
    * the residual codec. */
  private val ivfPqResRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfPqResStore(spark: SparkSession, dir: String): String =
    ivfPqResRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("incivfpqres", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      graft.operators.IncrementalIvfPq.writeIndex(
        e.filter(col("vec_id") % 10 =!= 7), r, Dim, k = SemK, iters = SemKIters,
        residual = true)
      graft.operators.IncrementalIvfPq.ingestBatch(
        spark, r, e.filter(col("vec_id") % 10 === 7), batchId = 1L)
      r
    })

  def q130IvfPqResIncremental(spark: SparkSession, dir: String): DataFrame =
    graft.operators.IncrementalIvfPq.search(spark, ivfPqResStore(spark, dir),
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      nprobe = 2, topK = 3)

  def q131IvfPqResRefine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    graft.operators.IncrementalIvfPq.searchRefined(
      spark, ivfPqResStore(spark, dir), e, e, nprobe = 2, topK = 3, kFactor = 4)
  }

  /** q135: INCREMENTAL SQ8 — the maintained store at the codec the
    * measured ladder says is the DEFAULT when the corpus lacks cluster
    * structure (recall within 0.1% of full floats at 4×; PQ's 32× is
    * the choice when memory binds AND the corpus clusters). The per-dim
    * (min, max) grid freezes on the 90% seed (`sqstats/` — 128 doubles,
    * a plan literal at search time, not even a broadcast join), the
    * held-out 10% ingests against the frozen grid — deltas landing
    * OUTSIDE the seed's range saturate to [0, 255] on both engines, the
    * production behavior of a frozen quantizer — and search runs q124's
    * cid equi-join with the 4×-compressed build side. The oracle
    * replays seed-only stats + coarse training, the clamped full-corpus
    * encode-to-recon, and the identical probe/rerank. */
  private val ivfSq8Roots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def q135IvfSq8Incremental(spark: SparkSession, dir: String): DataFrame = {
    val root = ivfSq8Roots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("incivfsq8", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      graft.operators.IncrementalIvfPq.writeIndexSq8(
        e.filter(col("vec_id") % 10 =!= 7), r, Dim, k = SemK, iters = SemKIters)
      graft.operators.IncrementalIvfPq.ingestBatch(
        spark, r, e.filter(col("vec_id") % 10 === 7), batchId = 1L)
      r
    })
    graft.operators.IncrementalIvfPq.search(spark, root,
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      nprobe = 2, topK = 3)
  }

  private def ivfSq8SeedSql(coarseKLimit: String = SemK.toString,
                            headCtes: String = ""): String = {
    val coarseDist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", Dim)
    val dot = VecFns.ddbDot("p.embedding", "r.recon", Dim)
    val np = VecFns.ddbNorm("p.embedding", Dim)
    val nr = VecFns.ddbNorm("r.recon", Dim)
    s"""WITH emb_seed AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 7
       |),
       |$headCtes${kmeansTrainSqlCtesOver("emb_seed", kLimit = coarseKLimit)},
       |stats AS (
       |  SELECT t.i AS i,
       |    min(e.embedding[t.i + 1]::DOUBLE) AS mn,
       |    max(e.embedding[t.i + 1]::DOUBLE) AS mx
       |  FROM emb_seed e, range($Dim) t(i)
       |  GROUP BY t.i
       |),
       |s AS (
       |  SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs FROM stats
       |),
       |rk AS MATERIALIZED (
       |  SELECT vec_id, embedding, cid, rn FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $coarseDist ASC, c.cid ASC) AS rn
       |    FROM embeddings e CROSS JOIN c2 c
       |  ) WHERE rn <= 2
       |),
       |coded AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(range($Dim), i ->
       |      CASE WHEN s.maxs[i+1] = s.mins[i+1] THEN s.mins[i+1]
       |      ELSE s.mins[i+1]
       |        + least(255.0::DOUBLE, greatest(0.0::DOUBLE,
       |            floor((embedding[i+1]::DOUBLE - s.mins[i+1])
       |                  / ((s.maxs[i+1] - s.mins[i+1]) / 255.0) + 0.5)))
       |          * ((s.maxs[i+1] - s.mins[i+1]) / 255.0)
       |      END) AS recon
       |  FROM embeddings, s
       |),
       |sims AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $dot / ($np * $nr) AS sim
       |  FROM rk p JOIN (SELECT * FROM rk WHERE rn = 1) b
       |    ON p.cid = b.cid AND p.vec_id <> b.vec_id
       |  JOIN coded r ON r.vec_id = b.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS adc_sim
       |FROM (
       |  SELECT vec_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims
       |) WHERE rank <= 3""".stripMargin
  }

  val q135IvfSq8IncrementalSql: String = ivfSq8SeedSql()

  /** q136: q135's incremental SQ8 at PRODUCTION-DERIVED coarse width —
    * the q127 lever applied to the SQ8 store. q135 pins k = SemK for
    * the gate (cells of N/32 → candidate join nprobe·N²/32); q136 runs
    * `writeIndexSq8`'s default `kFor(seedN)` (√N cells → nprobe·N·√N),
    * the oracle deriving the same k via a scalar-subquery √N. Every
    * pinned gate query in the maintained-ANN family now has its derived
    * production twin (q124→q127, q130→q133/q134, q135→q136). */
  private val ivfSq8ScaledRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def q136IvfSq8Scaled(spark: SparkSession, dir: String): DataFrame = {
    val root = ivfSq8ScaledRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("incivfsq8sc", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      graft.operators.IncrementalIvfPq.writeIndexSq8(
        e.filter(col("vec_id") % 10 =!= 7), r, Dim, iters = SemKIters)
      graft.operators.IncrementalIvfPq.ingestBatch(
        spark, r, e.filter(col("vec_id") % 10 === 7), batchId = 1L)
      r
    })
    graft.operators.IncrementalIvfPq.search(spark, root,
      Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      nprobe = 2, topK = 3)
  }

  val q136IvfSq8ScaledSql: String = ivfSq8SeedSql(
    coarseKLimit = "(SELECT k FROM kv)",
    headCtes =
      """kv AS (SELECT GREATEST(4, LEAST(262144, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS k FROM emb_seed),
        |""".stripMargin)

  /** The q130/q131 oracle: q125's residual replay with SEED-ONLY
    * training. Coarse chain on `emb_seed`, ksv from the seed count, rk =
    * full-corpus assignment against the frozen c2, resf = full-corpus
    * residuals, smp = the SEED's residual sample (the store's codebooks
    * never saw the delta), chains train on smp and encode resf,
    * reconstruction re-adds the centroid. `refine` > 0 appends q128's
    * exact-rerank tail; `coarseKLimit`/`corpusSrc`/`candFilter`/
    * `headCtes` parameterize the same levers as [[ivfPqSearchSqlOver]]
    * (q133 turns them ALL on). */
  private def ivfPqResidualSeedSql(refine: Int,
                                   coarseKLimit: String = SemK.toString,
                                   corpusSrc: String = "embeddings",
                                   candFilter: String = "",
                                   headCtes: String = "",
                                   seedBody: String =
                                     "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 7",
                                   smpSeedFilter: String = "vec_id % 10 <> 7\n    AND "): String = {
    val coarseDist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", Dim)
    val dot = VecFns.ddbDot("p.embedding", "r.recon", Dim)
    val np = VecFns.ddbNorm("p.embedding", Dim)
    val nr = VecFns.ddbNorm("r.recon", Dim)
    val tail =
      if (refine <= 0)
        s"""SELECT vec_id, neighbor_id, rank, round(sim, 4) AS adc_sim
           |FROM (
           |  SELECT vec_id, neighbor_id, sim,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY sim DESC, neighbor_id ASC) AS rank
           |  FROM sims
           |) WHERE rank <= 3""".stripMargin
      else {
        val xdot = VecFns.ddbDot("p.embedding", "b.embedding", Dim)
        val xnp = VecFns.ddbNorm("p.embedding", Dim)
        val xnb = VecFns.ddbNorm("b.embedding", Dim)
        s""", adc AS (
           |  SELECT vec_id, neighbor_id FROM (
           |    SELECT vec_id, neighbor_id,
           |      row_number() OVER (PARTITION BY vec_id
           |        ORDER BY sim DESC, neighbor_id ASC) AS rank
           |    FROM sims
           |  ) WHERE rank <= $refine
           |),
           |ref AS (
           |  SELECT a.vec_id AS vec_id, a.neighbor_id AS neighbor_id,
           |    $xdot / ($xnp * $xnb) AS sim
           |  FROM adc a
           |  JOIN embeddings p ON p.vec_id = a.vec_id
           |  JOIN embeddings b ON b.vec_id = a.neighbor_id
           |)
           |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS exact_sim
           |FROM (
           |  SELECT vec_id, neighbor_id, sim,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY sim DESC, neighbor_id ASC) AS rank
           |  FROM ref
           |) WHERE rank <= 3""".stripMargin
      }
    val chains = (0 until PqM).map { s =>
      val lo = s * PqSub + 1; val hi = (s + 1) * PqSub
      val encDist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", PqSub)
      s"""sub${s}s AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM smp),
         |${kmeansTrainSqlCtesOver(s"sub${s}s", kLimit = "(SELECT ks FROM ksv)", dim = PqSub, suffix = s"_p$s")},
         |sub${s}f AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM resf),
         |enc$s AS (
         |  SELECT vec_id, $s AS s, centroid FROM (
         |    SELECT e.vec_id, c.centroid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $encDist ASC, c.cid ASC) AS rn
         |    FROM sub${s}f e CROSS JOIN c2_p$s c
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH emb_seed AS MATERIALIZED (
       |  $seedBody
       |),
       |$headCtes${kmeansTrainSqlCtesOver("emb_seed", kLimit = coarseKLimit)},
       |ksv AS (SELECT LEAST(256, GREATEST(16, CAST(FLOOR(COUNT(*) / 32.0) AS BIGINT))) AS ks FROM emb_seed),
       |rk AS MATERIALIZED (
       |  SELECT vec_id, embedding, cid, rn FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $coarseDist ASC, c.cid ASC) AS rn
       |    FROM $corpusSrc e CROSS JOIN c2 c
       |  ) WHERE rn <= 2
       |),
       |resf AS MATERIALIZED (
       |  SELECT a.vec_id, a.cid,
       |    list_transform(range($Dim), i -> a.embedding[i+1]::DOUBLE - c.centroid[i+1]) AS embedding
       |  FROM (SELECT vec_id, embedding, cid FROM rk WHERE rn = 1) a
       |  JOIN c2 c ON a.cid = c.cid
       |),
       |smp AS (
       |  SELECT vec_id, embedding FROM resf
       |  WHERE $smpSeedFilter((vec_id % 1000000007) * 2654435761) % 1000000007 % 4 = 0
       |),
       |$chains,
       |rc AS MATERIALIZED (
       |  SELECT vec_id, flatten(list(centroid ORDER BY s)) AS recon
       |  FROM (SELECT * FROM enc0 UNION ALL SELECT * FROM enc1 UNION ALL
       |        SELECT * FROM enc2 UNION ALL SELECT * FROM enc3 UNION ALL
       |        SELECT * FROM enc4 UNION ALL SELECT * FROM enc5 UNION ALL
       |        SELECT * FROM enc6 UNION ALL SELECT * FROM enc7)
       |  GROUP BY vec_id
       |),
       |rcf AS MATERIALIZED (
       |  SELECT r.vec_id,
       |    list_transform(range($Dim), i -> c.centroid[i+1] + r.recon[i+1]) AS recon
       |  FROM rc r JOIN resf a ON a.vec_id = r.vec_id JOIN c2 c ON c.cid = a.cid
       |),
       |sims AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $dot / ($np * $nr) AS sim
       |  FROM rk p JOIN (SELECT * FROM rk WHERE rn = 1) b
       |    ON p.cid = b.cid AND p.vec_id <> b.vec_id $candFilter
       |  JOIN rcf r ON r.vec_id = b.vec_id
       |)
       |$tail""".stripMargin
  }

  val q130IvfPqResIncrementalSql: String = ivfPqResidualSeedSql(refine = 0)
  val q131IvfPqResRefineSql: String = ivfPqResidualSeedSql(refine = 12)

  /** q133: the PRODUCTION DEFAULT — every lever of the maintained ANN
    * index on at once, under one oracle: DERIVED widths (coarse
    * k = `kFor(seedN)` √N cells, codebook ks = `ksFor` — writeIndex's
    * defaults), the RESIDUAL codec (the ladder's winner on clustered
    * corpora), idempotent delta ingest against frozen quantizers,
    * TOMBSTONED deletes crossing seed and delta, a METADATA candidate
    * filter (label < 3), and the exact re-rank REFINE stage. This is the
    * configuration a user would actually deploy — FAISS
    * `IVF√N,PQ8 + RefineFlat` with filtered search and deletes,
    * incrementally maintained — and the oracle replays all of it:
    * √N-limit seed training, residual codebook chains, live-corpus
    * (post-delete) encode and probes, the IN-subquery filter, the
    * shortlist-then-rerank tail. */
  private val ivfPqProdRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def q133IvfPqProduction(spark: SparkSession, dir: String): DataFrame = {
    val root = ivfPqProdRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("incivfpqprod", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      graft.operators.IncrementalIvfPq.writeIndex(
        e.filter(col("vec_id") % 10 =!= 7), r, Dim, iters = SemKIters,
        residual = true)
      graft.operators.IncrementalIvfPq.ingestBatch(
        spark, r, e.filter(col("vec_id") % 10 === 7), batchId = 1L)
      graft.operators.IncrementalIvfPq.deleteBatch(
        spark, r, e.filter(col("vec_id") % 9 === 4).select("vec_id"), batchId = 1L)
      r
    })
    val e = Tables.embeddings(spark, dir)
    graft.operators.IncrementalIvfPq.searchRefined(
      spark, root,
      probes = e.select("vec_id", "embedding").filter(col("vec_id") % 9 =!= 4),
      corpus = e.select("vec_id", "embedding"),
      nprobe = 2, topK = 3, kFactor = 4,
      allowed = Some(e.filter(col("label") < 3).select("vec_id")))
  }

  /** The q134 oracle (exposed for [[FileStreamQueries]]): the
    * derived-width residual store searched plain — √N coarse cells,
    * residual codebooks from the seed, full-corpus encode. A streamed
    * ingest must land the store exactly here (stream ≡ batch ≡ rebuild
    * at the production codec). */
  val ivfPqResDerivedSql: String = ivfPqResidualSeedSql(
    refine = 0,
    coarseKLimit = "(SELECT k FROM kv)",
    headCtes =
      """kv AS (SELECT GREATEST(4, LEAST(262144, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS k FROM emb_seed),
        |""".stripMargin)

  // Training replays the FULL seed (the store's quantizers froze BEFORE
  // the delete batch, so later-deleted seed rows did shape the
  // codebooks); only probes and candidates restrict to live ∧ allowed —
  // unary predicates legally folded into the inner join's ON clause.
  val q133IvfPqProductionSql: String = ivfPqResidualSeedSql(
    refine = 12,
    coarseKLimit = "(SELECT k FROM kv)",
    candFilter = ("AND p.vec_id % 9 <> 4 AND b.vec_id % 9 <> 4 " +
      "AND b.vec_id IN (SELECT vec_id FROM embeddings WHERE label < 3)"),
    headCtes =
      """kv AS (SELECT GREATEST(4, LEAST(262144, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS k FROM emb_seed),
        |""".stripMargin)

  /** q123: the DRIFT-TRIGGERED RETRAIN LOOP under the oracle gate — the
    * last spec-only piece of the IVF lifecycle made driver-checked.
    * Build the store on the 90% seed, present a DETERMINISTIC drifted
    * delta (the held-out 10% scaled ×4 — a power-of-two scale, so the
    * shift is bit-exact in both engines' float arithmetic), MEASURE the
    * drift signal (must exceed [[graft.operators.IncrementalIvf
    * .DriftRetrainThreshold]] — require()d, so the query fails loudly if
    * the trigger premise ever breaks), ingest the delta, snapshot-
    * retrain on the full maintained corpus, and search the retrained
    * index. The oracle replays the POST-RETRAIN training from scratch
    * over seed ∪ scaled-delta and the identical probe/rerank — hash-
    * proving `search(retrain(ingest(drifted)))` ≡ the from-scratch
    * rebuild, i.e. the maintenance loop leaves no residue of the
    * pre-drift quantizer. */
  private val driftStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def q123DriftRetrain(spark: SparkSession, dir: String): DataFrame = {
    val root = driftStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("driftivf", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      graft.operators.IncrementalIvf.writeIndex(
        e.filter(col("vec_id") % 10 =!= 7), r, SemK, SemKIters)
      val delta = e.filter(col("vec_id") % 10 === 7)
        .withColumn("embedding", transform(col("embedding"), x => x * lit(4.0f)))
      val drift = graft.operators.IncrementalIvf.assignmentDrift(spark, r, delta)
      require(drift > graft.operators.IncrementalIvf.DriftRetrainThreshold,
        f"q123 premise broken: scaled delta must trip the retrain trigger (drift=$drift%.3f)")
      graft.operators.IncrementalIvf.ingestBatch(spark, r, delta, batchId = 1L)
      graft.operators.IncrementalIvf.retrain(spark, r, SemK, SemKIters)
      r
    })
    graft.operators.IncrementalIvf.search(spark, root,
      graft.operators.IncrementalIvf.index(spark, root).select("vec_id", "embedding"),
      nprobe = 2, topK = 3)
  }

  val q123DriftRetrainSql: String = {
    val dist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", Dim)
    val dot = VecFns.ddbDot("p.embedding", "b.embedding", Dim)
    val np = VecFns.ddbNorm("p.embedding", Dim)
    val nb = VecFns.ddbNorm("b.embedding", Dim)
    // ×4 is exact in FLOAT and DOUBLE alike (exponent shift), so the
    // drifted corpus is bit-identical across engines
    s"""WITH emb2 AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 7
       |  UNION ALL
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x * 4 AS FLOAT)) AS embedding
       |  FROM embeddings WHERE vec_id % 10 = 7
       |),
       |${kmeansTrainSqlCtesOver("emb2")},
       |rk AS (
       |  SELECT vec_id, embedding, cid, rn FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $dist ASC, c.cid ASC) AS rn
       |    FROM emb2 e CROSS JOIN c2 c
       |  ) WHERE rn <= 2
       |),
       |sims AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $dot / ($np * $nb) AS sim
       |  FROM rk p JOIN (SELECT * FROM rk WHERE rn = 1) b
       |    ON p.cid = b.cid AND p.vec_id <> b.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS cosine_sim
       |FROM (
       |  SELECT vec_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims
       |) WHERE rank <= 3""".stripMargin
  }

  /** q137: the CODEC ADVISOR under the oracle gate — [[graft.operators
    * .IncrementalIvfPq.recommendCodec]]'s full decision procedure as a
    * driver-checked query, so the number that steers the whole codec
    * ladder (which compression a 100 TB store should deploy) is itself
    * hash-proven, not just spec-asserted. The procedure is exactly the
    * advisor's contract run on the sample `writeIndex` would train on:
    * the deterministic 1-in-4 multiplicative-hash sample, coarse
    * k = `kFor(|sample|)` (√N of the SAMPLE — recommendCodec's own
    * default for the frame it is handed), two Lloyd rounds, then
    * `explained = 1 − E‖x − c(x)‖² / E‖x − mean‖²` over the sample.
    * Output: (explained_bp = round(explained·10⁴) — basis points, an
    * integer so cross-engine double-summation wobble (~1e-12 relative)
    * cannot surface in the hash — and the codec decision at
    * [[graft.operators.IncrementalIvfPq.CodecThreshold]]). The DuckDB
    * oracle replays the sampled training (the q118 CTE recipe with k
    * derived from the sample), the nearest-centroid residual variance,
    * the per-dimension mean vector, and the same threshold. */
  def q137CodecAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val smp = e.filter(
      pmod(pmod(col("vec_id"), lit(1000000007L)) * 2654435761L,
        lit(1000000007L)) % 4 === 0)
    val ev = graft.operators.IncrementalIvfPq.explainedVariance(smp, iters = SemKIters)
    val codec =
      if (ev >= graft.operators.IncrementalIvfPq.CodecThreshold) "residual" else "sq8"
    import spark.implicits._
    Seq((math.round(ev * 10000), codec)).toDF("explained_bp", "codec")
  }

  val q137CodecAdvisorSql: String = {
    val dist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", Dim)
    val mdist = VecFns.ddbL2DistSq("e.embedding", "g.centroid", Dim)
    s"""WITH smp AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE ((vec_id % 1000000007) * 2654435761) % 1000000007 % 4 = 0
       |),
       |kv AS (SELECT GREATEST(4, LEAST(262144, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS k FROM smp),
       |${kmeansTrainSqlCtesOver("smp", kLimit = "(SELECT k FROM kv)")},
       |asg AS (
       |  SELECT vec_id, dist FROM (
       |    SELECT e.vec_id, $dist AS dist,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $dist ASC, c.cid ASC) AS rn
       |    FROM smp e CROSS JOIN c2 c
       |  ) WHERE rn = 1
       |),
       |rv AS (SELECT avg(dist) AS v FROM asg),
       |gm AS (
       |  SELECT list(cx ORDER BY pos) AS centroid FROM (
       |    SELECT pos, avg(x) AS cx FROM (
       |      SELECT unnest(embedding)::DOUBLE AS x,
       |             generate_subscripts(embedding, 1) AS pos FROM smp)
       |    GROUP BY pos)
       |),
       |tv AS (SELECT avg($mdist) AS v FROM smp e CROSS JOIN gm g)
       |SELECT CAST(round((1.0 - rv.v / tv.v) * 10000, 0) AS BIGINT) AS explained_bp,
       |  CASE WHEN (1.0 - rv.v / tv.v) >= 0.2 THEN 'residual' ELSE 'sq8' END AS codec
       |FROM rv, tv""".stripMargin
  }

  /** Deterministic structured-mixture corpus — the measured recall
    * ladder's clustered test case (tools.PqRecallProbe `structured`
    * mode), derived from the SAME testdata rows: cluster = vec_id mod
    * 32, center = a fixed multiplicative hash of (cluster, dim) scaled
    * to [−1, 1], vector = 0.7·center + 0.3·original — the
    * mixture-of-Gaussians shape real embedding encoders produce (the
    * testdata embeddings themselves are isotropic: PQ's worst case).
    * The hash is `((c·dim + d) · 2654435761) mod 2000001` — plain
    * 64-bit integer arithmetic, bit-identical in Spark and DuckDB (the
    * probe's original xxhash64 had no cross-engine twin, which is what
    * kept this corpus out of the oracle gate until now). */
  private[graft] def mixtureCorpus(e0: DataFrame, cluster: Column): DataFrame =
    e0.withColumn("c", cluster)
      .withColumn("embedding", transform(col("embedding"), (x, d) =>
        (lit(0.7) * (pmod((col("c") * Dim + d.cast("long")) * lit(2654435761L),
            lit(2000001L)).cast("double") / lit(1000000.0) - lit(1.0))
          + lit(0.3) * x).cast("float")))
      .select("vec_id", "embedding")

  private[graft] def structuredCorpus(e0: DataFrame): DataFrame =
    mixtureCorpus(e0, pmod(col("vec_id"), lit(32L)))

  /** [[structuredCorpus]] with a HOT cell: cluster 0 (vec_id % 5 == 0
    * collapsed in, ≈22% of the corpus incl. its uniform share) carries
    * NO noise — every cluster-0 vector IS the center, exactly. This is
    * the duplicate-heavy shape web-scale corpora actually have (boiler-
    * plate pages, repeated templates), and it is the hot-cell case
    * training cannot dissolve: a noisy dense region attracts several
    * centroids and k-means splits it (measured — a 0.7/0.3 hot mixture
    * trained to a max cell share of only 7%), but exact duplicates all
    * land in ONE cell by the deterministic (dist, cid) tiebreak no
    * matter how many centroids sit on the point (the extra seeds go
    * member-less). The result: the search's cid equi-join sees a real
    * hot key — the q139/AnnSkewGateSpec corpus. */
  private[graft] def hotCellCorpus(e0: DataFrame): DataFrame = {
    val cluster = when(pmod(col("vec_id"), lit(5L)) === 0L, lit(0L))
      .otherwise(pmod(col("vec_id"), lit(32L)))
    e0.withColumn("c", cluster)
      .withColumn("embedding", transform(col("embedding"), (x, d) => {
        val center = pmod((col("c") * Dim + d.cast("long")) * lit(2654435761L),
          lit(2000001L)).cast("double") / lit(1000000.0) - lit(1.0)
        when(col("c") === 0L, center.cast("float"))
          .otherwise((lit(0.7) * center + lit(0.3) * x).cast("float"))
      }))
      .select("vec_id", "embedding")
  }

  /** The mixture CTE twin of [[mixtureCorpus]] (same ops, same
    * parenthesization — double arithmetic is IEEE-deterministic given
    * the same tree, and the final FLOAT cast rounds identically).
    * `clusterSql` is the cluster-id expression over `vec_id`. */
  private def mixtureCorpusCte(name: String, clusterSql: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(range($Dim), d ->
       |      CAST(0.7 * (((((($clusterSql) * $Dim + d) * 2654435761) % 2000001)::DOUBLE / 1000000.0) - 1.0)
       |           + 0.3 * embedding[d+1]::DOUBLE AS FLOAT)) AS embedding
       |  FROM embeddings
       |)""".stripMargin

  private val structuredCorpusCte: String =
    mixtureCorpusCte("emb_struct", "vec_id % 32")

  /** CTE twin of [[hotCellCorpus]] — cluster-0 rows are the exact
    * center (the pure-hash branch), others the 0.7/0.3 mixture; same
    * expression trees as the Spark side. */
  private val hotCellCorpusCte: String = {
    val cSql = "CASE WHEN vec_id % 5 = 0 THEN 0 ELSE vec_id % 32 END"
    s"""emb_hot AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(range($Dim), d ->
       |      CASE WHEN ($cSql) = 0
       |        THEN CAST((((($cSql) * $Dim + d) * 2654435761) % 2000001)::DOUBLE / 1000000.0 - 1.0 AS FLOAT)
       |        ELSE CAST(0.7 * ((((($cSql) * $Dim + d) * 2654435761) % 2000001)::DOUBLE / 1000000.0 - 1.0)
       |             + 0.3 * embedding[d+1]::DOUBLE AS FLOAT) END) AS embedding
       |  FROM embeddings
       |)""".stripMargin
  }

  /** q138: RESIDUAL IVF-PQ ON THE STRUCTURED CORPUS — the query that
    * puts the recall ladder's HEADLINE ("residual-PQ triples raw-PQ's
    * recall on clustered corpora — the case IVF-PQ exists for") under
    * the driver gate: until now that claim lived in tools.PqRecallProbe,
    * outside the oracle. The corpus is the pinned deterministic
    * mixture ([[structuredCorpus]]); the pipeline is q125's exactly —
    * full-corpus coarse training (k = SemK, matching the probe's 32
    * clusters), residual codebooks on the 1-in-4 sample, encode, cid
    * equi-join probe, LUT reconstruction + centroid re-add, ADC top-3.
    * The DuckDB oracle replays q125's whole replay over the same
    * generated corpus — so both the generator AND the codec pipeline
    * are hash-proven end-to-end, and the ladder's structured numbers
    * (BASELINE.md) now reproduce from a gated query. */
  private val pqrStructRoots = new java.util.concurrent.ConcurrentHashMap[String, (String, String, String)]()

  private def pqrStructStore(spark: SparkSession, dir: String): (String, String, String) =
    pqrStructRoots.computeIfAbsent(dir, { d =>
      val rk = graft.core.StorePaths.root("structcents", d)
      val rb = graft.core.StorePaths.root("pqrsbook", d)
      val rc = graft.core.StorePaths.root("pqrscodes", d)
      val e = structuredCorpus(Tables.embeddings(spark, d).select("vec_id", "embedding"))
      val (cents0, _) = graft.ml.KMeans.fit(e, SemK, SemKIters)
      cents0.coalesce(1).write.mode("overwrite").parquet(rk)
      cents0.unpersist()
      val cents = spark.read.parquet(rk)
      val asg = graft.ml.KMeans.assign(e, cents).select(col("vec_id"), col("cid"))
      val res = e.join(asg, Seq("vec_id"))
        .join(broadcast(cents), Seq("cid"))
        .select(col("vec_id"), col("cid"),
          zip_with(col("embedding"), col("centroid"),
            (x, c) => x.cast("double") - c).as("embedding"))
      val ks = graft.ml.ProductQuantizer.ksFor(e.count())
      graft.ml.ProductQuantizer
        .train(res.select("vec_id", "embedding"), Dim, PqM, ks, SemKIters, denom = 4)
        .coalesce(1).write.mode("overwrite").parquet(rb)
      val book = spark.read.parquet(rb)
      graft.ml.ProductQuantizer.encode(res.select("vec_id", "embedding"), book, Dim, PqM)
        .join(res.select("vec_id", "cid"), Seq("vec_id"))
        .write.mode("overwrite").parquet(rc)
      (rk, rb, rc)
    })

  def q138IvfPqStructured(spark: SparkSession, dir: String): DataFrame = {
    val (rk, rb, rc) = pqrStructStore(spark, dir)
    val book = spark.read.parquet(rb)
    val cents = spark.read.parquet(rk)
    val dec = graft.ml.ProductQuantizer.decodeExpr(spark, book, PqM)
    val cand = spark.read.parquet(rc)
      .join(broadcast(cents), Seq("cid"))
      .withColumn("recon", zip_with(col("centroid"), dec(col("codes")), (c, r) => c + r))
      .withColumn("rnrm", NativeVecFns.norm(spark, col("recon")))
      .select(col("cid"), col("vec_id").as("b_id"), col("recon"), col("rnrm"))
    ivfRanked(structuredCorpus(Tables.embeddings(spark, dir)), cents, nprobe = 2)
      .select(col("cid"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      .join(cand, Seq("cid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("recon")) / (col("a_nrm") * col("rnrm")))
      .groupBy("a_id")
      .agg(TopKAgg.topKByScore(spark, col("sim"), col("b_id"), 3).as("top"))
      .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("adc_sim"))
  }

  val q138IvfPqStructuredSql: String =
    ivfPqResidualFullSql("emb_struct", headCtes = structuredCorpusCte + ",\n")

  /** q139: ANN SEARCH UNDER A HOT CELL — the skew twin for the ANN tier
    * (the q115/q116 treatment): real clustered corpora have Zipf cell
    * occupancy, and a cell holding ~20% of the vectors turns the search's
    * cid equi-join into exactly the hot-key shuffle q116 guards against —
    * both join sides carry the hot cid, so the naive layout funnels
    * ~hot² candidate pairs through one task. The corpus is the pinned
    * deterministic mixture with vec_id % 5 collapsed into cluster 0
    * ([[hotCellCorpus]]); training (k = SemK full fit) and search
    * (nprobe = 2, top-3) are q89's exactly, so the oracle replays the
    * same chain over the hot corpus. Correctness is the gate here;
    * the SKEW evidence lives in AnnSkewGateSpec (measured per-task
    * shares on this very join + the AQE skew-split plan assertion) and
    * the per-round bench row. */
  private val hotCentStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def hotCellCentroids(spark: SparkSession, dir: String): DataFrame = {
    val root = hotCentStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("hotcents", d)
      val vecs = hotCellCorpus(Tables.embeddings(spark, d).select("vec_id", "embedding"))
      val (cents, _) = graft.ml.KMeans.fit(vecs, SemK, SemKIters)
      cents.coalesce(1).write.mode("overwrite").parquet(r)
      cents.unpersist()
      r
    })
    spark.read.parquet(root)
  }

  def q139AnnHotCell(spark: SparkSession, dir: String): DataFrame = {
    val e = hotCellCorpus(Tables.embeddings(spark, dir).select("vec_id", "embedding"))
    ivfProbeRerank(spark,
      ivfRanked(e, hotCellCentroids(spark, dir), nprobe = 2).persist())
  }

  val q139AnnHotCellSql: String =
    ivfSearchSqlOver(kmeansTrainSqlCtesOver("emb_hot"),
      corpusSrc = "emb_hot", headCtes = hotCellCorpusCte + ",\n")

  /** q141: OPQ IN THE MAINTAINED STORE under the oracle gate — the last
    * codec-ladder member without an oracle query (r12 verdict #3). The
    * q124 lifecycle at the "opq" codec on the STRUCTURED corpus (the
    * inter-dimension-correlated case the learned rotation exists for,
    * and the corpus behind the ladder's OPQ row): seed 90% through
    * [[graft.operators.IncrementalIvfPq.writeIndexOpq]] (coarse cells
    * raw-space; R + codebooks from Ge et al.'s alternation, then
    * frozen), ingest the held-out 10% against the frozen quantizers,
    * search with LUT reconstruction in rotated space + plan-literal
    * probe rotation (cos(Ra, b̂) = cos(a, Rᵀb̂)).
    *
    * The ORACLE pins R — the one artifact whose training loop (polar
    * Newton on the Procrustes cross matrix) is not SQL-replayable — as
    * a 4096-double literal captured from the store built by THIS
    * process ([[graft.Verify]] dumps `oracleSql` AFTER running the
    * queries, so the literal is always the learned R, per scale
    * factor), and REPLAYS everything else from scratch: seed-only
    * coarse training, the deterministic rotation of the full corpus
    * (same left-fold GEMV term order), codebook training on the rotated
    * seed's 1-in-4 sample, full-corpus encode, and the probe/rerank —
    * the q124 maintenance invariant at the rotated codec, with only R
    * itself staged (the q138 pinned-input recipe). */
  private val opqStructRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val opqStructR = new java.util.concurrent.ConcurrentHashMap[String, Seq[Double]]()

  private def opqStructStore(spark: SparkSession, dir: String): String =
    opqStructRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("incopq", d)
      val e = structuredCorpus(Tables.embeddings(spark, d).select("vec_id", "embedding"))
      graft.operators.IncrementalIvfPq.writeIndexOpq(
        e.filter(col("vec_id") % 10 =!= 7), r, Dim, k = SemK, iters = SemKIters,
        sweeps = 2)
      graft.operators.IncrementalIvfPq.ingestBatch(
        spark, r, e.filter(col("vec_id") % 10 === 7), batchId = 1L)
      opqStructR.put(d,
        graft.operators.IncrementalIvfPq.rotationOf(spark, r).flatten.toIndexedSeq)
      r
    })

  def q141OpqIncremental(spark: SparkSession, dir: String): DataFrame =
    graft.operators.IncrementalIvfPq.search(spark, opqStructStore(spark, dir),
      structuredCorpus(Tables.embeddings(spark, dir).select("vec_id", "embedding")),
      nprobe = 2, topK = 3)

  /** The q141 oracle, interpolating the learned R captured at store
    * build. Verify always runs the query before dumping SQL; a filtered
    * local run that skips q141 gets a loudly-failing placeholder rather
    * than a silently-wrong replay. */
  def q141OpqIncrementalSql: String = {
    // the dump is process-global (oracleSql has no dir parameter), so a
    // process that built OPQ stores for TWO data dirs cannot know which
    // R the driver will replay against — fail loudly rather than pin a
    // possibly-wrong rotation and produce a spurious oracle mismatch
    if (opqStructR.size() > 1)
      throw new IllegalStateException(
        s"q141 oracle is single-dir per process; stores built for: " +
          String.join(", ", opqStructR.keySet()))
    val it = opqStructR.values().iterator()
    if (!it.hasNext)
      "SELECT 'q141 must run before its oracle dumps (R is captured from the store)' AS error"
    else ivfPqOpqSeedSql(it.next())
  }

  private def ivfPqOpqSeedSql(rFlat: Seq[Double]): String = {
    val coarseDist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", Dim)
    val dot = VecFns.ddbDot("pr.embedding", "r.recon", Dim)
    val np = VecFns.ddbNorm("pr.embedding", Dim)
    val nr = VecFns.ddbNorm("r.recon", Dim)
    // Double.toString emits the shortest decimal that round-trips, and
    // DuckDB's cast parses correctly-rounded — the literal IS the double
    val rLit = rFlat.map(java.lang.Double.toString).mkString("[", ", ", "]")
    val chains = (0 until PqM).map { s =>
      val lo = s * PqSub + 1; val hi = (s + 1) * PqSub
      val encDist = VecFns.ddbL2DistSq("e.embedding", "c.centroid", PqSub)
      s"""sub${s}s AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM smp),
         |${kmeansTrainSqlCtesOver(s"sub${s}s", kLimit = "(SELECT ks FROM ksv)", dim = PqSub, suffix = s"_p$s")},
         |sub${s}f AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM rotf),
         |enc$s AS (
         |  SELECT vec_id, $s AS s, centroid FROM (
         |    SELECT e.vec_id, c.centroid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $encDist ASC, c.cid ASC) AS rn
         |    FROM sub${s}f e CROSS JOIN c2_p$s c
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $structuredCorpusCte,
       |emb_seed AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM emb_struct WHERE vec_id % 10 <> 7
       |),
       |${kmeansTrainSqlCtesOver("emb_seed")},
       |ksv AS (SELECT LEAST(256, GREATEST(16, CAST(FLOOR(COUNT(*) / 32.0) AS BIGINT))) AS ks FROM emb_seed),
       |rmat AS (SELECT $rLit::DOUBLE[] AS r),
       |rotf AS MATERIALIZED (
       |  SELECT e.vec_id,
       |    list_transform(range($Dim), i ->
       |      list_reduce(list_prepend(0.0::DOUBLE,
       |        list_transform(range($Dim), j -> m.r[i*$Dim + j + 1] * e.embedding[j+1]::DOUBLE)),
       |        (a, b) -> a + b)) AS embedding
       |  FROM emb_struct e CROSS JOIN rmat m
       |),
       |smp AS (
       |  SELECT vec_id, embedding FROM rotf
       |  WHERE vec_id % 10 <> 7
       |    AND ((vec_id % 1000000007) * 2654435761) % 1000000007 % 4 = 0
       |),
       |$chains,
       |rc AS MATERIALIZED (
       |  SELECT vec_id, flatten(list(centroid ORDER BY s)) AS recon
       |  FROM (SELECT * FROM enc0 UNION ALL SELECT * FROM enc1 UNION ALL
       |        SELECT * FROM enc2 UNION ALL SELECT * FROM enc3 UNION ALL
       |        SELECT * FROM enc4 UNION ALL SELECT * FROM enc5 UNION ALL
       |        SELECT * FROM enc6 UNION ALL SELECT * FROM enc7)
       |  GROUP BY vec_id
       |),
       |rk AS MATERIALIZED (
       |  SELECT vec_id, cid, rn FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $coarseDist ASC, c.cid ASC) AS rn
       |    FROM emb_struct e CROSS JOIN c2 c
       |  ) WHERE rn <= 2
       |),
       |sims AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    $dot / ($np * $nr) AS sim
       |  FROM rk p JOIN (SELECT * FROM rk WHERE rn = 1) b
       |    ON p.cid = b.cid AND p.vec_id <> b.vec_id
       |  JOIN rc r ON r.vec_id = b.vec_id
       |  JOIN rotf pr ON pr.vec_id = p.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(sim, 4) AS adc_sim
       |FROM (
       |  SELECT vec_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sims
       |) WHERE rank <= 3""".stripMargin
  }

  /** q142: DRIFT-TRIGGERED RETRAIN AT THE PRODUCTION CODEC — q123's
    * maintenance loop on the COMPRESSED store ([[graft.operators
    * .IncrementalIvfPq]], residual codec, derived widths — q133's
    * configuration), closing the r13 verdict's "no retrain path on the
    * compressed store" gap under the oracle gate. Seed the store on the
    * 90%, present the deterministic drifted delta (held-out 10% scaled
    * ×4 — exact in float), MEASURE the drift signal (must exceed
    * [[graft.operators.IncrementalIvf.DriftRetrainThreshold]] —
    * require()d, the trigger premise fails loudly), ingest, then
    * snapshot-[[graft.operators.IncrementalIvfPq.retrain]] on the full
    * maintained corpus (the raw vectors — the system of record; the
    * 8-byte codes are lossy, so retraining reads the corpus exactly as
    * [[graft.operators.IncrementalIvfPq.searchRefined]]'s refine stage
    * does) and search the retrained store. The oracle replays the
    * POST-RETRAIN state from scratch: coarse √N training on seed ∪
    * scaled-delta, residual codebook chains on the full corpus's 1-in-4
    * sample, full re-encode, ADC probe/rerank — hash-proving
    * `search(retrain(ingest(drifted)))` ≡ the from-scratch rebuild at
    * the compressed codec: no residue of the pre-drift quantizers,
    * codebooks, or stats baseline survives the swap. */
  private val driftPqRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def driftedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    e.filter(col("vec_id") % 10 =!= 7).unionByName(
      e.filter(col("vec_id") % 10 === 7)
        // ×4 is an exponent shift — exact in FLOAT, bit-identical across
        // engines (the q123 drifted-delta recipe)
        .withColumn("embedding", transform(col("embedding"), x => x * lit(4.0f))))
  }

  def q142PqDriftRetrain(spark: SparkSession, dir: String): DataFrame = {
    val root = driftPqRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("driftivfpq", d)
      val e = Tables.embeddings(spark, d).select("vec_id", "embedding")
      val seed = e.filter(col("vec_id") % 10 =!= 7)
      val delta = e.filter(col("vec_id") % 10 === 7)
        .withColumn("embedding", transform(col("embedding"), x => x * lit(4.0f)))
      graft.operators.IncrementalIvfPq.writeIndex(
        seed, r, Dim, iters = SemKIters, residual = true)
      val drift = graft.operators.IncrementalIvfPq.assignmentDrift(spark, r, delta)
      require(drift > graft.operators.IncrementalIvf.DriftRetrainThreshold,
        f"q142 premise broken: scaled delta must trip the retrain trigger (drift=$drift%.3f)")
      graft.operators.IncrementalIvfPq.ingestBatch(spark, r, delta, batchId = 1L)
      graft.operators.IncrementalIvfPq.retrain(
        spark, r, corpus = seed.unionByName(delta), dim = Dim, iters = SemKIters)
      r
    })
    graft.operators.IncrementalIvfPq.search(
      spark, root, driftedCorpus(spark, dir), nprobe = 2, topK = 3)
  }

  /** The q142 oracle: the residual-seed replay with BOTH training and
    * corpus swapped to the post-drift union — seed = sample base = the
    * full drifted corpus (retrain re-derives every width from it: coarse
    * k = ⌈√N⌉, codebook ks = N/32 clamped). */
  val q142PqDriftRetrainSql: String = ivfPqResidualSeedSql(
    refine = 0,
    coarseKLimit = "(SELECT k FROM kv)",
    corpusSrc = "emb_seed",
    headCtes =
      """kv AS (SELECT GREATEST(4, LEAST(262144, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))) AS k FROM emb_seed),
        |""".stripMargin,
    seedBody =
      """SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 7
        |  UNION ALL
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x * 4 AS FLOAT)) AS embedding
        |  FROM embeddings WHERE vec_id % 10 = 7""".stripMargin,
    smpSeedFilter = "")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_cosine_topk" -> (q31CosineTopK _),
    "q32_ann_lsh" -> (q32AnnLsh _),
    "q33_ivf_centroid" -> (q33IvfCentroid _),
    "q53_embed_neardup" -> (q53EmbedNearDup _),
    "q71_ann_multiprobe" -> (q71AnnMultiProbe _),
    "q74_semdedup" -> (q74SemDedup _),
    "q88_ann_recall" -> (q88AnnRecall _),
    "q97_sq8_ann" -> (q97Sq8Ann _),
    "q89_ivf_ann" -> (q89IvfAnn _),
    "q92_ann_recall_sharded" -> (q92AnnRecallSharded _),
    "q94_incremental_ivf" -> (q94IncrementalIvf _),
    "q117_ann_lsh_wide" -> (q117AnnLshWide _),
    "q118_ivf_scaled" -> (q118IvfScaled _),
    "q119_semdedup_scaled" -> (q119SemDedupScaled _),
    "q120_recall_scaled" -> (q120RecallScaled _),
    "q122_ivfpq_ann" -> (q122IvfPqAnn _),
    "q123_drift_retrain" -> (q123DriftRetrain _),
    "q124_ivfpq_incremental" -> (q124IvfPqIncremental _),
    "q125_ivfpq_residual" -> (q125IvfPqResidual _),
    "q127_ivfpq_scaled" -> (q127IvfPqIncrementalScaled _),
    "q128_ivfpq_refine" -> (q128IvfPqRefine _),
    "q129_ivfpq_delete" -> (q129IvfPqDelete _),
    "q130_ivfpq_res_incremental" -> (q130IvfPqResIncremental _),
    "q131_ivfpq_res_refine" -> (q131IvfPqResRefine _),
    "q132_ivfpq_filtered" -> (q132IvfPqFiltered _),
    "q133_ivfpq_production" -> (q133IvfPqProduction _),
    "q135_ivfsq8_incremental" -> (q135IvfSq8Incremental _),
    "q136_ivfsq8_scaled" -> (q136IvfSq8Scaled _),
    "q137_codec_advisor" -> (q137CodecAdvisor _),
    "q138_ivfpq_structured" -> (q138IvfPqStructured _),
    "q139_ann_hot_cell" -> (q139AnnHotCell _),
    "q141_opq_incremental" -> (q141OpqIncremental _),
    "q142_pq_drift_retrain" -> (q142PqDriftRetrain _)
  )

  def sql: Map[String, String] = Map(
    "q31_cosine_topk" -> q31CosineTopKSql,
    "q32_ann_lsh" -> q32AnnLshSql,
    "q33_ivf_centroid" -> q33IvfCentroidSql,
    "q53_embed_neardup" -> q53EmbedNearDupSql,
    "q71_ann_multiprobe" -> q71AnnMultiProbeSql,
    "q74_semdedup" -> q74SemDedupSql,
    "q88_ann_recall" -> q88AnnRecallSql,
    "q89_ivf_ann" -> q89IvfAnnSql,
    "q92_ann_recall_sharded" -> q92AnnRecallShardedSql,
    "q94_incremental_ivf" -> q94IncrementalIvfSql,
    "q97_sq8_ann" -> q97Sq8AnnSql,
    "q117_ann_lsh_wide" -> q117AnnLshWideSql,
    "q118_ivf_scaled" -> q118IvfScaledSql,
    "q119_semdedup_scaled" -> q119SemDedupScaledSql,
    "q120_recall_scaled" -> q120RecallScaledSql,
    "q122_ivfpq_ann" -> q122IvfPqAnnSql,
    "q123_drift_retrain" -> q123DriftRetrainSql,
    "q124_ivfpq_incremental" -> q124IvfPqIncrementalSql,
    "q125_ivfpq_residual" -> q125IvfPqResidualSql,
    "q127_ivfpq_scaled" -> q127IvfPqIncrementalScaledSql,
    "q128_ivfpq_refine" -> q128IvfPqRefineSql,
    "q129_ivfpq_delete" -> q129IvfPqDeleteSql,
    "q130_ivfpq_res_incremental" -> q130IvfPqResIncrementalSql,
    "q131_ivfpq_res_refine" -> q131IvfPqResRefineSql,
    "q132_ivfpq_filtered" -> q132IvfPqFilteredSql,
    "q133_ivfpq_production" -> q133IvfPqProductionSql,
    "q135_ivfsq8_incremental" -> q135IvfSq8IncrementalSql,
    "q136_ivfsq8_scaled" -> q136IvfSq8ScaledSql,
    "q137_codec_advisor" -> q137CodecAdvisorSql,
    "q138_ivfpq_structured" -> q138IvfPqStructuredSql,
    "q139_ann_hot_cell" -> q139AnnHotCellSql,
    "q141_opq_incremental" -> q141OpqIncrementalSql,
    "q142_pq_drift_retrain" -> q142PqDriftRetrainSql
  )
}
