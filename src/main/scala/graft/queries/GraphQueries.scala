package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ExactDecimal

/** Graph-numeric operators over the document near-duplicate graph — the
  * link-graph tier of a web-corpus curation pipeline. The testdata has no
  * hyperlink column, so the MinHash-LSH similarity graph (q48's edge set)
  * stands in for the crawl graph; the operator shapes are identical.
  */
object GraphQueries {

  /** Link-graph centrality: 5-iteration fixed-point PageRank
    * ([[graft.ml.PageRank]]) over the jaccard ≥ 0.5 near-dup graph,
    * symmetrized. High-rank nodes are the natural dedup-cluster
    * representatives (most-connected member), the same role host-level
    * PageRank plays for crawl retention. Oracle: the identical five
    * power-iteration rounds unrolled as chained CTEs in exact integer
    * arithmetic — bit-equal, not approximately equal.
    *
    * 100 TB: reads the write-once near-dup edge store
    * ([[TextQueries.nearDupEdges]] — built once per corpus snapshot, not
    * re-minhashed per query); each of the 5 rounds is one src-keyed join
    * + one dst-keyed agg. No persist needed here: re-deriving the edge
    * list is a parquet scan of a tiny file. */
  def q79PageRank(spark: SparkSession, dir: String): DataFrame =
    pageRankOf(TextQueries.nearDupEdges(spark, dir))

  /** The symmetric-PageRank tail over an undirected pair set
    * (doc_a, doc_b) — shared by q79 and q91 so their oracle pairing
    * (both against [[q79PageRankSql]]) cannot silently diverge; mirrors
    * [[trianglesOf]]. */
  private[graft] def pageRankOf(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    graft.ml.PageRank.ranks(edges, iterations = 5)
      .select(col("node").as("doc_id"), col("degree"), col("rank_fp"))
  }

  val q79PageRankSql: String = {
    val scale = 1000000000000L
    // MATERIALIZED keeps an inlining evaluator from re-deriving `ed`
    // (and the MinHash chain under it) once per unrolled round — see the
    // q86 twin for the quadratic/exponential version of this hazard
    def round(cur: String, prev: String): String =
      s"""$cur AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    (SELECT b FROM basec) + (85 * CAST(sum(p.r // e.outdeg) AS BIGINT)) // 100 AS r
         |  FROM ed e JOIN $prev p ON e.src = p.node GROUP BY e.dst
         |)""".stripMargin
    val rounds = (1 to 5)
      .map(i => round(s"it$i", if (i == 1) "r0" else s"it${i - 1}"))
      .mkString(",\n")
    s"""WITH cand AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM (${TextQueries.q30MinHashLshSql}) WHERE jaccard >= 0.5
       |),
       |ed0 AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM cand
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM cand
       |),
       |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM ed0 GROUP BY src),
       |nn AS (SELECT count(*)::BIGINT AS n FROM deg),
       |basec AS (SELECT (15 * ($scale // greatest(n, 1))) // 100 AS b FROM nn),
       |ed AS MATERIALIZED (SELECT e.src, e.dst, d.outdeg FROM ed0 e JOIN deg d ON e.src = d.src),
       |r0 AS (
       |  SELECT src AS node, ($scale // (SELECT greatest(n, 1) FROM nn)) AS r FROM deg
       |),
       |$rounds
       |SELECT it5.node AS doc_id, d.outdeg AS degree, it5.r AS rank_fp
       |FROM it5 JOIN deg d ON it5.node = d.src""".stripMargin
  }

  /** Crawl-graph-style DIRECTED PageRank ([[graft.ml.PageRank.ranksDirected]])
    * over the ASYMMETRIC near-dup edge set (doc_a → doc_b, doc_a < doc_b,
    * NOT symmetrized): max-id docs of each cluster have no out-edges
    * (dangling — their rank mass redistributes uniformly each round) and
    * min-id docs have no in-edges (source-only — they keep their teleport
    * + dangling share and stay in the output). This exercises exactly the
    * two graph shapes q79's symmetric contract excludes. Oracle: the
    * identical five rounds unrolled as CTEs in exact integer arithmetic,
    * dangling-mass scalar included — bit-equal. */
  def q86PageRankDirected(spark: SparkSession, dir: String): DataFrame = {
    val edges = TextQueries.nearDupEdges(spark, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    graft.ml.PageRank.ranksDirected(edges, iterations = 5)
      .select(col("node").as("doc_id"), col("degree").as("out_degree"), col("rank_fp"))
  }

  val q86PageRankDirectedSql: String = {
    val scale = 1000000000000L
    // MATERIALIZED is load-bearing: every round references the previous
    // one TWICE (the src-join and the dangling-mass scalar subquery), so
    // an inlining evaluator expands it5 into 2^5 copies of the whole
    // chain — including the MinHash CTE — which is exactly the
    // exponential blow-up that OOMed the sf1 oracle run before the hint
    def round(cur: String, prev: String): String =
      s"""$cur AS MATERIALIZED (
         |  SELECT nd.node, nd.outdeg,
         |    (SELECT b FROM basec)
         |      + (85 * (coalesce(c.s, 0)
         |          + CAST((SELECT coalesce(sum(r), 0) FROM $prev WHERE outdeg = 0) AS BIGINT)
         |            // (SELECT n FROM nn))) // 100 AS r
         |  FROM nodes nd
         |  LEFT JOIN (
         |    SELECT e.dst, CAST(sum(p.r // e.outdeg) AS BIGINT) AS s
         |    FROM ed e JOIN $prev p ON e.src = p.node GROUP BY e.dst
         |  ) c ON nd.node = c.dst
         |)""".stripMargin
    val rounds = (1 to 5)
      .map(i => round(s"it$i", if (i == 1) "it0" else s"it${i - 1}"))
      .mkString(",\n")
    s"""WITH cand AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM (${TextQueries.q30MinHashLshSql}) WHERE jaccard >= 0.5
       |),
       |ed0 AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand),
       |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM ed0 GROUP BY src),
       |nodes AS MATERIALIZED (
       |  SELECT u.node, coalesce(d.outdeg, 0)::BIGINT AS outdeg
       |  FROM (SELECT src AS node FROM ed0 UNION SELECT dst AS node FROM ed0) u
       |  LEFT JOIN deg d ON u.node = d.src
       |),
       |nn AS (SELECT greatest(count(*), 1)::BIGINT AS n FROM nodes),
       |basec AS (SELECT (15 * ($scale // n)) // 100 AS b FROM nn),
       |ed AS MATERIALIZED (SELECT e.src, e.dst, d.outdeg FROM ed0 e JOIN deg d ON e.src = d.src),
       |it0 AS MATERIALIZED (
       |  SELECT node, outdeg, CAST($scale // (SELECT n FROM nn) AS BIGINT) AS r FROM nodes
       |),
       |$rounds
       |SELECT node AS doc_id, outdeg AS out_degree, r AS rank_fp FROM it5""".stripMargin
  }

  /** Triangle counting + local clustering coefficient over the same
    * near-dup graph — the graph-density signal of dedup-cluster quality
    * (a node whose neighbors all know each other sits in a tight
    * duplicate clique; a hub with zero triangles bridges unrelated
    * texts). Algorithm: degree orientation (Cohen's MapReduce triangle
    * scheme / cf. Suri & Vassilvitskii 2011) — orient every edge from
    * the (degree, id)-smaller endpoint to the larger, enumerate wedges
    * only between out-neighbors, close them against the oriented edge
    * set. Each triangle is found exactly once, and max out-degree is
    * O(√m), so the wedge fan-out is bounded regardless of hub size —
    * the property that makes this survive a power-law 100 TB graph
    * where naive neighbor-intersection on hubs explodes.
    *
    * clustering = 2·tri / (deg·(deg−1)) in exact basis points.
    *
    * 100 TB: three edge-keyed shuffle joins (degree annotate, wedge
    * self-join bounded by orientation, closing equi-join) — no
    * all-pairs step anywhere. */
  def q83Triangles(spark: SparkSession, dir: String): DataFrame =
    trianglesOf(TextQueries.nearDupEdges(spark, dir))

  /** The triangle/clustering engine over an undirected pair set
    * (doc_a, doc_b) — shared by q83 and the scale-smoke spec. */
  private[graft] def trianglesOf(pairs: DataFrame): DataFrame = {
    // edge store read: recompute of und is a parquet scan, so only `e`
    // (consumed 3× by the wedge + closing joins) is worth keeping hot
    val und = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
    val deg = und.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val e = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u"), col("v"), col("dv"))
      .persist()
    val wedges = e.select(col("u"), col("v").as("a"), col("dv").as("da"))
      .join(e.select(col("u"), col("v").as("b"), col("dv").as("db")), Seq("u"))
      .filter(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select(col("u"), col("a"), col("b"))
    val tri = wedges
      .join(e.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"))
      .select(col("u"), col("a"), col("b"))
    val perNode = tri
      .select(explode(array(col("u"), col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("n_tri"))
      .select(col("node").as("doc_id"), col("deg").as("degree"), col("n_tri"),
        when(col("deg") >= 2,
          ExactDecimal.halfUpRatio(
            col("n_tri") * 2L, col("deg") * (col("deg") - 1L), 4))
          .otherwise(lit(0d)).as("clustering"))
  }

  val q83TrianglesSql: String =
    s"""WITH cand AS (
       |  SELECT doc_a, doc_b FROM (${TextQueries.q30MinHashLshSql}) WHERE jaccard >= 0.5
       |),
       |und AS (
       |  SELECT doc_a AS u, doc_b AS v FROM cand
       |  UNION ALL SELECT doc_b AS u, doc_a AS v FROM cand
       |),
       |deg AS (SELECT u AS node, count(*)::BIGINT AS deg FROM und GROUP BY 1),
       |e AS (
       |  SELECT und.u, und.v, dv.deg AS dv
       |  FROM und
       |  JOIN deg du ON und.u = du.node
       |  JOIN deg dv ON und.v = dv.node
       |  WHERE du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
       |),
       |w AS (
       |  SELECT e1.u, e1.v AS a, e2.v AS b
       |  FROM e e1 JOIN e e2 ON e1.u = e2.u
       |  WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)
       |),
       |tri AS (SELECT w.u, w.a, w.b FROM w JOIN e ON e.u = w.a AND e.v = w.b),
       |pn AS (
       |  SELECT node, count(*)::BIGINT AS n_tri FROM (
       |    SELECT u AS node FROM tri
       |    UNION ALL SELECT a FROM tri
       |    UNION ALL SELECT b FROM tri)
       |  GROUP BY 1
       |)
       |SELECT d.node AS doc_id, d.deg AS degree,
       |  coalesce(pn.n_tri, 0)::BIGINT AS n_tri,
       |  CASE WHEN d.deg >= 2 THEN
       |    ${ExactDecimal.ddbHalfUpRatio(
              "coalesce(pn.n_tri, 0) * 2", "d.deg * (d.deg - 1)", 4)}
       |  ELSE 0 END AS clustering
       |FROM deg d LEFT JOIN pn USING (node)""".stripMargin

  /** q91: the INCREMENTAL OPERATING MODE under the oracle gate — the
    * end-to-end path a 100 TB deployment actually runs: seed the
    * signature + edge store from 90% of the corpus
    * ([[graft.operators.IncrementalDedup.writeEdgeStore]]), ingest the
    * remaining 10% as a delta batch (`ingestBatchWithEdges` — broadcast
    * delta bands, DPP-pruned store scan, edges appended from the batch's
    * pairs), then run q79's PageRank over the MAINTAINED edge table.
    *
    * The DuckDB oracle is q79's full-corpus recompute, so the driver
    * hash-proves `edges(state ∪ delta) ≡ recompute` THROUGH a graph
    * consumer — cell-exact fixed-point ranks, not just the ScalaTest
    * equivalence. Store built once per (process, dir), like every
    * snapshot store. */
  def q91IncrementalPageRank(spark: SparkSession, dir: String): DataFrame = {
    val root = incStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("incpr", d)
      val all = graft.core.Tables.documents(spark, d)
      graft.operators.IncrementalDedup.writeEdgeStore(
        spark, all.filter(col("doc_id") % 10 =!= 7), r)
      graft.operators.IncrementalDedup.ingestBatchWithEdges(
        spark, r, s"${r}_pairs", all.filter(col("doc_id") % 10 === 7), batchId = 1L)
      r
    })
    pageRankOf(graft.operators.IncrementalDedup.liveEdges(spark, root))
  }

  private val incStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q93: the STREAMING operating mode under the oracle gate — q91's
    * delta path driven through a LIVE Structured Streaming query instead
    * of a direct batch call. Seed the signature + edge store from 80% of
    * the corpus, then feed the remaining 20% as two micro-batches of a
    * document stream through
    * [[graft.operators.IncrementalDedup.dedupeStreamWithEdges]] (the
    * checkpointed foreachBatch whose body is `ingestBatchWithEdges`),
    * and run q79's PageRank over the maintained edge table the stream
    * left behind. The DuckDB oracle is q79's full-corpus recompute, so
    * the driver hash-proves stream ≡ batch ≡ recompute through a graph
    * consumer — cell-exact fixed-point ranks.
    *
    * The `collect` feeding MemoryStream is harness wiring, not engine
    * shape: MemoryStream is driver-fed by design. A production stream
    * (file source, Kafka) runs the IDENTICAL per-batch plan — the
    * foreachBatch body does not know its source. Store built once per
    * (process, dir), like every snapshot store. */
  def q93StreamingPageRank(spark: SparkSession, dir: String): DataFrame = {
    val root = streamStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("strpr", d)
      val all = graft.core.Tables.documents(spark, d)
      graft.operators.IncrementalDedup.writeEdgeStore(
        spark, all.filter(col("doc_id") % 10 < 8), r)
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = graft.operators.IncrementalDedup.dedupeStreamWithEdges(
        in.toDF().toDF("doc_id", "text"), r, s"${r}_pairs", s"${r}_ckpt")
      try {
        def batchOf(slot: Int): Seq[(Long, String)] = all
          .filter(col("doc_id") % 10 === slot).select("doc_id", "text")
          .as[(Long, String)].collect().toSeq
        in.addData(batchOf(8)); q.processAllAvailable()
        in.addData(batchOf(9)); q.processAllAvailable()
      } finally q.stop()
      r
    })
    pageRankOf(graft.operators.IncrementalDedup.liveEdges(spark, root))
  }

  private val streamStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q140: DELETES IN THE DEDUP STORE under the oracle gate — the r12
    * verdict's top ask: q105's `removed` class finally has somewhere to
    * go. The q91 lifecycle plus a delete and a compaction: seed the
    * signature + edge store from 90% of the corpus, ingest the held-out
    * 10% (batch 1), then DELETE every `doc_id % 7 = 3` document
    * ([[graft.operators.IncrementalDedup.deleteBatch]], batch 2 —
    * row-level tombstones + edge retraction: an edge dies when either
    * endpoint's signature was tombstoned after the edge's partition),
    * run [[graft.operators.IncrementalDedup.compactStore]] (tombstoned
    * rows PHYSICALLY purge from bands/sets/edges, applied tombstones
    * truncate), and run q79's PageRank over the live edge table.
    *
    * The DuckDB oracle is q79's recompute over the corpus WITH THE
    * DELETED DOCS REMOVED (`WITH documents AS (SELECT … FROM
    * main.documents WHERE doc_id % 7 <> 3)` shadowing the base table) —
    * so the driver hash-proves `pageRank(live(state − removed)) ≡
    * recompute(corpus − removed)` end-to-end THROUGH the purge: exact
    * edge retraction (edges are pure functions of the two signatures,
    * so dropping every edge that touches a removed doc is the recompute,
    * not an approximation), tombstone liveness, and delete-aware
    * compaction, all in one fixed-point-rank hash. The pre-compaction
    * live view and the supersede (changed-doc) path are spec-proven
    * equal to the same recompute in IncrementalDedupSpec. */
  def q140DedupDeletePageRank(spark: SparkSession, dir: String): DataFrame = {
    val root = delStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("delpr", d)
      val all = graft.core.Tables.documents(spark, d)
      graft.operators.IncrementalDedup.writeEdgeStore(
        spark, all.filter(col("doc_id") % 10 =!= 7), r)
      graft.operators.IncrementalDedup.ingestBatchWithEdges(
        spark, r, s"${r}_pairs", all.filter(col("doc_id") % 10 === 7), batchId = 1L)
      graft.operators.IncrementalDedup.deleteBatch(
        spark, r, all.filter(col("doc_id") % 7 === 3).select("doc_id"), batchId = 2L)
      graft.operators.IncrementalDedup.compactStore(spark, r)
      r
    })
    pageRankOf(graft.operators.IncrementalDedup.liveEdges(spark, root))
  }

  private val delStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The q140 oracle: q79's full recompute with the deleted slice
    * removed at the source — the CTE shadows the base `documents` view
    * (DuckDB resolves the inner reference via the explicit `main.`
    * schema qualifier), so the entire MinHash → LSH → PageRank replay
    * underneath runs on the post-delete corpus unchanged. */
  val q140DedupDeletePageRankSql: String =
    "WITH documents AS (SELECT * FROM main.documents WHERE doc_id % 7 <> 3),\n" +
      q79PageRankSql.stripPrefix("WITH ")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_pagerank" -> (q79PageRank _),
    "q83_triangles" -> (q83Triangles _),
    "q86_pagerank_directed" -> (q86PageRankDirected _),
    "q91_incremental_pagerank" -> (q91IncrementalPageRank _),
    "q93_streaming_pagerank" -> (q93StreamingPageRank _),
    "q140_dedup_delete_pagerank" -> (q140DedupDeletePageRank _)
  )

  def sql: Map[String, String] = Map(
    "q79_pagerank" -> q79PageRankSql,
    "q83_triangles" -> q83TrianglesSql,
    "q86_pagerank_directed" -> q86PageRankDirectedSql,
    // the oracle IS the full-corpus recompute: matching it proves the
    // incremental path end-to-end
    "q91_incremental_pagerank" -> q79PageRankSql,
    // likewise for the streaming path: stream ≡ batch ≡ recompute
    "q93_streaming_pagerank" -> q79PageRankSql,
    "q140_dedup_delete_pagerank" -> q140DedupDeletePageRankSql
  )
}
