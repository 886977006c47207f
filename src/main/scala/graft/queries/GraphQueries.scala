package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    * 100 TB: inherits q30's banded-join edge derivation; each of the 5
    * rounds is one src-keyed join + one dst-keyed agg. */
  def q79PageRank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = TextQueries.q30MinHashLsh(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    // PageRank reads the edge list twice (degree build + annotated edges);
    // persisting here stops the LSH band join + jaccard rerank re-running
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    graft.ml.PageRank.ranks(edges, iterations = 5)
      .select(col("node").as("doc_id"), col("degree"), col("rank_fp"))
  }

  val q79PageRankSql: String = {
    val scale = 1000000000000L
    def round(cur: String, prev: String): String =
      s"""$cur AS (
         |  SELECT e.dst AS node,
         |    (SELECT b FROM basec) + (85 * CAST(sum(p.r // e.outdeg) AS BIGINT)) // 100 AS r
         |  FROM ed e JOIN $prev p ON e.src = p.node GROUP BY e.dst
         |)""".stripMargin
    val rounds = (1 to 5)
      .map(i => round(s"it$i", if (i == 1) "r0" else s"it${i - 1}"))
      .mkString(",\n")
    s"""WITH cand AS (
       |  SELECT doc_a, doc_b FROM (${TextQueries.q30MinHashLshSql}) WHERE jaccard >= 0.5
       |),
       |ed0 AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM cand
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM cand
       |),
       |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM ed0 GROUP BY src),
       |nn AS (SELECT count(*)::BIGINT AS n FROM deg),
       |basec AS (SELECT (15 * ($scale // greatest(n, 1))) // 100 AS b FROM nn),
       |ed AS (SELECT e.src, e.dst, d.outdeg FROM ed0 e JOIN deg d ON e.src = d.src),
       |r0 AS (
       |  SELECT src AS node, ($scale // (SELECT greatest(n, 1) FROM nn)) AS r FROM deg
       |),
       |$rounds
       |SELECT it5.node AS doc_id, d.outdeg AS degree, it5.r AS rank_fp
       |FROM it5 JOIN deg d ON it5.node = d.src""".stripMargin
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_pagerank" -> (q79PageRank _)
  )

  def sql: Map[String, String] = Map(
    "q79_pagerank" -> q79PageRankSql
  )
}
