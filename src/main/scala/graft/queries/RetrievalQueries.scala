package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{ExactDecimal, TextFns}

/** Retrieval scoring over the document corpus — the index/search tier a
  * training-data pipeline uses for RAG-style example mining and targeted
  * corpus slicing (pull every document relevant to a probe query).
  */
object RetrievalQueries {

  private val docs = (s: SparkSession, dir: String) => Tables.documents(s, dir)

  /** The probe query for q84 — three mid-frequency corpus terms. */
  val Bm25Terms: Seq[String] = Seq("table", "join", "window")

  /** k1 = 6/5, b = 3/4 — the standard BM25 defaults, kept as exact
    * rationals so the whole score clears denominators into integers. */
  private val IdfCap = 100000000L // 10^8 bp — saturation for rare terms

  /** BM25-shaped relevance scoring of the corpus against a fixed probe
    * query, fully exact (the q64/q72/q82 log-free philosophy):
    *
    *   - term saturation: tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
    *     k1=6/5, b=3/4 — multiplying through by 10·T (avgdl = T/N)
    *     gives the all-integer form 22·tf·T / (10·tf·T + 3·T + 9·dl·N),
    *     computed in exact basis points (decimal(38) — 22·tf·T·10⁴
    *     overflows a long past ~10¹⁵ corpus tokens).
    *   - idf: the RSJ odds (N−df+½)/(df+½) = (2N−2df+1)/(2df+1) in
    *     exact basis points WITHOUT the log (log is transcendental →
    *     engine-dependent last bits). Monotone in df like log-idf, but
    *     unbounded for rare terms, so it saturates at [[IdfCap]] — the
    *     role the log's compression plays in classic BM25.
    *   - score = Σ_t idf_t · sat_t, an integer; top 20 docs, doc_id
    *     tie-break.
    *
    * 100 TB shape: a cheap `contains` PREFILTER sits BELOW the tokenize
    * + explode (probe terms hit a vanishing fraction of documents, so
    * non-matching docs never pay the Generate — the filter is a safe
    * over-approximation: a whitespace token is always a substring of its
    * text). Everything after the (doc,term) combine is query-term-dim or
    * doc-keyed; df and the scalar totals BROADCAST; the final top-k is
    * TakeOrdered (no global sort materialization). */
  def q84Bm25(spark: SparkSession, dir: String): DataFrame = {
    val scored = bm25Contribs(spark, dir, Bm25Terms)
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("n_terms"), col("score"))
  }

  /** Shared BM25 core: per-(doc_id, term) exact-integer score
    * contributions for the given probe term set (see [[q84Bm25]] for the
    * arithmetic derivation). The corpus-stats branch (dl/totals) scans
    * every document — it must, avgdl is corpus-global — while the tf
    * branch prefilters on substring containment before exploding. */
  private def bm25Contribs(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    val d = docs(spark, dir)
    // corpus stats: one pass — N docs, T total tokens, per-doc length
    val dl = d.select(col("doc_id"), size(TextFns.tokens(col("text"))).cast("long").as("dl"))
      .persist()
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("t_tokens"))
    val tf = d
      // prefilter BELOW the explode: only docs that can contain a probe
      // token are tokenized at all
      .filter(terms.map(t => col("text").contains(t)).reduce(_ || _))
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      .filter(col("term").isInCollection(terms))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = dfreq.crossJoin(broadcast(totals))
      .select(col("term"),
        least(
          ExactDecimal.halfUpRatio(
            (col("n_docs") * 2L - col("df") * 2L + 1L) * 10000L,
            col("df") * 2L + 1L, 0).cast("long"),
          lit(IdfCap)).as("idf_bp"))
    tf
      .join(dl, Seq("doc_id"))
      .join(broadcast(idf), Seq("term"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("term"),
        (col("idf_bp") *
          ExactDecimal.halfUpRatioBig(
            col("tf").cast("decimal(38,0)") * col("t_tokens") * lit(220000L),
            col("tf").cast("decimal(38,0)") * col("t_tokens") * 10L +
              col("t_tokens").cast("decimal(38,0)") * 3L +
              col("dl").cast("decimal(38,0)") * col("n_docs") * 9L,
            0).cast("long")).as("contrib"))
  }

  /** The q85 probe table: multiple queries, each a bag of terms — the
    * realistic RAG-mining shape (thousands of probes joined through an
    * inverted (term, doc) index; here 4, the shape is what scales). */
  val Bm25Probes: Seq[(Int, String)] = Seq(
    1 -> "table", 1 -> "join", 1 -> "window",
    2 -> "data", 2 -> "stream", 2 -> "merge",
    3 -> "hash", 3 -> "group", 3 -> "filter",
    4 -> "vector", 4 -> "scan")

  /** Multi-query BM25: score the corpus against a PROBE TABLE
    * (query_id, term) instead of one fixed query — top-5 docs per query.
    * The corpus-side work (tokenize → (doc,term) combine → idf) runs
    * ONCE over the distinct term union (the inverted-index build);
    * fan-out to queries is one broadcast join of the probes table onto
    * the postings, then a query-keyed window top-k. At 100 TB with
    * thousands of probes the shape is identical: postings shuffle on
    * term, probes broadcast, and the final rank partitions by query_id —
    * never a global sort. */
  def q85Bm25MultiProbe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val probes = Bm25Probes.toDF("query_id", "term")
    val scored = bm25Contribs(spark, dir, Bm25Probes.map(_._2).distinct)
    val perQuery = scored.join(broadcast(probes), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    perQuery.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms"), col("score"))
  }

  /** The multi-probe BM25 CTE chain up to `per_query` — shared verbatim
    * by the q85 and q98 oracles (one source of truth for the scoring
    * arithmetic both queries hash against). */
  private lazy val bm25PerQueryCtes: String = {
    val toks = TextFns.ddbTokens("text")
    val termList = Bm25Probes.map(_._2).distinct.map(t => s"'$t'").mkString(", ")
    val probeRows = Bm25Probes.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""dl AS (
       |  SELECT doc_id, len($toks)::BIGINT AS dl FROM documents
       |),
       |tot AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS t_tokens FROM dl),
       |probes(query_id, term) AS (VALUES $probeRows),
       |tf AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf
       |  FROM (SELECT doc_id, unnest($toks) AS term FROM documents)
       |  WHERE term IN ($termList)
       |  GROUP BY doc_id, term
       |),
       |dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
       |idf AS (
       |  SELECT term,
       |    least((${ExactDecimal.ddbHalfUpRatio(
                "(n_docs * 2 - df * 2 + 1) * 10000", "df * 2 + 1", 0)})::BIGINT,
              $IdfCap) AS idf_bp
       |  FROM dfreq CROSS JOIN tot
       |),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    idf.idf_bp * (${ExactDecimal.ddbHalfUpRatio(
              "tf.tf::HUGEINT * t.t_tokens * 220000",
              "tf.tf::HUGEINT * t.t_tokens * 10 + t.t_tokens::HUGEINT * 3 + dl.dl::HUGEINT * t.n_docs * 9",
              0)})::BIGINT AS contrib
       |  FROM tf
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN idf ON tf.term = idf.term
       |  CROSS JOIN tot t
       |),
       |per_query AS (
       |  SELECT p.query_id, s.doc_id,
       |    count(*)::BIGINT AS n_terms, sum(s.contrib)::BIGINT AS score
       |  FROM scored s JOIN probes p ON s.term = p.term
       |  GROUP BY p.query_id, s.doc_id
       |)""".stripMargin
  }

  val q85Bm25MultiProbeSql: String =
    s"""WITH $bm25PerQueryCtes
       |SELECT query_id, rank, doc_id, n_terms, score
       |FROM (
       |  SELECT query_id, doc_id, n_terms, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS rank
       |  FROM per_query
       |) WHERE rank <= 5""".stripMargin

  /** HARD-NEGATIVE MINING — the contrastive-training data miner (DPR /
    * sentence-transformers recipe: BM25 top-ranked non-positives make
    * the hardest, most informative negatives — Karpukhin et al., "Dense
    * Passage Retrieval", EMNLP 2020 §4.2): for each probe query, the
    * BM25 rank-1 document is the pseudo-positive ("gold"), ranks 2–8
    * are candidates, and candidates that are NEAR-DUPLICATES of the
    * gold (connected in the jaccard ≥ 0.5 edge graph — the same edge
    * set q48/q79 consume) are false negatives and get filtered out.
    * Survivors re-rank to the top-5 hard negatives per query.
    *
    * 100 TB shape: scoring inherits q85 (postings shuffle, probes
    * broadcast); the candidate frame is queries×8 rows, so the
    * near-dup check BROADCASTS the candidate pairs onto ONE streaming
    * pass of the edge table (never the reverse — an anti join that
    * builds on the edge table would broadcast a corpus-scale relation),
    * then anti-joins the tiny hit set back. Rank windows partition by
    * query_id — no global sort anywhere. */
  def q98HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val probes = Bm25Probes.toDF("query_id", "term")
    val scored = bm25Contribs(spark, dir, Bm25Probes.map(_._2).distinct)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    // persist: `ranked` is |queries|×8 rows but its subtree (tokenize →
    // explode → postings shuffle → window) feeds FOUR branches below
    // (gold, cands twice, the final anti-join); unpersisted, Catalyst
    // re-evaluates the whole BM25 pipeline per branch (guide §2.4 —
    // measured 5 duplicate scoring subtrees / 106 Exchanges in the
    // r15 before-plan, bench 2.75 s → one evaluation after)
    val ranked = scored.join(broadcast(probes), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score"))
      .withColumn("bm25_rank", row_number().over(w))
      .filter(col("bm25_rank") <= 8)
      .persist()
    val gold = ranked.filter(col("bm25_rank") === 1)
      .select(col("query_id"), col("doc_id").as("gold_doc"))
    val cands = ranked.filter(col("bm25_rank") > 1)
      .join(broadcast(gold), Seq("query_id"))
    // undirected near-dup adjacency, probed by the broadcast candidates
    val edges = TextQueries.nearDupEdges(spark, dir)
    val posPairs = edges.select(col("doc_a"), col("doc_b"))
      .union(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val hits = posPairs.join(
        broadcast(cands.select(col("gold_doc").as("doc_a"), col("doc_id").as("doc_b"))),
        Seq("doc_a", "doc_b"))
      .select(col("doc_a").as("gold_doc"), col("doc_b").as("doc_id"))
      .distinct()
    cands.join(broadcast(hits), Seq("gold_doc", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= 5)
      .select(col("query_id"), col("gold_doc"), col("doc_id").as("neg_doc"),
        col("neg_rank"), col("n_terms"), col("score"))
  }

  val q98HardNegativesSql: String =
    s"""WITH $bm25PerQueryCtes,
       |ranked AS (
       |  SELECT query_id, doc_id, n_terms, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS bm25_rank
       |  FROM per_query
       |),
       |r8 AS (SELECT * FROM ranked WHERE bm25_rank <= 8),
       |gold AS (SELECT query_id, doc_id AS gold_doc FROM r8 WHERE bm25_rank = 1),
       |cand AS (
       |  SELECT r.query_id, g.gold_doc, r.doc_id, r.n_terms, r.score
       |  FROM r8 r JOIN gold g ON r.query_id = g.query_id
       |  WHERE r.bm25_rank > 1
       |),
       |pos AS (
       |  SELECT doc_a, doc_b FROM (${TextQueries.q30MinHashLshSql})
       |  WHERE jaccard >= 0.5
       |),
       |posu AS (
       |  SELECT doc_a, doc_b FROM pos
       |  UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM pos
       |),
       |negs AS (
       |  SELECT c.query_id, c.gold_doc, c.doc_id, c.n_terms, c.score
       |  FROM cand c
       |  WHERE NOT EXISTS (SELECT 1 FROM posu p
       |    WHERE p.doc_a = c.gold_doc AND p.doc_b = c.doc_id)
       |)
       |SELECT query_id, gold_doc, neg_doc, neg_rank, n_terms, score
       |FROM (
       |  SELECT query_id, gold_doc, doc_id AS neg_doc, n_terms, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS neg_rank
       |  FROM negs
       |) WHERE neg_rank <= 5""".stripMargin

  val q84Bm25Sql: String = {
    val toks = TextFns.ddbTokens("text")
    val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH dl AS (
       |  SELECT doc_id, len($toks)::BIGINT AS dl FROM documents
       |),
       |tot AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS t_tokens FROM dl),
       |tf AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf
       |  FROM (SELECT doc_id, unnest($toks) AS term FROM documents)
       |  WHERE term IN ($termList)
       |  GROUP BY doc_id, term
       |),
       |dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
       |idf AS (
       |  SELECT term,
       |    least((${ExactDecimal.ddbHalfUpRatio(
                "(n_docs * 2 - df * 2 + 1) * 10000", "df * 2 + 1", 0)})::BIGINT,
              $IdfCap) AS idf_bp
       |  FROM dfreq CROSS JOIN tot
       |),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    idf.idf_bp * (${ExactDecimal.ddbHalfUpRatio(
              "tf.tf::HUGEINT * t.t_tokens * 220000",
              "tf.tf::HUGEINT * t.t_tokens * 10 + t.t_tokens::HUGEINT * 3 + dl.dl::HUGEINT * t.n_docs * 9",
              0)})::BIGINT AS contrib
       |  FROM tf
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN idf ON tf.term = idf.term
       |  CROSS JOIN tot t
       |)
       |SELECT doc_id, count(*)::BIGINT AS n_terms, sum(contrib)::BIGINT AS score
       |FROM scored
       |GROUP BY doc_id
       |ORDER BY score DESC, doc_id ASC
       |LIMIT 20""".stripMargin
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q84_bm25" -> (q84Bm25 _),
    "q85_bm25_multiprobe" -> (q85Bm25MultiProbe _),
    "q98_hard_negatives" -> (q98HardNegatives _)
  )

  def sql: Map[String, String] = Map(
    "q84_bm25" -> q84Bm25Sql,
    "q85_bm25_multiprobe" -> q85Bm25MultiProbeSql,
    "q98_hard_negatives" -> q98HardNegativesSql
  )
}
