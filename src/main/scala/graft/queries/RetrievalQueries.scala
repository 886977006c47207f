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
    * 100 TB shape: the term filter hits first (probe terms are a
    * vanishing fraction of the token stream), so everything after the
    * (doc,term) combine is query-term-dim or doc-keyed; df and the
    * scalar totals BROADCAST; the final top-k is TakeOrdered (no global
    * sort materialization). */
  def q84Bm25(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val terms = Bm25Terms
    // corpus stats: one pass — N docs, T total tokens, per-doc length
    val dl = d.select(col("doc_id"), size(TextFns.tokens(col("text"))).cast("long").as("dl"))
      .persist()
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("t_tokens"))
    val tf = d.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
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
    val scored = tf
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
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("n_terms"), col("score"))
  }

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
    "q84_bm25" -> (q84Bm25 _)
  )

  def sql: Map[String, String] = Map(
    "q84_bm25" -> q84Bm25Sql
  )
}
