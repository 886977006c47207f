package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{ExactDecimal, TextFns}

/** End-to-end training-corpus preparation — the composition the individual
  * text operators exist FOR, run as one declarative plan:
  *
  *   quality score (q25's exact rational) → threshold filter
  *   → language ID (q26's marker argmax)
  *   → exact dedup, keep canonical min doc_id (q23's hash window)
  *   → deterministic stratified sample, per-language rates (q49's
  *     multiplicative hash — parallelism-independent)
  *
  * One pipeline, two shuffles at scale: the dedup window partitions by
  * content hash; everything before it (scoring, lang-ID) and after it
  * (sampling, projection) is per-row codegen'd work that pipelines into
  * the scan and out of the window — no intermediate materialization. At
  * 100 TB this is the canonical pre-training sweep: the same plan shape,
  * with the hash shuffle as the only data movement, AQE-coalesced.
  *
  * Sampling stratification uses the PREDICTED language (at corpus scale
  * there is no ground-truth lang column) with a higher keep-rate for
  * low-resource languages (en 20%, others 50%) — the standard up-sampling
  * of scarce strata in training-mix construction.
  */
object CorpusPrepQueries {

  /** The stateless per-row front-end (quality score + language ID) —
    * shared by the batch sweep and its streaming twin
    * ([[graft.streaming.StreamingOps.corpusPrepStream]]): pure column
    * expressions, so it applies to a static OR streaming DataFrame with
    * a `text` column unchanged. */
  def scoreAndLang(docs: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val scored = docs
      .withColumn("n", size(toks).cast("long"))
      .withColumn("st", TextFns.markerCount(toks, Seq("the", "a")).cast("long"))
      .withColumn("di", size(array_distinct(toks)).cast("long"))
      .withColumn("m", least(col("n"), lit(50L)))
      .withColumn("quality_score",
        ExactDecimal.halfUpRatio(
          col("m") * col("n") * 4 + (col("n") - col("st")) * 150 + col("di") * 150,
          col("n") * 500, 4))
      .withColumn("en_n", TextFns.markerCount(toks, Seq("the", "a", "of", "and", "is")))
      .withColumn("de_n", TextFns.markerCount(toks, Seq("der", "die", "das", "und", "ist")))
      .withColumn("es_n", TextFns.markerCount(toks, Seq("el", "los", "las", "y", "es")))
      .withColumn("fr_n", TextFns.markerCount(toks, Seq("le", "les", "et", "est", "dans")))
    val best = greatest(col("en_n"), col("de_n"), col("es_n"), col("fr_n"))
    scored.withColumn("pred_lang",
      when(best === 0, "und")
        .when(col("en_n") === best, "en")
        .when(col("de_n") === best, "de")
        .when(col("es_n") === best, "es")
        .otherwise("fr"))
  }

  /** Survivors of the full prep sweep, with their stats. */
  def q54CorpusPrep(spark: SparkSession, dir: String): DataFrame = {
    val langed = scoreAndLang(Tables.documents(spark, dir))
    // threshold filter BEFORE the dedup shuffle — less data moves
    val kept = langed.filter(col("quality_score") >= 0.7)
    val w = Window.partitionBy("text_hash")
    val deduped = kept
      .withColumn("text_hash", sha2(lower(trim(col("text"))), 256))
      .withColumn("canonical_id", min("doc_id").over(w))
      .filter(col("doc_id") === col("canonical_id"))
    deduped
      // pre-mod before the multiply: a raw id ≥ 2^33 overflows Long under
      // ANSI (caught by the sf1 scaling sweep); identical for ids < 1e9+7
      .withColumn("h",
        pmod(pmod(col("doc_id"), lit(1000000007L)) * 2654435761L, lit(100L)))
      .filter(col("h") < when(col("pred_lang") === "en", 20L).otherwise(50L))
      .select(col("doc_id"), col("pred_lang"),
        col("n").cast("int").as("n_tokens"), col("quality_score"))
  }

  val q54CorpusPrepSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, text, len(w)::BIGINT AS n,
       |    len(list_filter(w, x -> x IN ('the', 'a')))::BIGINT AS st,
       |    len(list_distinct(w))::BIGINT AS di,
       |    least(len(w)::BIGINT, 50) AS m,
       |    len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS en_n,
       |    len(list_filter(w, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) AS de_n,
       |    len(list_filter(w, x -> x IN ('el', 'los', 'las', 'y', 'es'))) AS es_n,
       |    len(list_filter(w, x -> x IN ('le', 'les', 'et', 'est', 'dans'))) AS fr_n
       |  FROM (SELECT doc_id, text, $toks AS w FROM documents)
       |),
       |langed AS (
       |  SELECT doc_id, text, n,
       |    ${ExactDecimal.ddbHalfUpRatio("m * n * 4 + (n - st) * 150 + di * 150", "n * 500", 4)} AS quality_score,
       |    CASE WHEN greatest(en_n, de_n, es_n, fr_n) = 0 THEN 'und'
       |         WHEN en_n = greatest(en_n, de_n, es_n, fr_n) THEN 'en'
       |         WHEN de_n = greatest(en_n, de_n, es_n, fr_n) THEN 'de'
       |         WHEN es_n = greatest(en_n, de_n, es_n, fr_n) THEN 'es'
       |         ELSE 'fr' END AS pred_lang
       |  FROM t
       |),
       |kept AS (SELECT * FROM langed WHERE quality_score >= 0.7),
       |deduped AS (
       |  SELECT * FROM (
       |    SELECT doc_id, pred_lang, n, quality_score,
       |      min(doc_id) OVER (PARTITION BY sha256(lower(trim(text)))) AS canonical_id
       |    FROM kept
       |  ) WHERE doc_id = canonical_id
       |)
       |SELECT doc_id, pred_lang, n::INT AS n_tokens, quality_score
       |FROM deduped
       |WHERE ((doc_id % 1000000007) * 2654435761) % 100 <
       |  CASE WHEN pred_lang = 'en' THEN 20 ELSE 50 END""".stripMargin
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_corpus_prep" -> (q54CorpusPrep _)
  )

  def sql: Map[String, String] = Map(
    "q54_corpus_prep" -> q54CorpusPrepSql
  )
}
