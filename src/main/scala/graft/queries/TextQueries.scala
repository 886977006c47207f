package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{ExactDecimal, TextFns}
import graft.expr.NativeTextFns

/** Training-data-pipeline text operators over the `documents` table:
  * exact/near dedup (hash, n-gram Jaccard, SimHash, MinHash+LSH), token
  * counting, quality scoring, language ID, and fingerprinting — the "ext"
  * layer of SURVEY §7.1 step 7.
  *
  * Scale design: every per-document computation is a pure codegen'd
  * expression (no UDFs, no explode where an array fold suffices); the only
  * shuffles are the dedup groupings/joins themselves, which partition by
  * hash/shingle key. The brute-force shingle self-join (q27) is the
  * correctness baseline; MinHash+LSH (q30) is the 100 TB path — its band
  * join touches only colliding signatures.
  *
  * All hashes are arithmetic (TextFns.polyHash) so the DuckDB oracle
  * reproduces them bit-for-bit.
  */
object TextQueries {

  private val docs = (s: SparkSession, dir: String) => Tables.documents(s, dir)

  // ------------------------------------------------------- exact dedup

  /** Exact deduplication via normalized content hash: every row keeps its
    * group's canonical (min) doc_id. Survivors = rows with is_canonical.
    * 100 TB: one hash-partitioned window over sha256 — no driver state. */
  def q23ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("text_hash")
    docs(spark, dir)
      .withColumn("text_hash", sha2(lower(trim(col("text"))), 256))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
      .select("doc_id", "text_hash", "canonical_id", "n_copies", "is_canonical")
  }

  val q23ExactDedupSql: String =
    """SELECT doc_id,
      |  sha256(lower(trim(text))) AS text_hash,
      |  min(doc_id) OVER (PARTITION BY sha256(lower(trim(text)))) AS canonical_id,
      |  count(*) OVER (PARTITION BY sha256(lower(trim(text)))) AS n_copies,
      |  doc_id = min(doc_id) OVER (PARTITION BY sha256(lower(trim(text)))) AS is_canonical
      |FROM documents""".stripMargin

  // ------------------------------------------------------ token stats

  /** Token counting: whitespace tokens, distinct tokens, mean token
    * length — one array fold per row — plus the BPE-ish pre-tokenizer
    * match count (the standard cheap pre-BPE token estimate for LLM
    * training budgets; [[TextFns.BpePattern]]). */
  def q24TokenStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    docs(spark, dir).select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      size(TextFns.bpeTokens(col("text"))).as("n_bpe_tokens"),
      ExactDecimal.halfUpRatio(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)),
        size(toks).cast("long"), 4).as("avg_token_len"))
  }

  val q24TokenStatsSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""SELECT doc_id,
       |  len(w) AS n_tokens,
       |  len(list_distinct(w)) AS n_distinct_tokens,
       |  len(${TextFns.ddbBpeTokens("text")})::INT AS n_bpe_tokens,
       |  ${ExactDecimal.ddbHalfUpRatio(
             "list_sum(list_transform(w, t -> length(t)::BIGINT))", "len(w)", 4)} AS avg_token_len
       |FROM (SELECT doc_id, text, $toks AS w FROM documents)""".stripMargin
  }

  // ---------------------------------------------------- quality score

  /** Document quality scoring: length saturation, stopword ratio,
    * lexical diversity → composite score. Rational arithmetic only (no
    * transcendentals) so the oracle's doubles are bit-identical. */
  def q25QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    // score = 0.4·min(n,50)/50 + 0.3·(n−st)/n + 0.3·di/n, computed as the
    // exact rational (4mn + 150(n−st) + 150di) / 500n — see ExactDecimal
    docs(spark, dir)
      .withColumn("n", size(toks).cast("long"))
      .withColumn("st", TextFns.markerCount(toks, Seq("the", "a")).cast("long"))
      .withColumn("di", size(array_distinct(toks)).cast("long"))
      .withColumn("m", least(col("n"), lit(50L)))
      .select(
        col("doc_id"), col("n").cast("int").as("n_tokens"),
        ExactDecimal.halfUpRatio(col("st"), col("n"), 4).as("stop_ratio"),
        ExactDecimal.halfUpRatio(col("di"), col("n"), 4).as("distinct_ratio"),
        ExactDecimal.halfUpRatio(
          col("m") * col("n") * 4 + (col("n") - col("st")) * 150 + col("di") * 150,
          col("n") * 500, 4).as("quality_score"))
  }

  val q25QualityScoreSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, len(w)::BIGINT AS n,
       |    len(list_filter(w, x -> x IN ('the', 'a')))::BIGINT AS st,
       |    len(list_distinct(w))::BIGINT AS di,
       |    least(len(w)::BIGINT, 50) AS m
       |  FROM (SELECT doc_id, $toks AS w FROM documents)
       |)
       |SELECT doc_id, n::INT AS n_tokens,
       |  ${ExactDecimal.ddbHalfUpRatio("st", "n", 4)} AS stop_ratio,
       |  ${ExactDecimal.ddbHalfUpRatio("di", "n", 4)} AS distinct_ratio,
       |  ${ExactDecimal.ddbHalfUpRatio("m * n * 4 + (n - st) * 150 + di * 150", "n * 500", 4)} AS quality_score
       |FROM t""".stripMargin
  }

  // -------------------------------------------------------- language ID

  /** N-gram-heuristic language ID: count language-marker tokens per
    * candidate language, argmax with fixed tie order. Compared against
    * the table's `lang` ground truth. */
  def q26LangId(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val scored = docs(spark, dir)
      .withColumn("en_n", TextFns.markerCount(toks, Seq("the", "a", "of", "and", "is")))
      .withColumn("de_n", TextFns.markerCount(toks, Seq("der", "die", "das", "und", "ist")))
      .withColumn("es_n", TextFns.markerCount(toks, Seq("el", "los", "las", "y", "es")))
      .withColumn("fr_n", TextFns.markerCount(toks, Seq("le", "les", "et", "est", "dans")))
    val best = greatest(col("en_n"), col("de_n"), col("es_n"), col("fr_n"))
    scored.select(
      col("doc_id"), col("lang"), col("en_n"), col("de_n"), col("es_n"), col("fr_n"),
      when(best === 0, "und")
        .when(col("en_n") === best, "en")
        .when(col("de_n") === best, "de")
        .when(col("es_n") === best, "es")
        .otherwise("fr").as("pred_lang"))
      .withColumn("is_correct", col("pred_lang") === col("lang"))
  }

  val q26LangIdSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS en_n,
       |    len(list_filter(w, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) AS de_n,
       |    len(list_filter(w, x -> x IN ('el', 'los', 'las', 'y', 'es'))) AS es_n,
       |    len(list_filter(w, x -> x IN ('le', 'les', 'et', 'est', 'dans'))) AS fr_n
       |  FROM (SELECT doc_id, lang, $toks AS w FROM documents)
       |)
       |SELECT doc_id, lang, en_n, de_n, es_n, fr_n,
       |  CASE WHEN greatest(en_n, de_n, es_n, fr_n) = 0 THEN 'und'
       |       WHEN en_n = greatest(en_n, de_n, es_n, fr_n) THEN 'en'
       |       WHEN de_n = greatest(en_n, de_n, es_n, fr_n) THEN 'de'
       |       WHEN es_n = greatest(en_n, de_n, es_n, fr_n) THEN 'es'
       |       ELSE 'fr' END AS pred_lang,
       |  CASE WHEN greatest(en_n, de_n, es_n, fr_n) = 0 THEN 'und'
       |       WHEN en_n = greatest(en_n, de_n, es_n, fr_n) THEN 'en'
       |       WHEN de_n = greatest(en_n, de_n, es_n, fr_n) THEN 'de'
       |       WHEN es_n = greatest(en_n, de_n, es_n, fr_n) THEN 'es'
       |       ELSE 'fr' END = lang AS is_correct
       |FROM t""".stripMargin
  }

  // ------------------------------------------- n-gram Jaccard near-dup

  /** Brute-force word-3-gram Jaccard near-duplicate pairs: explode
    * distinct shingles, self-join on shingle, Jaccard from intersection
    * and per-doc set sizes. Correctness baseline for q30's LSH — the
    * shingle self-join is quadratic on hot shingles and would be replaced
    * by LSH at 100 TB. */
  def q27NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // persist: the exploded shingle table feeds both join sides + counts;
    // without it the (interpreted-HOF) shingle pipeline runs 3×. Token
    // hashes materialize as their own column first — see TextFns.tokenHashes.
    val sh = d
      .withColumn("th", NativeTextFns.tokenHashes(spark, col("text")))
      .select(col("doc_id"), explode(NativeTextFns.shingleHashes(spark, col("th"), 3)).as("s"))
      .persist()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // Width-pin the self-join ON THE JOIN KEY above the cache read: the
    // join's exchange is tiny in bytes, so AQE coalesced it to one
    // partition and the entire quadratic pair expansion ran single-task
    // (1.1 s, half the warm wall — StageProbe r15). Hash(s) at the pinned
    // width is the join's own required distribution; both aliases share
    // the identical subtree so the exchange plans once (ReusedExchange)
    // and the join adds no further shuffle at any scale — the q144
    // spread pattern. (Pinning BEFORE the persist was tried and reverted:
    // both join sides raced to fill the exchange-bearing cache and the
    // shingle pipeline ran twice per rep.)
    val shp = sh.repartition(spark.sessionState.conf.numShufflePartitions, col("s"))
    val pairs = shp.as("a")
      .join(shp.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(cnt).as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(broadcast(cnt).as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("jaccard",
        col("n_common").cast("double")
          / (col("ca.n_sh") + col("cb.n_sh") - col("n_common")))
      .filter(col("jaccard") >= 0.05)
      .select(col("doc_a"), col("doc_b"), col("n_common"), round(col("jaccard"), 4).as("jaccard"))
  }

  val q27NgramJaccardSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
       |th AS (SELECT doc_id, list_transform(w, t -> ${TextFns.ddbPolyHash("t")}) AS h FROM t),
       |sh AS (
       |  SELECT doc_id, unnest(${TextFns.ddbShingleHashSet3("h")}) AS s FROM th
       |),
       |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b, n_common, round(jaccard, 4) AS jaccard
       |FROM (
       |  SELECT doc_a, doc_b, n_common,
       |    n_common::DOUBLE / (ca.n_sh + cb.n_sh - n_common) AS jaccard
       |  FROM pairs
       |  JOIN cnt ca ON doc_a = ca.doc_id
       |  JOIN cnt cb ON doc_b = cb.doc_id
       |)
       |WHERE jaccard >= 0.05""".stripMargin
  }

  // ------------------------------------------------------ fingerprinting

  /** Document fingerprinting: full-text polynomial rolling hash plus a
    * winnowing-style minimum 8-gram hash. Per-row expressions only. */
  def q28Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      NativeTextFns.polyHash(spark, col("text")).as("full_hash"),
      NativeTextFns.minGramHash(spark, col("text"), 8).as("min_gram8"))

  val q28FingerprintSql: String =
    s"""SELECT doc_id,
       |  ${TextFns.ddbPolyHash("text")} AS full_hash,
       |  CASE WHEN length(text) >= 8 THEN
       |    list_min(list_transform(range(length(text) - 7),
       |      i -> ${TextFns.ddbPolyHash("substr(text, i + 1, 8)")}))
       |  ELSE NULL END AS min_gram8
       |FROM documents""".stripMargin

  // ------------------------------------------------------------ SimHash

  /** 32-bit SimHash signatures: per-bit majority vote over token hashes,
    * computed as one nested array fold per row (no explode → no 32×
    * row blowup, stays inside whole-stage codegen). */
  def q29SimHash(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("tok_hashes", NativeTextFns.tokenHashes(spark, col("text")))
      .select(
        col("doc_id"),
        size(col("tok_hashes")).as("n_tokens"),
        NativeTextFns.simHash32(spark, col("tok_hashes")).as("simhash32"))

  val q29SimHashSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""SELECT doc_id, len(tok_hashes) AS n_tokens,
       |  list_reduce(list_prepend(0::BIGINT, list_transform(range(32), j ->
       |    CASE WHEN list_reduce(list_prepend(0::BIGINT, tok_hashes),
       |                (acc, h) -> acc + CASE WHEN (h // (1::BIGINT << j)) % 2 = 1 THEN 1 ELSE -1 END) > 0
       |         THEN (1::BIGINT << j) ELSE 0::BIGINT END)),
       |    (a, b) -> a + b) AS simhash32
       |FROM (SELECT doc_id, list_transform($toks, t -> ${TextFns.ddbPolyHash("t")}) AS tok_hashes
       |      FROM documents)""".stripMargin
  }

  // -------------------------------------------------------- MinHash+LSH

  /** Shared MinHash signature pipeline: (doc_id, sh_set, sig) — each
    * derived array materializes as its own column (see q30's persist
    * note). Reused by q30, and by the incremental-dedup store
    * ([[graft.operators.IncrementalDedup]]). */
  private[graft] def minHashSignatures(spark: SparkSession, d: DataFrame): DataFrame = d
    .withColumn("th", NativeTextFns.tokenHashes(spark, col("text")))
    .withColumn("sh_set", NativeTextFns.shingleHashes(spark, col("th"), 3))
    .withColumn("sig", NativeTextFns.minHashSig(spark, col("sh_set")))
    .select("doc_id", "sh_set", "sig")

  /** LSH band rows of a signature frame: (doc_id, band, k1, k2), 4 bands
    * × 2 rows. Null keys (empty shingle set) are dropped — they can never
    * equal a band key. */
  private[graft] def bandRows(sigs: DataFrame): DataFrame = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(3)), b => struct(
        b.as("band"),
        element_at(col("sig"), b * 2 + 1).as("k1"),
        element_at(col("sig"), b * 2 + 2).as("k2")))).as("bk"))
    .select(col("doc_id"), col("bk.band"), col("bk.k1"), col("bk.k2"))
    .filter(col("k1").isNotNull && col("k2").isNotNull)

  /** LSH band-join candidates + exact-Jaccard rerank over an (ideally
    * persisted) signature frame — the shared body of q30 and the
    * near-dup edge store build. */
  private[graft] def lshRerankedPairs(sigs: DataFrame): DataFrame = {
    val bands = bandRows(sigs)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.k1") === col("b.k1")
          && col("a.k2") === col("b.k2") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = sigs.select(col("doc_id"), col("sh_set"))
    cand
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("n_common", size(array_intersect(col("sa.sh_set"), col("sb.sh_set"))))
      .withColumn("jaccard", round(
        col("n_common").cast("double")
          / (size(col("sa.sh_set")) + size(col("sb.sh_set")) - col("n_common")), 4))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
  }

  /** MinHash + LSH near-dup candidates: 3-gram shingle hash sets → 8
    * MinHash permutations → 4 bands × 2 rows → band-key equi-join →
    * exact Jaccard rerank of candidates. The 100 TB dedup path: the
    * band join shuffles on (band, k1, k2) and only touches colliding
    * signatures, unlike q27's full shingle self-join. */
  def q30MinHashLsh(spark: SparkSession, dir: String): DataFrame = {
    // persist: signatures feed both band-join sides and the set rerank —
    // without it the shingle+minhash pipeline is recomputed ~4×. Each
    // derived array materializes as its own column (TextFns.tokenHashes).
    // NO size(sh_set)>0 filter: predicate pushdown would substitute the
    // whole sh_set expression into the filter (undoing the column
    // materialization — 50× slower); short docs instead get an all-null
    // signature, which can never equal a band key, so the result is
    // identical.
    val d = minHashSignatures(spark, docs(spark, dir)).persist()
    lshRerankedPairs(d)
  }

  /** The near-dup EDGE STORE: q30's jaccard ≥ 0.5 pairs, materialized
    * ONCE per (process, data dir) as a write-once parquet table and read
    * by every downstream consumer (q48 components, q79 PageRank, q83
    * triangles). Before r7 each of those re-derived the full shingle →
    * MinHash → band-join pipeline per query, stacking live persists;
    * under sweep-wide memory pressure one evicted block re-ran the whole
    * derivation mid-measurement (r6: q79 spread 69 s). With the store,
    * a cache miss costs a parquet re-scan of a tiny edge file. This is
    * also the honest 100 TB design: the similarity graph is built once
    * per corpus snapshot, never re-minhashed per downstream query.
    *
    * The signature cache lives only for the duration of the build —
    * unpersisted as soon as the edges are on disk. The root is
    * process-unique (pid suffix) so concurrent processes over the same
    * dir never race a write against a read. */
  private val edgeStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def nearDupEdges(spark: SparkSession, dir: String): DataFrame = {
    val root = edgeStoreRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("neardup", d)
      val sigs = minHashSignatures(spark, docs(spark, d)).persist()
      try
        lshRerankedPairs(sigs)
          .filter(col("jaccard") >= 0.5)
          .select("doc_a", "doc_b")
          // corpus-sized on a duplicate-heavy crawl — same contract as
          // IncrementalDedup.writeEdgeStore: never funnel through one
          // write task; explicit range partitioning on doc_a keeps the
          // write parallel (AQE leaves user counts alone) and gives
          // graph reads doc_a locality
          .repartitionByRange(
            spark.sessionState.conf.numShufflePartitions, col("doc_a"))
          .write.mode("overwrite").parquet(r)
      finally sigs.unpersist()
      r
    })
    spark.read.parquet(root)
  }

  val q30MinHashLshSql: String = {
    val toks = TextFns.ddbTokens("text")
    val aArr = TextFns.MinHashA.mkString("[", ", ", "]")
    val bArr = TextFns.MinHashB.mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, $toks AS w FROM documents),
       |th AS (SELECT doc_id, list_transform(w, t -> ${TextFns.ddbPolyHash("t")}) AS h FROM t),
       |d AS (
       |  SELECT doc_id, ${TextFns.ddbShingleHashSet3("h")} AS sh_set FROM th
       |),
       |sigs AS (
       |  SELECT doc_id, sh_set,
       |    list_transform(range(8), i ->
       |      list_min(list_transform(sh_set, x -> (($aArr[i+1]) * x + ($bArr[i+1])) % 1000000007))) AS sig
       |  FROM d
       |),
       |bands AS (
       |  SELECT doc_id, gs.b AS band, sig[2*gs.b + 1] AS k1, sig[2*gs.b + 2] AS k2
       |  FROM sigs CROSS JOIN generate_series(0, 3) AS gs(b)
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2 AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |  len(list_intersect(sa.sh_set, sb.sh_set)) AS n_common,
       |  round(len(list_intersect(sa.sh_set, sb.sh_set))::DOUBLE
       |    / (len(sa.sh_set) + len(sb.sh_set) - len(list_intersect(sa.sh_set, sb.sh_set))), 4) AS jaccard
       |FROM cand
       |JOIN d sa ON doc_a = sa.doc_id
       |JOIN d sb ON doc_b = sb.doc_id""".stripMargin
  }

  // --------------------------------------------- dedup cluster closure

  /** Near-dup clusters: q30's LSH candidate pairs at jaccard ≥ 0.5 form
    * the duplicate graph; min-label propagation to fixpoint assigns each
    * document its component's minimum doc id as canonical (the stage
    * that turns pairwise dedup into actual droppable duplicates).
    * Oracle: transitive closure via DuckDB recursive CTE — same unique
    * fixpoint. */
  def q48DedupComponents(spark: SparkSession, dir: String): DataFrame = {
    val edges = nearDupEdges(spark, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val vertices = docs(spark, dir).select(col("doc_id").as("id"))
    graft.ml.ConnectedComponents.components(vertices, edges)
      .select(col("id").as("doc_id"), col("component").as("canonical_id"))
      .withColumn("is_duplicate", col("doc_id") =!= col("canonical_id"))
  }

  val q48DedupComponentsSql: String =
    s"""WITH RECURSIVE cand AS (
       |  SELECT doc_a, doc_b FROM ($q30MinHashLshSql) WHERE jaccard >= 0.5
       |),
       |bi AS (
       |  SELECT doc_a AS s, doc_b AS t FROM cand
       |  UNION
       |  SELECT doc_b AS s, doc_a AS t FROM cand
       |),
       |reach(s, t) AS (
       |  SELECT s, t FROM bi
       |  UNION
       |  SELECT r.s, bi.t FROM reach r JOIN bi ON r.t = bi.s
       |)
       |SELECT d.doc_id,
       |  least(d.doc_id, coalesce(min(r.t), d.doc_id)) AS canonical_id,
       |  d.doc_id <> least(d.doc_id, coalesce(min(r.t), d.doc_id)) AS is_duplicate
       |FROM documents d LEFT JOIN reach r ON r.s = d.doc_id
       |GROUP BY d.doc_id""".stripMargin

  /** LEAKAGE-SAFE TRAIN/HOLDOUT SPLIT — the split step a training
    * pipeline must run AFTER dedup clustering, not before: splitting by
    * document hash puts near-duplicate pairs on both sides (the holdout
    * then "evaluates" on paraphrases of training data — silent eval
    * contamination). Splitting by CONNECTED COMPONENT (q48's clusters)
    * makes cross-split leakage structurally impossible: every near-dup
    * pair is inside one component by construction, and a component is
    * assigned atomically — 80/20 by the same overflow-safe Knuth
    * multiplicative hash as q49 (deterministic, parallelism-independent,
    * and valid past ids ≥ 2^33). Zero cross-split edges is spec-asserted
    * (LeakageSplitSpec), not just claimed.
    *
    * 100 TB shape: q48's closure + ONE codegen'd hash expression per
    * row — the split adds no shuffle of its own. */
  def q101LeakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = pmod(
      pmod(col("canonical_id"), lit(1000000007L)) * 2654435761L, lit(1000000007L))
    q48DedupComponents(spark, dir)
      .select(col("doc_id"), col("canonical_id"))
      .withColumn("split", when(h % 10 < 8, lit("train")).otherwise(lit("holdout")))
  }

  val q101LeakageSafeSplitSql: String =
    s"""SELECT doc_id, canonical_id,
       |  CASE WHEN ((canonical_id % 1000000007) * 2654435761) % 1000000007 % 10 < 8
       |    THEN 'train' ELSE 'holdout' END AS split
       |FROM ($q48DedupComponentsSql)""".stripMargin

  /** CORPUS SNAPSHOT DIFF — the change-data report between two corpus
    * snapshots (crawl N vs crawl N+1): per document, `added` /
    * `removed` / `changed` / `unchanged` by content hash. This is the
    * operator that decides what an incremental pipeline actually
    * re-processes — q69/q91/q94 ingest the `added ∪ changed` slice, and
    * `removed` drives tombstones; diffing by CONTENT hash (not mtime)
    * makes the report transport-independent and re-crawl-safe. Snapshots
    * here are deterministic slices of `documents` (old = all but
    * `%20 = 5`; new = all but `%20 = 11`, with `%20 = 3` rewritten) so
    * every status class is exercised.
    *
    * 100 TB shape: ONE doc_id-keyed full-outer join of two hash
    * projections — with both snapshots bucketed by doc_id (q55's
    * layout) it is exchange-free; the hash itself is per-row codegen. */
  def q105CorpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // classification branches on SIDE PRESENCE (the `in_old`/`in_new`
    // flags), not hash nullness, matching the SQL twin's
    // `old.doc_id IS NULL` rule — a NULL-text document hashes to NULL
    // but is still PRESENT, and must not be misreported as added/removed
    val old = d.filter(col("doc_id") % 20 =!= 5)
      .select(col("doc_id"), sha2(col("text"), 256).as("old_hash"),
        lit(true).as("in_old"))
    val neu = d.filter(col("doc_id") % 20 =!= 11)
      .select(col("doc_id"),
        sha2(when(col("doc_id") % 20 === 3, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")), 256).as("new_hash"),
        lit(true).as("in_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          // null-propagating `=!=` like the twin's `<>`: both-present
          // NULL-hash rows fall through to 'unchanged' in both engines
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  val q105CorpusDiffSql: String =
    """WITH old AS (
      |  SELECT doc_id, sha256(text) AS old_hash
      |  FROM documents WHERE doc_id % 20 <> 5
      |),
      |neu AS (
      |  SELECT doc_id,
      |    sha256(CASE WHEN doc_id % 20 = 3 THEN text || ' [rev2]' ELSE text END)
      |      AS new_hash
      |  FROM documents WHERE doc_id % 20 <> 11
      |)
      |SELECT coalesce(old.doc_id, neu.doc_id) AS doc_id,
      |  CASE WHEN old.doc_id IS NULL THEN 'added'
      |       WHEN neu.doc_id IS NULL THEN 'removed'
      |       WHEN old.old_hash <> neu.new_hash THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id""".stripMargin

  // ------------------------------------------- incremental near-dup dedup

  /** Incremental MinHash dedup under the oracle gate: split the corpus
    * deterministically into state (doc_id % 10 ≠ 7) and a delta batch
    * (doc_id % 10 = 7), build the partitioned signature store from the
    * state, then find every near-dup pair involving the delta via
    * [[graft.operators.IncrementalDedup]] — broadcast delta bands +
    * dynamic partition pruning on the store; the state is never
    * self-joined. Oracle: the FULL q30 recompute restricted to
    * delta-involving pairs — proving the incremental path loses and
    * invents nothing. */
  // Store bootstrap runs at most once per data dir per JVM (mirroring
  // BucketedTables.ensureBucketed) so a benchmark rep prices dedupeDelta —
  // the production per-ingest path — not the one-time state build. The
  // root is also process-unique: two concurrent processes over the same
  // dir (e.g. Bench and Verify) each build their own store instead of
  // racing writeStore overwrites against dedupeDelta reads.
  private val sigStoreRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureSigStore(spark: SparkSession, dir: String): String =
    sigStoreRoots.computeIfAbsent(dir, { d =>
      val root = graft.core.StorePaths.root("sigstore", d)
      val state = docs(spark, d).filter(col("doc_id") % 10 =!= 7)
      graft.operators.IncrementalDedup.writeStore(spark, state, root)
      root
    })

  def q69IncrementalNearDup(spark: SparkSession, dir: String): DataFrame = {
    val root = ensureSigStore(spark, dir)
    val delta = docs(spark, dir).filter(col("doc_id") % 10 === 7)
    graft.operators.IncrementalDedup.dedupeDelta(spark, root, delta)
  }

  val q69IncrementalNearDupSql: String =
    s"""SELECT doc_a, doc_b, n_common, jaccard FROM ($q30MinHashLshSql)
       |WHERE doc_a % 10 = 7 OR doc_b % 10 = 7""".stripMargin

  // ------------------------------------------- n-gram novelty curve

  /** Per-source n-gram novelty (diversity-saturation) curve: reading a
    * source's docs in doc_id order, a 3-gram shingle is NOVEL in the
    * first doc (min doc_id) where it appears. Each doc reports its
    * distinct-gram count, novel-gram count, the source's running
    * cumulative distinct-gram total, and novelty in basis points — the
    * dedup-yield measurement that tells a curation pipeline when further
    * crawl of a source stops adding information. All-integer arithmetic
    * (count, min, `div`) so the cross-engine hash is exact.
    *
    * 100 TB: first-occurrence attribution is one (source, gram)-keyed
    * aggregation — the same shuffle class as dedup — collapsing to one
    * row per document before the source-keyed curve window. Docs with
    * fewer than 3 tokens have no shingles and drop out of both engines
    * identically. */
  def q80NoveltyCurve(spark: SparkSession, dir: String): DataFrame = {
    // exploded gram stream feeds both branches; per-row hashing is cheap
    // codegen (no minhash), so recompute beats caching the explosion
    val g = docs(spark, dir)
      .withColumn("th", NativeTextFns.tokenHashes(spark, col("text")))
      .select(col("source"), col("doc_id"),
        explode(NativeTextFns.shingleHashes(spark, col("th"), 3)).as("gram"))
    val tot = g.groupBy("source", "doc_id").agg(count(lit(1)).as("total_grams"))
    val novel = g.groupBy("source", "gram").agg(min("doc_id").as("doc_id"))
      .groupBy("source", "doc_id").agg(count(lit(1)).as("novel_grams"))
    val w = Window.partitionBy("source").orderBy("doc_id")
    tot.join(novel, Seq("source", "doc_id"), "left")
      .withColumn("novel_grams", coalesce(col("novel_grams"), lit(0L)))
      .withColumn("cum_distinct", sum("novel_grams").over(w))
      .withColumn("novelty_bp", expr("(10000 * novel_grams) div total_grams"))
  }

  val q80NoveltyCurveSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH th AS (
       |  SELECT doc_id, source,
       |    list_transform($toks, t -> ${TextFns.ddbPolyHash("t")}) AS h
       |  FROM documents
       |),
       |g AS (
       |  SELECT doc_id, source, unnest(${TextFns.ddbShingleHashSet3("h")}) AS gram FROM th
       |),
       |tot AS (
       |  SELECT source, doc_id, count(*)::BIGINT AS total_grams FROM g GROUP BY source, doc_id
       |),
       |novel AS (
       |  SELECT source, doc_id, count(*)::BIGINT AS novel_grams FROM (
       |    SELECT source, gram, min(doc_id) AS doc_id FROM g GROUP BY source, gram
       |  ) GROUP BY source, doc_id
       |)
       |SELECT t.source, t.doc_id, t.total_grams,
       |  coalesce(n.novel_grams, 0)::BIGINT AS novel_grams,
       |  CAST(sum(coalesce(n.novel_grams, 0)) OVER (
       |    PARTITION BY t.source ORDER BY t.doc_id) AS BIGINT) AS cum_distinct,
       |  (10000 * coalesce(n.novel_grams, 0)) // t.total_grams AS novelty_bp
       |FROM tot t LEFT JOIN novel n ON t.source = n.source AND t.doc_id = n.doc_id""".stripMargin
  }

  // ------------------------------------------- BPE merge induction

  /** BPE tokenizer training on-engine, two merge rounds: corpus word
    * frequencies → per-word character symbol sequences → corpus-weighted
    * adjacent-pair counts → argmax pair (count desc, pair asc — the
    * deterministic tie rule) → apply the merge everywhere; repeat. The
    * output is the top-50 words (freq desc, word asc) with their symbol
    * sequences after both merges — proving count → select → apply
    * end-to-end.
    *
    * Symbol sequences are space-joined strings (tokens are
    * whitespace-split, so the separator is safe), which makes the merge
    * application a plain `replace(seq, "a b", "ab")`: standard left-to-
    * right non-overlapping replacement IS the BPE greedy merge rule, and
    * Spark and DuckDB implement identical semantics. Everything is exact
    * string/integer arithmetic — no floats anywhere.
    *
    * 100 TB: pair counting shuffles on the (vocab-bounded) word then pair
    * key with map-side combine; each argmax is a TakeOrdered(1) broadcast
    * back into a per-row map stage; merge rounds are statically unrolled
    * like [[graft.ml.PageRank]]. */
  def q81BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    q87bpeVocab(spark, dir)
      .select(col("word"), col("freq"),
        size(split(col("seq"), " ")).cast("long").as("n_symbols"), col("seq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(50)
  }

  /** The corpus BPE vocabulary after two merge rounds: (word, freq, seq)
    * for every distinct token — shared by q81 (training inspection) and
    * q87 (corpus encoding). */
  private[graft] def q87bpeVocab(spark: SparkSession, dir: String): DataFrame = {
    val words = docs(spark, dir)
      .select(explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("seq", concat_ws(" ",
        transform(sequence(lit(1), length(col("word"))), i => col("word").substr(i, lit(1)))))
    bpeMergeRound(bpeMergeRound(words))
  }

  /** BPE ENCODING — applying the trained tokenizer (q81's merged vocab)
    * back to the corpus, the other half of the tokenizer loop: per
    * document, word count, character count, BPE token count, and the two
    * metrics a packing/budgeting stage actually consumes — fertility
    * (tokens per 100 words) and compression (tokens per 10k chars), both
    * in exact integer arithmetic.
    *
    * BPE merges never cross word boundaries, so encoding a document is
    * the concatenation of its words' encodings — token count per doc =
    * Σ over its word stream of the word's post-merge symbol count. That
    * turns "run the tokenizer over the corpus" into one word-keyed
    * equi-join against the vocab table instead of a per-document
    * re-execution of the merge loop.
    *
    * 100 TB: the vocab is corpus-bounded (tens of millions of rows at
    * web scale — broadcastable, or a word-keyed shuffle join); the doc
    * word stream is linear in corpus size and aggregates per doc_id with
    * map-side combine. Documents with zero tokens vanish from the word
    * stream in both engines identically. */
  def q87BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val vocab = q87bpeVocab(spark, dir)
      .select(col("word"), size(split(col("seq"), " ")).cast("long").as("n_sym"))
    val dw = docs(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("word"))
    dw.join(vocab, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"),
        sum(col("n_sym")).as("n_bpe_tokens"))
      .withColumn("fertility_pct", expr("(100 * n_bpe_tokens) div n_words"))
      .withColumn("compression_bp", expr("(10000 * n_bpe_tokens) div n_chars"))
  }

  /** One BPE merge round over a (word, freq, seq) frame: count corpus-
    * weighted adjacent pairs, pick the winner (count desc, pair asc),
    * apply it everywhere. Spec'd against a hand-computed corpus in
    * BpeSpec. Assumes the frame holds at least one multi-symbol row
    * (always true for a word corpus) — with none, the argmax frame is
    * empty and the cross join yields no rows.
    *
    * The merge is applied SYMBOL-ALIGNED: a left-to-right fold over
    * split(seq, ' ') that appends the right symbol without a space when
    * the accumulated sequence's LAST SYMBOL equals the winner's left
    * symbol. A plain substring replace would match across symbol
    * boundaries once multi-char symbols exist (round 2+): with symbols
    * ["ab","c"] and winner "b c", replace("ab c","b c","bc") yields
    * "abc" — merging inside "ab". The fold compares whole symbols, so
    * "ab" ≠ "b" and the sequence is untouched. Greedy non-overlap is
    * implicit: a just-merged last symbol is left||right, which can never
    * equal left again (right is non-empty). */
  private[graft] def bpeMergeRound(in: DataFrame): DataFrame = {
    // persist: `in` feeds BOTH the pair-count branch and the merge-apply
    // branch; unpersisted, each round re-evaluates its whole input plan
    // twice, so round 2 re-ran the corpus tokenize 4× (guide §2.4 — the
    // q98 duplicated-subtree class). The frame is the vocab table —
    // corpus-bounded and tiny relative to the token stream it summarizes.
    val inP = in.persist()
    // single-symbol rows MUST be filtered before the transform: Spark's
    // sequence(1, 0) is the DESCENDING [1, 0], and element_at(_, 0) throws
    val pairs = inP.filter(size(split(col("seq"), " ")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(split(seq, ' ')) - 1), " +
          "i -> concat(element_at(split(seq, ' '), i), ' ', element_at(split(seq, ' '), i + 1)))"))
        .as("pair"))
    val best = pairs.groupBy("pair").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc).limit(1)
      .select(
        col("pair").as("best_pair"),
        expr("element_at(split(pair, ' '), 1)").as("bp_l"),
        expr("element_at(split(pair, ' '), 2)").as("bp_r"))
    inP.crossJoin(broadcast(best))
      .withColumn("seq", expr(
        """aggregate(split(seq, ' '), '', (acc, t) ->
          |  CASE WHEN acc = '' THEN t
          |       WHEN substring_index(acc, ' ', -1) = bp_l AND t = bp_r
          |         THEN concat(acc, t)
          |       ELSE concat(acc, ' ', t) END)""".stripMargin))
      .drop("best_pair", "bp_l", "bp_r")
  }

  /** The WITH-body CTE chain ending in `m2` = the two-round merged vocab
    * (word, freq, seq) — shared by the q81 and q87 oracles. */
  private val bpeVocabSqlCtes: String = {
    val toks = TextFns.ddbTokens("text")
    // the merge application is the same symbol-aligned fold as the Spark
    // side (see bpeMergeRound): list_reduce's implicit first-element init
    // matches aggregate's '' init because the Spark fold's first step
    // returns the bare first symbol
    def round(in: String, pairsCte: String, bestCte: String, outCte: String): String =
      s"""$pairsCte AS (
         |  SELECT pair, sum(freq)::BIGINT AS cnt FROM (
         |    SELECT freq, unnest(list_transform(
         |      range(greatest(len(string_split(seq, ' ')) - 1, 0)),
         |      i -> string_split(seq, ' ')[i+1] || ' ' || string_split(seq, ' ')[i+2])) AS pair
         |    FROM $in
         |  ) GROUP BY pair
         |),
         |$bestCte AS (
         |  SELECT pair, string_split(pair, ' ')[1] AS bpl, string_split(pair, ' ')[2] AS bpr
         |  FROM $pairsCte ORDER BY cnt DESC, pair ASC LIMIT 1
         |),
         |$outCte AS (
         |  SELECT word, freq,
         |    list_reduce(string_split(seq, ' '), (acc, t) ->
         |      CASE WHEN string_split(acc, ' ')[-1] = bpl AND t = bpr THEN acc || t
         |           ELSE acc || ' ' || t END) AS seq
         |  FROM $in CROSS JOIN $bestCte
         |)""".stripMargin
    s"""words AS (
       |  SELECT word, count(*)::BIGINT AS freq FROM (
       |    SELECT unnest($toks) AS word FROM documents
       |  ) GROUP BY word
       |),
       |seq0 AS (
       |  SELECT word, freq, array_to_string(
       |    list_transform(range(length(word)), i -> word[i+1]), ' ') AS seq
       |  FROM words
       |),
       |${round("seq0", "pairs1", "best1", "m1")},
       |${round("m1", "pairs2", "best2", "m2")}""".stripMargin
  }

  val q81BpeMergesSql: String =
    s"""WITH $bpeVocabSqlCtes
       |SELECT word, freq, len(string_split(seq, ' '))::BIGINT AS n_symbols, seq
       |FROM m2 ORDER BY freq DESC, word ASC LIMIT 50""".stripMargin

  val q87BpeEncodeSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH $bpeVocabSqlCtes,
       |vocab AS (
       |  SELECT word, len(string_split(seq, ' '))::BIGINT AS n_sym FROM m2
       |),
       |dw AS (
       |  SELECT doc_id, unnest($toks) AS word FROM documents
       |)
       |SELECT d.doc_id,
       |  count(*)::BIGINT AS n_words,
       |  CAST(sum(length(d.word)) AS BIGINT) AS n_chars,
       |  CAST(sum(v.n_sym) AS BIGINT) AS n_bpe_tokens,
       |  (100 * CAST(sum(v.n_sym) AS BIGINT)) // count(*) AS fertility_pct,
       |  (10000 * CAST(sum(v.n_sym) AS BIGINT))
       |    // CAST(sum(length(d.word)) AS BIGINT) AS compression_bp
       |FROM dw d JOIN vocab v USING (word)
       |GROUP BY d.doc_id""".stripMargin
  }

  // ----------------------------------------------------------- registry

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_exact_dedup" -> (q23ExactDedup _),
    "q24_token_stats" -> (q24TokenStats _),
    "q25_quality_score" -> (q25QualityScore _),
    "q26_langid" -> (q26LangId _),
    "q27_ngram_jaccard" -> (q27NgramJaccard _),
    "q28_fingerprint" -> (q28Fingerprint _),
    "q29_simhash" -> (q29SimHash _),
    "q30_minhash_lsh" -> (q30MinHashLsh _),
    "q48_dedup_components" -> (q48DedupComponents _),
    "q101_leakage_safe_split" -> (q101LeakageSafeSplit _),
    "q105_corpus_diff" -> (q105CorpusDiff _),
    "q69_incremental_neardup" -> (q69IncrementalNearDup _),
    "q80_novelty_curve" -> (q80NoveltyCurve _),
    "q81_bpe_merges" -> (q81BpeMerges _),
    "q87_bpe_encode" -> (q87BpeEncode _)
  )

  def sql: Map[String, String] = Map(
    "q23_exact_dedup" -> q23ExactDedupSql,
    "q24_token_stats" -> q24TokenStatsSql,
    "q25_quality_score" -> q25QualityScoreSql,
    "q26_langid" -> q26LangIdSql,
    "q27_ngram_jaccard" -> q27NgramJaccardSql,
    "q28_fingerprint" -> q28FingerprintSql,
    "q29_simhash" -> q29SimHashSql,
    "q30_minhash_lsh" -> q30MinHashLshSql,
    "q48_dedup_components" -> q48DedupComponentsSql,
    "q101_leakage_safe_split" -> q101LeakageSafeSplitSql,
    "q105_corpus_diff" -> q105CorpusDiffSql,
    "q69_incremental_neardup" -> q69IncrementalNearDupSql,
    "q80_novelty_curve" -> q80NoveltyCurveSql,
    "q81_bpe_merges" -> q81BpeMergesSql,
    "q87_bpe_encode" -> q87BpeEncodeSql
  )
}
