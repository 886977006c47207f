package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{ExactDecimal, TextFns}
import graft.expr.NativeTextFns

/** Corpus-curation operators — the second wave of training-data-pipeline
  * ops over `documents` (first wave: TextQueries q23-q30/q48): benchmark
  * decontamination, corpus-level heavy hitters, token-budget sequence
  * packing, and TF-IDF term extraction.
  *
  * Scale design notes per query are on each member; the common theme is
  * that the per-document work is codegen'd column expressions and every
  * shuffle is keyed by content hash / token / shard — no global windows,
  * no driver-side state.
  */
object CurationQueries {

  private val docs = (s: SparkSession, dir: String) => Tables.documents(s, dir)

  // ---------------------------------------------------- decontamination

  /** Benchmark decontamination: flag every training document that shares
    * at least one word-8-gram with the benchmark set (the standard
    * n-gram-overlap contamination test for LLM eval integrity; 8-grams ≈
    * the 8-13-gram windows used in published decontamination setups).
    * The benchmark here is the deterministic 2% slice `doc_id % 100 < 2`
    * — in production it would be the eval suites themselves.
    *
    * 100 TB shape: the benchmark side is eval-suite-sized (MBs), so its
    * distinct shingle set BROADCASTS; the corpus streams through one
    * codegen'd shingle expression + broadcast hash semi-join and the only
    * shuffle is the per-doc hit count (pre-aggregated map-side). The
    * corpus is never self-joined and never shuffled by shingle. */
  /** Contamination-test parameters, shared by q61 and q70 (one site to
    * change slice or window width — a drift between the two surfaces as
    * a q70 reconciliation-spec failure otherwise). */
  private val ContamGramWidth = 8
  private def isBenchDoc = col("doc_id") % 100 < 2

  /** Shingled frame (doc_id, sh) both contamination consumers start
    * from. Caller persists — each caller feeds it to several subplans. */
  private def contamShingles(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("th", NativeTextFns.tokenHashes(spark, col("text")))
      .select(col("doc_id"),
        NativeTextFns.shingleHashes(spark, col("th"), ContamGramWidth).as("sh"))

  /** Per-candidate benchmark-overlap counts over a shingled frame:
    * (doc_id, n_hits > 0) for every non-benchmark doc with ≥1 shared
    * gram. The benchmark side is eval-suite-sized → broadcast. */
  private def contamHits(sh: DataFrame): DataFrame = {
    val bench = sh.filter(isBenchDoc).select(explode(col("sh")).as("g")).distinct()
    sh.filter(!isBenchDoc).select(col("doc_id"), explode(col("sh")).as("g"))
      .join(broadcast(bench), Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  def q61Decontamination(spark: SparkSession, dir: String): DataFrame = {
    // persist: the shingle frame feeds the benchmark side, the candidate
    // explode, AND the per-doc gram counts — unpersisted, the tokenize +
    // shingle pipeline would run three times
    val sh = contamShingles(spark, dir).persist()
    sh.filter(!isBenchDoc)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"))
      .join(contamHits(sh), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("is_contaminated"))
  }

  val q61DecontaminationSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH th AS (
       |  SELECT doc_id, list_transform($toks, t -> ${TextFns.ddbPolyHash("t")}) AS h
       |  FROM documents
       |),
       |sh AS (SELECT doc_id, ${TextFns.ddbShingleHashSetN("h", 8)} AS s FROM th),
       |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 100 < 2),
       |cand AS (SELECT doc_id, len(s)::BIGINT AS n_grams, s FROM sh WHERE doc_id % 100 >= 2),
       |hits AS (
       |  SELECT c.doc_id, count(*) AS n_hits
       |  FROM (SELECT doc_id, unnest(s) AS g FROM cand) c JOIN bench USING (g)
       |  GROUP BY c.doc_id
       |)
       |SELECT c.doc_id, c.n_grams,
       |  coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       |  coalesce(h.n_hits, 0) > 0 AS is_contaminated
       |FROM cand c LEFT JOIN hits h ON c.doc_id = h.doc_id""".stripMargin
  }

  // ----------------------------------------------------- heavy hitters

  /** Corpus-level heavy hitters: the 20 most frequent tokens. Exact path
    * under the oracle gate: explode → groupBy(token) with map-side
    * partial aggregation (hot tokens like "the" pre-combine inside each
    * task, so skew never concentrates raw rows) → TakeOrderedAndProject
    * (per-partition top-20, driver merges 20×P rows — never a global
    * sort). The mergeable-summary scale path (per-partition Misra-Gries,
    * merge, ε-bounded counts — no full vocab shuffle at all) is
    * [[graft.operators.FrequentItems]], spec-proven against this exact
    * result. */
  def q62HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val top = docs(spark, dir)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(20)
    // rank window runs over the already-reduced 20 rows, not the vocab
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token").asc)))
  }

  val q62HeavyHittersSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""SELECT token, freq, row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
       |FROM (
       |  SELECT t AS token, count(*) AS freq
       |  FROM (SELECT unnest($toks) AS t FROM documents)
       |  GROUP BY t
       |  ORDER BY freq DESC, token ASC
       |  LIMIT 20
       |)""".stripMargin
  }

  /** COUNT-MIN SKETCH frequency estimation — the fixed-memory twin of
    * q62's exact heavy hitters: q62's exact path shuffles on the token
    * (a vocabulary-sized, corpus-growing key space); the sketch maps
    * every occurrence into d×w = 4×256 cells instead
    * ([[graft.sketch.CountMin]]), so the aggregation state is 1024 rows
    * REGARDLESS of corpus size, with map-side combine doing almost all
    * the counting. Output: q62's exact top-20 tokens with their sketch
    * estimates and overcounts — the one-sided-error contract
    * (`est ≥ freq`, collisions only ADD) that makes CMS safe for
    * threshold filters ("drop tokens with freq > X" can only
    * over-trigger, never miss). Mergeability (executor-local sketches
    * reduce cellwise) and the overestimate guarantee are spec-proven
    * (CountMinSpec); the oracle replays every cell bit-exactly through
    * the shared polynomial hash.
    *
    * 100 TB shape: sketch build is ONE pass, shuffle bounded at d×w
    * rows per map task; the exact top-20 here is the *evaluation
    * frame* (its vocab shuffle is q62's, labeled) — a pure-sketch
    * deployment queries the 1024-cell broadcast directly. */
  def q99CountMinFreq(spark: SparkSession, dir: String): DataFrame = {
    val w = 256
    val hashed = docs(spark, dir)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .select(TextFns.polyHash(col("token")).as("h"))
    val cms = graft.sketch.CountMin.sketch(hashed, "h", w)
    q62HeavyHitters(spark, dir)
      .withColumn("h", TextFns.polyHash(col("token")))
      .select(col("rank"), col("token"), col("freq"),
        posexplode(array(graft.sketch.CountMin.bucketExprs(col("h"), w): _*))
          .as(Seq("rw", "bucket")))
      .join(broadcast(cms), Seq("rw", "bucket"))
      .groupBy("rank", "token", "freq")
      .agg(min("cnt").as("est_cnt"))
      .withColumn("overcount", col("est_cnt") - col("freq"))
  }

  val q99CountMinFreqSql: String = {
    val toks = TextFns.ddbTokens("text")
    val h = TextFns.ddbPolyHash("token")
    val d = graft.sketch.CountMin.depth
    s"""WITH occ AS (
       |  SELECT unnest($toks) AS token FROM documents
       |),
       |hh AS (SELECT $h AS h FROM occ),
       |cells AS (
       |  SELECT gs.j AS rw, ${graft.sketch.CountMin.ddbBucket("h", "gs.j", 256)} AS bucket
       |  FROM hh CROSS JOIN generate_series(0, ${d - 1}) AS gs(j)
       |),
       |cms AS (SELECT rw, bucket, count(*)::BIGINT AS cnt FROM cells GROUP BY rw, bucket),
       |top AS (
       |  SELECT token, freq, row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
       |  FROM (
       |    SELECT t AS token, count(*) AS freq
       |    FROM (SELECT unnest($toks) AS t FROM documents)
       |    GROUP BY t ORDER BY freq DESC, token ASC LIMIT 20
       |  )
       |),
       |probes AS (
       |  SELECT rank, token, freq, gs.j AS rw,
       |    ${graft.sketch.CountMin.ddbBucket(s"($h)", "gs.j", 256)} AS bucket
       |  FROM top CROSS JOIN generate_series(0, ${d - 1}) AS gs(j)
       |)
       |SELECT p.rank, p.token, p.freq, min(c.cnt)::BIGINT AS est_cnt,
       |  (min(c.cnt) - p.freq)::BIGINT AS overcount
       |FROM probes p JOIN cms c ON p.rw = c.rw AND p.bucket = c.bucket
       |GROUP BY p.rank, p.token, p.freq""".stripMargin
  }

  /** DETERMINISTIC EPOCH SHUFFLE — the multi-epoch dataloader ordering:
    * each training epoch needs a DIFFERENT but REPRODUCIBLE permutation
    * of the corpus. Position comes from an overflow-safe multiplicative
    * hash with a per-epoch multiplier (the q49 family, so it stays
    * valid past ids ≥ 2^33), and — the scale-honest part — ordering is
    * SHARD-LOCAL: docs hash into 8 shards per epoch and are ranked
    * within their shard, which is exactly how a distributed dataloader
    * consumes data (each worker reads its own shard in order). A global
    * row_number would be a single-partition window — the q8-gate
    * anti-pattern — and no trainer needs a total order across workers.
    * Bijectivity per (epoch, shard) and epoch-to-epoch order divergence
    * are spec-asserted (EpochShuffleSpec).
    *
    * 100 TB shape: one hash per row + a window partitioned by (epoch,
    * shard) — 2·8 independent sort groups, no global sort anywhere. */
  def q111EpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    val mult = Map(0 -> 2654435761L, 1 -> 2654435789L)
    val perEpoch = (0 to 1).map { ep =>
      docs(spark, dir).select(col("doc_id"))
        .withColumn("epoch", lit(ep))
        .withColumn("h", pmod(pmod(col("doc_id"), lit(P)) * mult(ep), lit(P)))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    perEpoch
      .withColumn("shard", (col("h") % 8).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select("epoch", "shard", "pos", "doc_id")
  }

  val q111EpochShuffleSql: String =
    """WITH perm AS (
      |  SELECT 0 AS epoch, doc_id,
      |    ((doc_id % 1000000007) * 2654435761) % 1000000007 AS h
      |  FROM documents
      |  UNION ALL
      |  SELECT 1 AS epoch, doc_id,
      |    ((doc_id % 1000000007) * 2654435789) % 1000000007 AS h
      |  FROM documents
      |)
      |SELECT epoch, (h % 8)::INT AS shard,
      |  row_number() OVER (PARTITION BY epoch, h % 8 ORDER BY h, doc_id) AS pos,
      |  doc_id
      |FROM perm""".stripMargin

  // -------------------------------------------------- sequence packing

  /** Token-budget sequence packing — the batch-construction step of a
    * training pipeline: documents are packed contiguously (in doc_id
    * order) into fixed 2048-token bins, per `source` shard; a document
    * belongs to the bin its first token lands in (bins may overhang —
    * documents are never split, the standard pack-then-wrap layout).
    *
    * 100 TB shape: ONE keyed window (partitionBy shard) — packing is
    * embarrassingly parallel across shards, and a shard is bounded (one
    * crawl dump / one source), so no global ordering exists anywhere.
    * Deterministic: (source, doc_id) totally orders every shard. */
  def q63PackSequences(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .select(col("source"), col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        // DIV, not floor(/): Spark's `/` on longs is double division,
        // which loses exactness past 2^53 cumulative tokens; DuckDB's
        // oracle `//` is exact integer division at any offset
        expr(s"start_off DIV $budget").as("bin_id"),
        (col("start_off") % budget).as("offset_in_bin"))
  }

  val q63PackSequencesSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH t AS (
       |  SELECT source, doc_id, len($toks)::BIGINT AS n_tokens FROM documents
       |),
       |offs AS (
       |  SELECT source, doc_id, n_tokens,
       |    (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT - n_tokens AS start_off
       |  FROM t
       |)
       |SELECT source, doc_id, n_tokens,
       |  start_off // 2048 AS bin_id,
       |  start_off % 2048 AS offset_in_bin
       |FROM offs""".stripMargin
  }

  // -------------------------------------------------------------- tfidf

  /** Rational TF-IDF: top-3 terms per document by `tf · N / df` (the
    * log-free idf variant — same per-term df ordering as `log(N/df)`,
    * but exact integer arithmetic, so both engines agree to the last
    * bit; [[ExactDecimal.halfUpRatio]] fixes the rounding).
    *
    * 100 TB shape: tf shuffles on (doc, token) with map-side combine;
    * df is vocab-sized (dims, not corpus) → BROADCAST to the tf side
    * (falls back to a token-keyed shuffle join past the broadcast
    * budget); the top-3 window shuffles on doc_id only. The corpus
    * text is tokenized once (tf persisted — df and the scored frame
    * both derive from it); the N-docs scalar is a column-pruned count. */
  def q64TfIdf(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // persist: df (the broadcast side) and the scored frame both derive
    // from tf — unpersisted, the tokenize + (doc,token) aggregation (the
    // expensive stage) would execute twice
    val tf = d.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .persist()
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token").asc)
    tf.join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", ExactDecimal.halfUpRatio(col("tf") * col("n_docs"), col("df"), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "token", "tf", "df", "tfidf", "rank")
  }

  val q64TfIdfSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH tf AS (
       |  SELECT doc_id, t AS token, count(*) AS tf
       |  FROM (SELECT doc_id, unnest($toks) AS t FROM documents)
       |  GROUP BY doc_id, t
       |),
       |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, token, tf, df,
       |    ${ExactDecimal.ddbHalfUpRatio("tf * n_docs", "df", 4)} AS tfidf
       |  FROM tf JOIN dfreq USING (token) CROSS JOIN n
       |)
       |SELECT doc_id, token, tf, df, tfidf, rank
       |FROM (
       |  SELECT doc_id, token, tf, df, tfidf,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rank
       |  FROM scored
       |) WHERE rank <= 3""".stripMargin
  }

  // ------------------------------------------------------------ chunking

  /** Context-window chunking — split every document into overlapping
    * 64-token windows with stride 32 (the sliding-window prep for models
    * whose context is shorter than the document). Emits one row per
    * chunk with a combined hash of its token hashes, so chunk identity
    * is checkable without materializing chunk text.
    *
    * 100 TB shape: per-row explode with bounded fan-out (≤ n_tokens/32
    * chunks/doc), no shuffle at all — chunking is embarrassingly
    * parallel and stays inside whole-stage codegen. */
  def q65ChunkWindows(spark: SparkSession, dir: String): DataFrame = {
    val (winSize, stride) = (64, 32)
    val d = docs(spark, dir)
      .withColumn("th", NativeTextFns.tokenHashes(spark, col("text")))
      .withColumn("n", size(col("th")).cast("long"))
      .filter(col("n") > 0)
      // ceil((n - win)/stride) + 1 in integer arithmetic
      .withColumn("n_chunks",
        when(col("n") <= winSize, lit(1L))
          .otherwise(expr(s"(n - ${winSize - stride + 1}) div $stride") + 1L))
    d.select(col("doc_id"), col("n").as("n_tokens"), col("th"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"))
      .withColumn("chunk",
        slice(col("th"), (col("chunk_idx") * stride + 1).cast("int"), lit(winSize)))
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        (col("chunk_idx") * stride).as("start_tok"),
        size(col("chunk")).cast("long").as("chunk_len"),
        aggregate(col("chunk"), lit(0L),
          (acc, x) => (acc * TextFns.ShingleK + x) % TextFns.HashMod).as("chunk_hash"))
  }

  val q65ChunkWindowsSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, list_transform($toks, t -> ${TextFns.ddbPolyHash("t")}) AS h,
       |    len($toks)::BIGINT AS n
       |  FROM documents
       |),
       |c AS (
       |  SELECT doc_id, h, n,
       |    CASE WHEN n <= 64 THEN 1 ELSE (n - 33) // 32 + 1 END AS n_chunks
       |  FROM t WHERE n > 0
       |),
       |e AS (SELECT doc_id, h, n, unnest(range(n_chunks)) AS chunk_idx FROM c)
       |SELECT doc_id, chunk_idx, n AS n_tokens,
       |  chunk_idx * 32 AS start_tok,
       |  len(h[chunk_idx*32 + 1 : chunk_idx*32 + 64])::BIGINT AS chunk_len,
       |  list_reduce(list_prepend(0::BIGINT, h[chunk_idx*32 + 1 : chunk_idx*32 + 64]),
       |    (acc, x) -> (acc * ${TextFns.ShingleK} + x) % ${TextFns.HashMod}) AS chunk_hash
       |FROM e""".stripMargin
  }

  // ---------------------------------------------------- mixture sampling

  /** Temperature-weighted source mixture (α = 0.5): keep ⌊√N_s⌋
    * documents per source, chosen by a Knuth multiplicative hash rank —
    * the data-mixing step that up-weights small sources relative to
    * proportional sampling (quota ∝ N^α flattens the source
    * distribution, the standard multilingual/multi-source rebalance).
    * Deterministic at any parallelism: the hash rank is a pure function
    * of doc_id.
    *
    * 100 TB shape: one count agg (source-dim sized, broadcast back) +
    * one keyed window per source shard. No global order. */
  def q66MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val counts = docs(spark, dir).groupBy("source")
      .agg(count(lit(1)).as("n_total"))
      .withColumn("quota", floor(sqrt(col("n_total").cast("double"))).cast("long"))
    val w = Window.partitionBy("source").orderBy(col("h").asc, col("doc_id").asc)
    docs(spark, dir)
      // reduce doc_id mod M BEFORE multiplying: the congruence keeps the
      // hash identical, and (M−1)·2654435761 ≈ 2.7e18 stays inside Long —
      // the raw product overflows (silently in Spark, an error in DuckDB)
      // for doc_id ≳ 3.5e9
      .withColumn("h",
        pmod(pmod(col("doc_id"), lit(1000000007L)) * 2654435761L, lit(1000000007L)))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq("source"))
      .select(col("source"), col("doc_id"), col("n_total"), col("quota"),
        col("sample_rank"), (col("sample_rank") <= col("quota")).as("is_kept"))
  }

  val q66MixtureSampleSql: String =
    """WITH counts AS (
      |  SELECT source, count(*) AS n_total,
      |    floor(sqrt(count(*)::DOUBLE))::BIGINT AS quota
      |  FROM documents GROUP BY source
      |),
      |ranked AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007 ASC, doc_id ASC)::BIGINT AS sample_rank
      |  FROM documents
      |)
      |SELECT r.source, r.doc_id, c.n_total, c.quota, r.sample_rank,
      |  r.sample_rank <= c.quota AS is_kept
      |FROM ranked r JOIN counts c ON r.source = c.source""".stripMargin

  // ------------------------------------------------- repetition scoring

  /** Intra-document repetition score — the boilerplate/spam signal of
    * quality pipelines: 1 − distinct/total word-3-gram ratio (0 = no
    * repeated shingle, →1 = the same phrase looped). Pure per-row array
    * expressions, no shuffle, exact-rational rounding. */
  def q67RepetitionScore(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("th", NativeTextFns.tokenHashes(spark, col("text")))
      .withColumn("n_shingles", greatest(size(col("th")) - 2, lit(0)).cast("long"))
      .filter(col("n_shingles") > 0)
      .withColumn("n_distinct",
        size(NativeTextFns.shingleHashes(spark, col("th"), 3)).cast("long"))
      .select(col("doc_id"), col("n_shingles"), col("n_distinct"),
        ExactDecimal.halfUpRatio(
          col("n_shingles") - col("n_distinct"), col("n_shingles"), 4).as("rep_ratio"))

  val q67RepetitionScoreSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, list_transform($toks, t -> ${TextFns.ddbPolyHash("t")}) AS h
       |  FROM documents
       |),
       |s AS (
       |  SELECT doc_id,
       |    greatest(len(h) - 2, 0)::BIGINT AS n_shingles,
       |    len(${TextFns.ddbShingleHashSet3("h")})::BIGINT AS n_distinct
       |  FROM t
       |)
       |SELECT doc_id, n_shingles, n_distinct,
       |  ${ExactDecimal.ddbHalfUpRatio("n_shingles - n_distinct", "n_shingles", 4)} AS rep_ratio
       |FROM s WHERE n_shingles > 0""".stripMargin
  }

  // ------------------------------------------------ substring-level dedup

  /** Exact-substring duplication across documents — the substring-level
    * member of the dedup family (document-exact q23, near q27/q29/q30,
    * embedding q53): two docs are substring-linked when they share a
    * verbatim 16-token window. This is the blocking step of
    * suffix-array substring dedup (published method: match on long
    * n-gram window hashes, then extend) — window-hash equality is an
    * EQUI-join whose fan-out is bounded by true repeated content, not
    * vocabulary: unlike q27's 3-gram join (hot shingles everywhere), a
    * 16-token window collides only on genuinely shared phrasing, so the
    * shuffle stays sparse at 100 TB. */
  def q68SubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    val sh = docs(spark, dir)
      .withColumn("th", NativeTextFns.tokenHashes(spark, col("text")))
      .select(col("doc_id"), explode(NativeTextFns.shingleHashes(spark, col("th"), 16)).as("w"))
    sh.as("a").join(sh.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_windows"))
  }

  val q68SubstringDedupSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, list_transform($toks, t -> ${TextFns.ddbPolyHash("t")}) AS h
       |  FROM documents
       |),
       |sh AS (SELECT doc_id, unnest(${TextFns.ddbShingleHashSetN("h", 16)}) AS w FROM t)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_windows
       |FROM sh a JOIN sh b ON a.w = b.w AND a.doc_id < b.doc_id
       |GROUP BY 1, 2""".stripMargin
  }

  // ------------------------------------------------------ corpus report

  /** Per-source data card — the governance artifact a curation pipeline
    * ships with its output: document and token counts, duplicate and
    * contamination tallies, all in ONE composed plan over the signals the
    * individual queries prove (q23 exact-dup canonicals, q61 benchmark
    * 8-gram hits). Every reported figure is integer-derived (counts and
    * exact-rational ratios), so both engines agree to the last bit.
    *
    * 100 TB shape: the doc-level signal frame is ONE pass over the corpus
    * (hash window + broadcast contamination semi-join), then a
    * source-keyed aggregation — the report costs one extra shuffle on
    * top of the signals it summarizes. */
  def q70CorpusReport(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .withColumn("th", NativeTextFns.tokenHashes(spark, col("text")))
      .withColumn("n_tokens", size(col("th")).cast("long"))
      .withColumn("sh", NativeTextFns.shingleHashes(spark, col("th"), ContamGramWidth))
      .withColumn("text_hash", sha2(lower(trim(col("text"))), 256))
      .persist()
    val w = Window.partitionBy("text_hash")
    val dupFlags = d
      .withColumn("canonical_id", min("doc_id").over(w))
      .select(col("doc_id"), (col("doc_id") =!= col("canonical_id")).as("is_dup"))
    // same subplan as q61 (shared contamHits helper) over THIS query's
    // persisted frame
    val contamIds = contamHits(d.select("doc_id", "sh"))
      .select("doc_id").withColumn("is_contaminated", lit(true))
    d.select(col("source"), col("doc_id"), col("n_tokens"))
      .join(dupFlags, Seq("doc_id"))
      .join(contamIds, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"),
        sum(when(coalesce(col("is_contaminated"), lit(false)), 1L).otherwise(0L)).as("n_contaminated"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        ExactDecimal.halfUpRatio(col("total_tokens"), col("n_docs"), 2).as("avg_doc_tokens"),
        col("n_dup_docs"), col("n_contaminated"),
        ExactDecimal.halfUpRatio(col("n_contaminated") * 100, col("n_docs"), 2).as("pct_contaminated"))
  }

  val q70CorpusReportSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH base AS (
       |  SELECT source, doc_id, text,
       |    list_transform($toks, t -> ${TextFns.ddbPolyHash("t")}) AS h,
       |    len($toks)::BIGINT AS n_tokens,
       |    sha256(lower(trim(text))) AS text_hash
       |  FROM documents
       |),
       |sh AS (SELECT source, doc_id, n_tokens, text_hash,
       |         ${TextFns.ddbShingleHashSetN("h", 8)} AS s FROM base),
       |dup AS (
       |  SELECT doc_id,
       |    doc_id <> min(doc_id) OVER (PARTITION BY text_hash) AS is_dup
       |  FROM sh
       |),
       |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 100 < 2),
       |contam AS (
       |  SELECT DISTINCT c.doc_id
       |  FROM (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 100 >= 2) c
       |  JOIN bench USING (g)
       |)
       |SELECT s.source,
       |  count(*)::BIGINT AS n_docs,
       |  sum(s.n_tokens)::BIGINT AS total_tokens,
       |  ${ExactDecimal.ddbHalfUpRatio("sum(s.n_tokens)::BIGINT", "count(*)::BIGINT", 2)} AS avg_doc_tokens,
       |  sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
       |  sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contaminated,
       |  ${ExactDecimal.ddbHalfUpRatio(
            "sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT * 100",
            "count(*)::BIGINT", 2)} AS pct_contaminated
       |FROM sh s
       |JOIN dup d ON s.doc_id = d.doc_id
       |LEFT JOIN contam c ON s.doc_id = c.doc_id
       |GROUP BY s.source""".stripMargin
  }

  // --------------------------------------------------- bigram LM scoring

  /** Bigram language-model fluency score — the CCNet-style perplexity
    * filter of quality pipelines, transcendental-free: the corpus itself
    * is the LM (bigram MLE with add-4 pseudo-count smoothing on the
    * prefix), and each document scores the mean conditional probability
    * of its token bigrams, in exact basis points
    * (⌊10000·c(w₁w₂)/(c(w₁)+4)⌋ per occurrence, integer-averaged at the
    * end). The smoothing constant is what makes the score a fluency
    * signal: an UNSMOOTHED MLE assigns probability 1 to every singleton
    * bigram (c₂=c₁=1), so token salad would score perfectly; +4 caps a
    * one-observation context at 0.2 while well-supported chains still
    * approach 1. Predictable/templated text scores high, salad scores
    * low — the same ordering as smoothed log-perplexity, but
    * bit-identical cross-engine (log/exp differ in last bits between
    * libm implementations; this is the q64 log-free-idf philosophy
    * applied to LM scoring; ordering spec-asserted in
    * CurationQueriesSpec).
    *
    * 100 TB shape: per-doc bigram extraction is a per-row array transform
    * (zero shuffle); the model tables are vocab-dim (not corpus-dim) —
    * c(w₁w₂) and c(w₁) aggregate with map-side combine, their join is
    * vocab-sized, and the scored model BROADCASTS back to the doc-keyed
    * side exactly like q64's df table (past the broadcast budget it
    * degrades to a (p,b)-keyed shuffle join, still never corpus×corpus).
    * The doc-side re-aggregation is one (doc,p,b) combine + one doc-keyed
    * shuffle. */
  def q72BigramLm(spark: SparkSession, dir: String): DataFrame =
    bigramLmScores(spark, docs(spark, dir))

  /** q72's core over any (doc_id, text) frame — kept separate so specs
    * can feed constructed corpora (CurationQueriesSpec's fluency-contrast
    * test). */
  def bigramLmScores(spark: SparkSession, d: DataFrame): DataFrame = {
    // persist: the bigram-occurrence frame feeds the two model counts AND
    // the per-doc aggregation — unpersisted, tokenize+hash runs 3×
    val pairs = d
      .withColumn("th", NativeTextFns.tokenHashes(spark, col("text")))
      .filter(size(col("th")) >= 2)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(th) - 1), i -> named_struct(
           |  'p', element_at(th, i),
           |  'b', (element_at(th, i) * ${TextFns.ShingleK} + element_at(th, i + 1)) % ${TextFns.HashMod}))""".stripMargin)).as("pb"))
      .select(col("doc_id"), col("pb.p").as("p"), col("pb.b").as("b"))
      .persist()
    val c2 = pairs.groupBy("p", "b").agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy("p").agg(count(lit(1)).as("c1"))
    val scored = c2.join(c1, Seq("p"))
      .select(col("p"), col("b"), expr("(c2 * 10000) DIV (c1 + 4)").as("s"))
    pairs.groupBy("doc_id", "p", "b").agg(count(lit(1)).as("m"))
      .join(broadcast(scored), Seq("p", "b"))
      .groupBy("doc_id")
      .agg(sum("m").as("n_bigrams"), sum(col("m") * col("s")).as("ssum"))
      .select(col("doc_id"), col("n_bigrams"),
        ExactDecimal.halfUpRatio(col("ssum"), col("n_bigrams"), 4).as("lm_score"))
  }

  val q72BigramLmSql: String = {
    val toks = TextFns.ddbTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, list_transform($toks, x -> ${TextFns.ddbPolyHash("x")}) AS th
       |  FROM documents
       |),
       |pairs AS (
       |  SELECT doc_id, th[i+1] AS p,
       |    (th[i+1] * ${TextFns.ShingleK} + th[i+2]) % ${TextFns.HashMod} AS b
       |  FROM (SELECT doc_id, th, unnest(range(len(th) - 1)) AS i FROM t WHERE len(th) >= 2)
       |),
       |c2 AS (SELECT p, b, count(*) AS c2 FROM pairs GROUP BY 1, 2),
       |c1 AS (SELECT p, count(*) AS c1 FROM pairs GROUP BY 1),
       |scored AS (SELECT p, b, (c2 * 10000) // (c1 + 4) AS s FROM c2 JOIN c1 USING (p)),
       |da AS (SELECT doc_id, p, b, count(*) AS m FROM pairs GROUP BY 1, 2, 3)
       |SELECT doc_id, sum(m)::BIGINT AS n_bigrams,
       |  ${ExactDecimal.ddbHalfUpRatio("sum(m * s)::BIGINT", "sum(m)::BIGINT", 4)} AS lm_score
       |FROM da JOIN scored USING (p, b)
       |GROUP BY doc_id""".stripMargin
  }

  // ------------------------------------------------------- PII redaction

  /** Regexes shared by the Spark and DuckDB sides of q73 — written to the
    * RE2 ∩ java.util.regex common subset (no lookarounds, no backrefs) so
    * both engines match identically. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
  private val IpRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** PII detection + redaction — the compliance pass of a training-data
    * pipeline: emails, phone numbers and IPv4 addresses are counted and
    * replaced with typed placeholders, email → phone → IP (emails carry
    * dots and digits, so they must leave the text first). The output
    * hash-compares the REDACTED TEXT itself (sha256) across engines, not
    * just the counts — proving byte-identical redaction. The corpus text
    * is synthetic, so a deterministic PII suffix is injected into every
    * 5th document inside the query (both engines compute the same suffix)
    * to exercise all three patterns end-to-end.
    *
    * 100 TB shape: pure per-row regex expressions — zero shuffle, stays
    * inside whole-stage codegen, scans the text column only. */
  def q73PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val scanned = concat(col("text"),
      when(col("doc_id") % 5 === 0, concat(
        lit(" Contact user"), col("doc_id"), lit("@example.com or 10.0."),
        // DIV, not /: double division loses exactness past 2^53 (the q63
        // lesson); the oracle's // is exact integer division
        col("doc_id") % 256, lit("."), expr("doc_id DIV 256") % 256,
        lit(" tel 555-012-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    docs(spark, dir)
      .withColumn("scanned", scanned)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("scanned"), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("scanned"), lit(PhoneRe), lit(0))).as("n_phones"),
        size(regexp_extract_all(col("scanned"), lit(IpRe), lit(0))).as("n_ips"),
        sha2(regexp_replace(regexp_replace(regexp_replace(col("scanned"),
          lit(EmailRe), lit("<EMAIL>")),
          lit(PhoneRe), lit("<PHONE>")),
          lit(IpRe), lit("<IP>")), 256).as("redacted_hash"))
  }

  val q73PiiRedactSql: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    text || CASE WHEN doc_id % 5 = 0 THEN
       |      ' Contact user' || doc_id || '@example.com or 10.0.' ||
       |      (doc_id % 256) || '.' || ((doc_id // 256) % 256) ||
       |      ' tel 555-012-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
       |    ELSE '' END AS scanned
       |  FROM documents
       |)
       |SELECT doc_id,
       |  len(regexp_extract_all(scanned, '$EmailRe')) AS n_emails,
       |  len(regexp_extract_all(scanned, '$PhoneRe')) AS n_phones,
       |  len(regexp_extract_all(scanned, '$IpRe')) AS n_ips,
       |  sha256(regexp_replace(regexp_replace(regexp_replace(scanned,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g'),
       |    '$IpRe', '<IP>', 'g')) AS redacted_hash
       |FROM s""".stripMargin

  // -------------------------------------------- DSIR importance weights

  /** Feature-bucket count for DSIR: every token hash and adjacent-pair
    * combined hash, folded into [[DsirBuckets]] buckets (hashed bag of
    * uni+bigrams — the feature space of Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"). */
  private val DsirBuckets = 128

  /** DSIR-style importance weighting: score every document by how much
    * more target-like than corpus-like its hashed n-gram features are.
    * Target distribution = the `lang = 'en'` slice (the canonical DSIR
    * setup: a high-quality/target domain carved from the raw crawl);
    * raw distribution = the whole corpus. Per bucket b the
    * Laplace-smoothed probability ratio
    * r_b = (tgt_b+1)·(raw_total+B) / ((raw_b+1)·(tgt_total+B)) is
    * computed in exact basis points, and a document's weight is the
    * feature-count-weighted mean of r_b over its buckets — the same
    * ordering as DSIR's summed log-likelihood ratios for per-doc mean
    * scores, but transcendental-free (the q64/q72 log-free philosophy),
    * so bit-identical cross-engine. `kept` = weight above parity
    * (10000 bp = looks at least as target-like as the average raw doc)
    * — a fixed threshold, deliberately NOT a global top-K sort.
    *
    * 100 TB shape: feature extraction is a per-row array transform; the
    * raw/target distributions are B-row aggregates with map-side combine
    * (B = 128 — vocab-free by construction, never corpus-dim); the ratio
    * table BROADCASTS to the (doc,bucket)-keyed side; the only corpus
    * shuffles are the (doc,bucket) combine and the doc-keyed sum. Ratio
    * arithmetic rides decimal(38) ([[ExactDecimal.halfUpRatioBig]]) —
    * (tgt_b+1)·(raw_total+B)·10⁴ exceeds 2^63 once the corpus passes
    * ~10^9 features; DuckDB widens to HUGEINT automatically. */
  def q82DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val B = DsirBuckets
    val d = docs(spark, dir)
    // persist: the (doc,bucket) frame feeds the raw distribution, the
    // target distribution, and the per-doc weights — 3 consumers
    val feats = d
      .withColumn("th", NativeTextFns.tokenHashes(spark, col("text")))
      .filter(size(col("th")) >= 1)
      .select(col("doc_id"), col("lang"), explode(expr(
        s"""concat(
           |  transform(th, h -> h % $B),
           |  IF(size(th) >= 2,
           |     transform(sequence(1, size(th) - 1), i ->
           |       ((element_at(th, i) * ${TextFns.ShingleK} + element_at(th, i + 1))
           |         % ${TextFns.HashMod}) % $B),
           |     cast(array() AS array<bigint>)))""".stripMargin)).as("bkt"))
      .persist()
    val raw = feats.groupBy("bkt").agg(count(lit(1)).as("raw_b"))
    val tgt = feats.filter(col("lang") === "en")
      .groupBy("bkt").agg(count(lit(1)).as("tgt_b"))
    val totals = feats.agg(
      count(lit(1)).as("raw_total"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tgt_total"))
    // ratio table: B rows — join target counts (absent bucket = 0) and
    // attach the two scalar totals; r_b in basis points, exact
    val ratio = raw.join(tgt, Seq("bkt"), "left")
      .na.fill(0L, Seq("tgt_b"))
      .crossJoin(broadcast(totals))
      .select(col("bkt"),
        // integer basis points directly (scale 0 on p·10⁴) — never a
        // double×10⁴ round-trip, whose truncate-vs-round cast differs
        // between engines; operands go decimal BEFORE multiplying so the
        // product can't wrap a long at corpus scale
        ExactDecimal.halfUpRatioBig(
          (col("tgt_b") + 1L).cast("decimal(38,0)") *
            (col("raw_total") + B) * lit(10000L),
          (col("raw_b") + 1L).cast("decimal(38,0)") *
            (col("tgt_total") + B), 0).cast("long").as("r_b"))
    feats.groupBy("doc_id", "bkt").agg(count(lit(1)).as("m"))
      .join(broadcast(ratio), Seq("bkt"))
      .groupBy("doc_id")
      .agg(sum("m").as("n_feats"), sum(col("m") * col("r_b")).as("wsum"))
      .select(col("doc_id"), col("n_feats"),
        ExactDecimal.halfUpRatio(col("wsum"), col("n_feats"), 0).as("dsir_weight"),
        (ExactDecimal.halfUpRatio(col("wsum"), col("n_feats"), 0) >= 10000d)
          .as("kept"))
  }

  val q82DsirWeightsSql: String = {
    val B = DsirBuckets
    val toks = TextFns.ddbTokens("text")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    list_transform($toks, x -> ${TextFns.ddbPolyHash("x")}) AS th
       |  FROM documents
       |),
       |feats AS (
       |  SELECT doc_id, lang, unnest(list_concat(
       |    list_transform(th, h -> h % $B),
       |    CASE WHEN len(th) >= 2 THEN
       |      list_transform(range(len(th) - 1), i ->
       |        ((th[i+1] * ${TextFns.ShingleK} + th[i+2]) % ${TextFns.HashMod}) % $B)
       |    ELSE []::BIGINT[] END)) AS bkt
       |  FROM t WHERE len(th) >= 1
       |),
       |raw AS (SELECT bkt, count(*)::BIGINT AS raw_b FROM feats GROUP BY bkt),
       |tgt AS (SELECT bkt, count(*)::BIGINT AS tgt_b FROM feats WHERE lang = 'en' GROUP BY bkt),
       |tot AS (
       |  SELECT count(*)::BIGINT AS raw_total,
       |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS tgt_total
       |  FROM feats
       |),
       |ratio AS (
       |  SELECT bkt,
       |    (${ExactDecimal.ddbHalfUpRatio(
              s"(coalesce(tgt_b, 0) + 1)::HUGEINT * (raw_total + $B) * 10000",
              s"(raw_b + 1)::HUGEINT * (tgt_total + $B)", 0)})::BIGINT AS r_b
       |  FROM raw LEFT JOIN tgt USING (bkt) CROSS JOIN tot
       |),
       |da AS (SELECT doc_id, bkt, count(*)::BIGINT AS m FROM feats GROUP BY 1, 2),
       |w AS (
       |  SELECT doc_id, sum(m)::BIGINT AS n_feats,
       |    sum(m * r_b)::BIGINT AS wsum
       |  FROM da JOIN ratio USING (bkt) GROUP BY doc_id
       |)
       |SELECT doc_id, n_feats,
       |  ${ExactDecimal.ddbHalfUpRatio("wsum", "n_feats", 0)} AS dsir_weight,
       |  ${ExactDecimal.ddbHalfUpRatio("wsum", "n_feats", 0)} >= 10000 AS kept
       |FROM w""".stripMargin
  }

  // ----------------------------------------------------------- registry

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_decontamination" -> (q61Decontamination _),
    "q62_heavy_hitters" -> (q62HeavyHitters _),
    "q99_countmin_freq" -> (q99CountMinFreq _),
    "q111_epoch_shuffle" -> (q111EpochShuffle _),
    "q63_pack_sequences" -> (q63PackSequences _),
    "q64_tfidf" -> (q64TfIdf _),
    "q65_chunk_windows" -> (q65ChunkWindows _),
    "q66_mixture_sample" -> (q66MixtureSample _),
    "q67_repetition" -> (q67RepetitionScore _),
    "q68_substring_dedup" -> (q68SubstringDedup _),
    "q70_corpus_report" -> (q70CorpusReport _),
    "q72_bigram_lm" -> (q72BigramLm _),
    "q73_pii_redact" -> (q73PiiRedact _),
    "q82_dsir_weights" -> (q82DsirWeights _)
  )

  def sql: Map[String, String] = Map(
    "q61_decontamination" -> q61DecontaminationSql,
    "q62_heavy_hitters" -> q62HeavyHittersSql,
    "q99_countmin_freq" -> q99CountMinFreqSql,
    "q111_epoch_shuffle" -> q111EpochShuffleSql,
    "q63_pack_sequences" -> q63PackSequencesSql,
    "q64_tfidf" -> q64TfIdfSql,
    "q65_chunk_windows" -> q65ChunkWindowsSql,
    "q66_mixture_sample" -> q66MixtureSampleSql,
    "q67_repetition" -> q67RepetitionScoreSql,
    "q68_substring_dedup" -> q68SubstringDedupSql,
    "q70_corpus_report" -> q70CorpusReportSql,
    "q72_bigram_lm" -> q72BigramLmSql,
    "q73_pii_redact" -> q73PiiRedactSql,
    "q82_dsir_weights" -> q82DsirWeightsSql
  )
}
