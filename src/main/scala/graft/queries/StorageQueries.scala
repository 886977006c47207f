package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.ExactDecimal
import graft.operators.BucketedTables

/** Storage-layout operators — the write-side levers that remove shuffles
  * and scans from every LATER query, which at 100 TB matter more than any
  * single-query optimization: bucketed tables (co-located joins) and
  * z-ordered layouts (multi-dimensional data skipping, see
  * [[graft.operators.ZOrder]]).
  */
object StorageQueries {

  /** Fact⨝fact join through bucketed storage: lineitem and orders are
    * written `bucketBy(16, orderkey)` once per session (the amortized
    * shuffle), then joined WITHOUT an Exchange on either side — bucket i
    * reads straight into task i. The aggregate after the join is the only
    * shuffle in the steady-state plan, and it moves 5 rows per partition.
    * Results are layout-independent, so the DuckDB oracle is the plain
    * join. */
  def q55BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val lt = s"lineitem_bkt$tag"
    val ot = s"orders_bkt$tag"
    BucketedTables.ensureBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"), lt, "l_orderkey", 16)
    BucketedTables.ensureBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"), ot, "o_orderkey", 16)
    BucketedTables.bucketedJoin(spark, lt, ot, "l_orderkey", "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(
        count_distinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"),
        sum(ExactDecimal.cents(col("l_quantity"))).as("qty_cents"))
  }

  val q55BucketedJoinSql: String =
    s"""SELECT o_orderpriority,
       |  count(DISTINCT o_orderkey)::BIGINT AS n_orders,
       |  count(*)::BIGINT AS n_items,
       |  sum(${ExactDecimal.ddbCents("l_quantity")})::BIGINT AS qty_cents
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1""".stripMargin

  /** q121: q55's join at the CORPUS-DERIVED bucket count
    * ([[BucketedTables.bucketsFor]] on the larger side, shared by both
    * layouts so the join stays exchange-free) — the write-time lever for
    * the fact-join wall the sf100 sweep measured, itself under the
    * oracle gate like q117–q120. Results are layout-independent, so the
    * oracle is q55's plain-join SQL; at gate SFs the derivation floors
    * at q55's 16 and the oracle re-proves row-for-row equivalence. */
  private val scaledBucketCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  def q121BucketedScaled(spark: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    // memoized per (process, dir) like the centroid stores: the count is
    // a WRITE-time derivation; steady-state reps must not rescan 600M
    // rows just to recompute the table name
    val buckets: Int = scaledBucketCounts.computeIfAbsent(dir,
      { _ => Integer.valueOf(BucketedTables.bucketsFor(li.count())) })
    val lt = s"lineitem_bkt${buckets}_$tag"
    val ot = s"orders_bkt${buckets}_$tag"
    BucketedTables.ensureBucketed(li, lt, "l_orderkey", buckets)
    BucketedTables.ensureBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"), ot, "o_orderkey", buckets)
    BucketedTables.bucketedJoin(spark, lt, ot, "l_orderkey", "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(
        count_distinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"),
        sum(ExactDecimal.cents(col("l_quantity"))).as("qty_cents"))
  }

  val q121BucketedScaledSql: String = q55BucketedJoinSql

  /** Bloom-pruned selective join: 1/5 of orders are URGENT, so 4/5 of
    * lineitem rows can never match — a ~460 KB bloom filter over the
    * urgent order keys (built by a distributed treeAggregate, carried in
    * the plan as a literal) prunes them BEFORE the join's exchange; the
    * exact inner join absorbs the bloom's false positives, so results are
    * identical to the plain join and the DuckDB oracle doesn't know the
    * filter exists. At 100 TB this is the difference between shuffling
    * 100 TB and shuffling 20 TB. */
  def q56BloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val pruned = graft.expr.BloomFns.semiPrune(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_returnflag", "l_quantity"),
      "l_orderkey", urgent, "o_orderkey")
    pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        count_distinct(col("o_orderkey")).as("n_orders"),
        sum(ExactDecimal.cents(col("l_quantity"))).as("qty_cents"))
  }

  val q56BloomPrunedJoinSql: String =
    s"""SELECT l_returnflag,
       |  count(*)::BIGINT AS n_items,
       |  count(DISTINCT o_orderkey)::BIGINT AS n_orders,
       |  sum(${ExactDecimal.ddbCents("l_quantity")})::BIGINT AS qty_cents
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT'
       |GROUP BY 1""".stripMargin

  /** Z-order clustering key (the layout operator's arithmetic, driver-
    * proven): min/max-scale l_partkey and l_suppkey to 16 bits each and
    * Morton-interleave them. [[graft.operators.ZOrder.writeZOrdered]]
    * range-partitions + sorts on this key; ZOrderSpec proves the written
    * layout bounds every dimension's per-file span (the property parquet
    * min/max skipping needs). Integer bit arithmetic on IEEE-exact scaled
    * ranks — DuckDB reproduces z-values bit-identically. */
  def q57ZOrder(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ZOrder.withZ(
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Seq("l_partkey", "l_suppkey"), bits = 16)
      .select(col("l_orderkey"), col("l_linenumber"), col("z").as("zval"))

  val q57ZOrderSql: String =
    """WITH s AS (
      |  SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
      |         min(l_suppkey) AS mns, max(l_suppkey) AS mxs
      |  FROM lineitem
      |),
      |scaled AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN mxp = mnp THEN 0 ELSE floor((l_partkey - mnp)::DOUBLE * 65535 / (mxp - mnp)::DOUBLE)::BIGINT END AS sp,
      |    CASE WHEN mxs = mns THEN 0 ELSE floor((l_suppkey - mns)::DOUBLE * 65535 / (mxs - mns)::DOUBLE)::BIGINT END AS ss
      |  FROM lineitem, s
      |)
      |SELECT l_orderkey, l_linenumber,
      |  list_sum(list_transform(range(16), b ->
      |    (((sp >> b) & 1) << (b * 2)) + (((ss >> b) & 1) << (b * 2 + 1))))::BIGINT AS zval
      |FROM scaled""".stripMargin

  /** Incremental aggregate maintenance — the nightly-ETL algebra: keep a
    * materialized partial-aggregate state (key, sum, count), aggregate
    * only the newly-arrived delta, and MERGE (union + re-aggregate of the
    * partials) instead of recomputing history. Sums and counts are
    * commutative monoids, so merged state ≡ full recompute — which is
    * exactly what the oracle asserts: the DuckDB side is the blind full
    * recompute over all rows. At 100 TB the delta path reads one day, not
    * five years; the merge shuffles `keys × 2` partial rows, not data. */
  def q58IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val cut = "1999-01-01"
    def partial(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("o_orderpriority")
      .agg(
        sum(ExactDecimal.cents(col("o_totalprice"))).as("tp_cents"),
        count(lit(1)).as("n_orders"))
    val o = Tables.orders(spark, dir)
    val state = partial(o.filter(col("o_orderdate") < cut))  // the stored MV
    val delta = partial(o.filter(col("o_orderdate") >= cut)) // today's batch
    state.unionByName(delta)
      .groupBy("o_orderpriority")
      .agg(sum("tp_cents").as("tp_cents"), sum("n_orders").as("n_orders"))
  }

  val q58IncrementalAggSql: String =
    s"""SELECT o_orderpriority,
       |  sum(${ExactDecimal.ddbCents("o_totalprice")})::BIGINT AS tp_cents,
       |  count(*)::BIGINT AS n_orders
       |FROM orders
       |GROUP BY 1""".stripMargin

  /** MERGE INTO / CDC upsert under the oracle gate: a deterministic
    * change set over orders (update every key ≡3 mod 10, delete every
    * key ≡7, insert a key-shifted copy of every key ≡1) applied via
    * [[graft.operators.MergeInto]]; the DuckDB twin computes the same
    * merge relationally. The +100.0 price update is exact in doubles
    * (adding a small integer never rounds a 2-decimal price), so both
    * engines agree bitwise. */
  def q75MergeInto(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    val changes = o.filter(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey"), lit("U").as("op"),
        (col("o_totalprice") + 100.0).as("o_totalprice"), col("o_orderpriority"))
      .unionByName(o.filter(col("o_orderkey") % 10 === 7)
        .select(col("o_orderkey"), lit("D").as("op"),
          lit(null).cast("double").as("o_totalprice"),
          lit(null).cast("string").as("o_orderpriority")))
      .unionByName(o.filter(col("o_orderkey") % 10 === 1)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"), lit("I").as("op"),
          col("o_totalprice"), col("o_orderpriority")))
    graft.operators.MergeInto.merge(o, changes, "o_orderkey",
      Seq("o_totalprice", "o_orderpriority"))
  }

  val q75MergeIntoSql: String =
    """WITH ch AS (
      |  SELECT o_orderkey AS k, 'U' AS op, o_totalprice + 100.0 AS price,
      |         o_orderpriority AS prio
      |  FROM orders WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey, 'D', NULL, NULL FROM orders WHERE o_orderkey % 10 = 7
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, 'I', o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderkey % 10 = 1
      |)
      |SELECT b.o_orderkey,
      |  CASE WHEN ch.op = 'U' THEN ch.price ELSE b.o_totalprice END AS o_totalprice,
      |  CASE WHEN ch.op = 'U' THEN ch.prio ELSE b.o_orderpriority END AS o_orderpriority,
      |  CASE WHEN ch.op = 'U' THEN 'updated' ELSE 'kept' END AS merge_status
      |FROM orders b LEFT JOIN ch ON b.o_orderkey = ch.k
      |WHERE ch.op IS NULL OR ch.op <> 'D'
      |UNION ALL
      |SELECT k, price, prio, 'inserted' FROM ch
      |WHERE op = 'I' AND k NOT IN (SELECT o_orderkey FROM orders)""".stripMargin

  /** STREAMING CDC APPLY under the oracle gate — q75's change set driven
    * through a LIVE Structured Streaming query instead of one batch
    * call: the updates arrive in micro-batch 1, the deletes + inserts in
    * micro-batch 2, each `foreachBatch` MERGEing into the versioned
    * snapshot ([[graft.operators.MergeInto.applyStream]]; at-least-once
    * replay → exactly-once snapshot via merge idempotence + the
    * v<N>/_latest commit protocol). The three change classes touch
    * DISJOINT key sets, so the final state after sequential application
    * equals the one-shot q75 merge — which is exactly what the oracle
    * computes (q75's SQL minus the per-application merge_status). This
    * closes the CDC tier's last spec-only gap: stream ≡ batch ≡
    * relational recompute, driver-hash-proven.
    *
    * The `collect` feeding MemoryStream is harness wiring (q93's note
    * applies verbatim): the foreachBatch body never sees its source, so
    * a Kafka/file CDC feed runs the identical per-batch plan. */
  def q102StreamingCdc(spark: SparkSession, dir: String): DataFrame = {
    val root = cdcStreamRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("strcdc", d)
      val o = Tables.orders(spark, d)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
      val payload = Seq("o_totalprice", "o_orderpriority")
      // v0: the base state seeds the snapshot via an all-insert batch
      graft.operators.MergeInto.applyBatch(
        o.select(col("o_orderkey"), lit("I").as("op"),
          col("o_totalprice"), col("o_orderpriority")),
        r, "o_orderkey", payload)
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Option[Double], Option[String])]
      val q = graft.operators.MergeInto.applyStream(
        in.toDF().toDF("o_orderkey", "op", "o_totalprice", "o_orderpriority"),
        r, "o_orderkey", payload, s"${r}_ckpt")
      try {
        val updates = o.filter(col("o_orderkey") % 10 === 3)
          .select(col("o_orderkey"), (col("o_totalprice") + 100.0).as("p"),
            col("o_orderpriority"))
          .as[(Long, Double, String)].collect().toSeq
          .map { case (k, p, pr) => (k, "U", Some(p), Some(pr)) }
        in.addData(updates); q.processAllAvailable()
        val delIns =
          o.filter(col("o_orderkey") % 10 === 7).select("o_orderkey")
            .as[Long].collect().toSeq
            .map(k => (k, "D", None: Option[Double], None: Option[String])) ++
          o.filter(col("o_orderkey") % 10 === 1)
            .select((col("o_orderkey") + 100000000L).as("k"),
              col("o_totalprice"), col("o_orderpriority"))
            .as[(Long, Double, String)].collect().toSeq
            .map { case (k, p, pr) => (k, "I", Some(p), Some(pr)) }
        in.addData(delIns); q.processAllAvailable()
      } finally q.stop()
      r
    })
    graft.operators.MergeInto.readSnapshot(spark, root)
      .getOrElse(sys.error(s"no committed CDC snapshot at $root"))
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
  }

  private val cdcStreamRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** SCHEMA-EVOLUTION READ — a corpus written over years is never one
    * schema: generation 0 files predate a column that generation 1
    * added. The read side must unify WITHOUT rewriting history (a 100 TB
    * backfill to add a column is exactly what parquet's `mergeSchema`
    * exists to avoid): gen-0 files (`o_orderkey, o_totalprice`) and
    * gen-1 files (+ `o_orderpriority`) are written once per process,
    * then read through ONE `mergeSchema` scan where the missing column
    * surfaces as NULL; the aggregate groups the pre-schema rows under an
    * explicit sentinel. The oracle computes the same union-by-name
    * relationally, so the driver hash-proves the null-fill semantics of
    * the evolved scan, not just the row count.
    *
    * 100 TB shape: mergeSchema unifies at FOOTER level (schemas, not
    * data, are reconciled — one extra footer read per file); the scan
    * stays a columnar scan with pushdown, and the missing column costs
    * nothing to "read" for old files. */
  def q106SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val root = schemaEvoRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("schevo", d)
      val o = Tables.orders(spark, d)
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$r/gen0")
      o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$r/gen1")
      r
    })
    spark.read.option("mergeSchema", "true")
      .parquet(s"$root/gen0", s"$root/gen1")
      .groupBy(coalesce(col("o_orderpriority"), lit("<pre-schema>")).as("prio"))
      .agg(count(lit(1)).as("n"),
        sum(ExactDecimal.cents(col("o_totalprice"))).as("cents"))
  }

  private val schemaEvoRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  val q106SchemaEvolutionSql: String =
    """WITH u AS (
      |  SELECT o_totalprice, NULL AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 1
      |)
      |SELECT coalesce(o_orderpriority, '<pre-schema>') AS prio,
      |  count(*)::BIGINT AS n,
      |  sum(round(o_totalprice * 100))::BIGINT AS cents
      |FROM u
      |GROUP BY 1""".stripMargin

  val q102StreamingCdcSql: String =
    """WITH ch AS (
      |  SELECT o_orderkey AS k, 'U' AS op, o_totalprice + 100.0 AS price,
      |         o_orderpriority AS prio
      |  FROM orders WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey, 'D', NULL, NULL FROM orders WHERE o_orderkey % 10 = 7
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, 'I', o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderkey % 10 = 1
      |)
      |SELECT b.o_orderkey,
      |  CASE WHEN ch.op = 'U' THEN ch.price ELSE b.o_totalprice END AS o_totalprice,
      |  CASE WHEN ch.op = 'U' THEN ch.prio ELSE b.o_orderpriority END AS o_orderpriority
      |FROM orders b LEFT JOIN ch ON b.o_orderkey = ch.k
      |WHERE ch.op IS NULL OR ch.op <> 'D'
      |UNION ALL
      |SELECT k, price, prio FROM ch
      |WHERE op = 'I' AND k NOT IN (SELECT o_orderkey FROM orders)""".stripMargin

  /** q95: incremental JOIN-view maintenance under the oracle gate — the
    * join sibling of q58's partial-aggregate merge. The materialized view
    * is `orders ⋈ lineitem`; a delta batch arrives on BOTH sides (new
    * orders past a date cut, late-arriving high line numbers), and the
    * view refreshes via [[graft.operators.IncrementalJoinView]]'s exact
    * four-term decomposition: stored view ∪ ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB, each
    * delta term a broadcast hash join. The DuckDB oracle is the BLIND
    * full-join recompute, so the driver hash-proves `refresh(state, Δ) ≡
    * recompute` — per refresh at 100 TB history is read once as the
    * stored view (append-only), and the base tables are probed once each
    * under a broadcast, shuffling nothing. */
  def q95IncrementalJoinView(spark: SparkSession, dir: String): DataFrame = {
    val cut = "1998-01-01"
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_linenumber")
    val (o0, dO) = (o.filter(col("o_orderdate") < cut), o.filter(col("o_orderdate") >= cut))
    val (l0, dL) = (l.filter(col("l_linenumber") <= 4), l.filter(col("l_linenumber") > 4))
    val cond = col("o_orderkey") === col("l_orderkey")
    val stored = o0.join(l0, cond) // stands in for the stored MV read
    graft.operators.IncrementalJoinView.refresh(stored, o0, dO, l0, dL, cond)
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        count_distinct(col("o_orderkey")).as("n_orders"),
        sum(ExactDecimal.cents(col("l_quantity"))).as("qty_cents"))
  }

  val q95IncrementalJoinViewSql: String =
    s"""SELECT o_orderpriority, l_returnflag,
       |  count(*)::BIGINT AS n_items,
       |  count(DISTINCT o_orderkey)::BIGINT AS n_orders,
       |  sum(${ExactDecimal.ddbCents("l_quantity")})::BIGINT AS qty_cents
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY 1, 2""".stripMargin

  // written-once-per-process roots for the format round-trip queries
  // (bench reps then price the steady-state READ path, and concurrent
  // processes cannot race each other's files — the q69 ensureStore recipe)
  private val formatRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureFormat(spark: SparkSession, dir: String, fmt: String,
                           write: String => Unit): String =
    formatRoots.computeIfAbsent(s"$fmt|$dir", { _ =>
      val root = s"${sys.props("java.io.tmpdir")}/graft_fmt_${ProcessHandle.current().pid()}" +
        s"_${fmt}_${math.abs(dir.hashCode)}"
      write(root)
      root
    })

  /** ORC sink+source round trip under the oracle gate: lineitem is
    * written once as ORC (columnar twin of parquet — same pushdown/
    * pruning levers), read back, and aggregated; the result is
    * format-independent, so the DuckDB oracle is the plain aggregate
    * over the parquet original — any value corruption in the ORC
    * writer/reader path hash-mismatches. */
  def q76OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = ensureFormat(spark, dir, "orc", p =>
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").orc(p))
    spark.read.orc(root)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        sum(ExactDecimal.cents(col("l_quantity"))).as("qty_cents"),
        sum(ExactDecimal.cents(col("l_extendedprice"))).as("price_cents"))
  }

  val q76OrcRoundtripSql: String =
    s"""SELECT l_returnflag,
       |  count(*)::BIGINT AS n_items,
       |  sum(${ExactDecimal.ddbCents("l_quantity")})::BIGINT AS qty_cents,
       |  sum(${ExactDecimal.ddbCents("l_extendedprice")})::BIGINT AS price_cents
       |FROM lineitem GROUP BY 1""".stripMargin

  /** JSON-lines sink+source round trip under the oracle gate: documents
    * (strings + longs — the JSONL-safe subset; float columns go through
    * binary formats) written once as JSONL, read back WITH an explicit
    * schema (schema inference on JSONL is a full extra pass at scale),
    * then aggregated per (lang, source). Oracle = the same aggregate
    * over the parquet original, so any text-encoding loss (quoting,
    * unicode, escapes) in the writer/reader hash-mismatches. */
  def q77JsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = ensureFormat(spark, dir, "jsonl", p =>
      Tables.documents(spark, dir).write.mode("overwrite").json(p))
    spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .json(root)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("text_chars"),
        sum(col("n_chars")).as("n_chars_sum"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
  }

  val q77JsonlRoundtripSql: String =
    """SELECT lang, source,
      |  count(*)::BIGINT AS n_docs,
      |  sum(len(text))::BIGINT AS text_chars,
      |  sum(n_chars)::BIGINT AS n_chars_sum,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents GROUP BY 1, 2""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_bucketed_join" -> (q55BucketedJoin _),
    "q121_bucketed_scaled" -> (q121BucketedScaled _),
    "q56_bloom_pruned_join" -> (q56BloomPrunedJoin _),
    "q57_zorder" -> (q57ZOrder _),
    "q58_incremental_agg" -> (q58IncrementalAgg _),
    "q75_merge_into" -> (q75MergeInto _),
    "q95_incremental_join_view" -> (q95IncrementalJoinView _),
    "q102_streaming_cdc" -> (q102StreamingCdc _),
    "q106_schema_evolution" -> (q106SchemaEvolution _),
    "q76_orc_roundtrip" -> (q76OrcRoundtrip _),
    "q77_jsonl_roundtrip" -> (q77JsonlRoundtrip _)
  )

  def sql: Map[String, String] = Map(
    "q55_bucketed_join" -> q55BucketedJoinSql,
    "q121_bucketed_scaled" -> q121BucketedScaledSql,
    "q56_bloom_pruned_join" -> q56BloomPrunedJoinSql,
    "q57_zorder" -> q57ZOrderSql,
    "q58_incremental_agg" -> q58IncrementalAggSql,
    "q75_merge_into" -> q75MergeIntoSql,
    "q95_incremental_join_view" -> q95IncrementalJoinViewSql,
    "q102_streaming_cdc" -> q102StreamingCdcSql,
    "q106_schema_evolution" -> q106SchemaEvolutionSql,
    "q76_orc_roundtrip" -> q76OrcRoundtripSql,
    "q77_jsonl_roundtrip" -> q77JsonlRoundtripSql
  )
}
