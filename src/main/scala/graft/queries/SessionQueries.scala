package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Time-series operators the reference's engines get for free but Spark
  * lacks as built-ins — composed from existing operators per the builder
  * preference order (compose > custom plan), each validated against the
  * corresponding *native* DuckDB operator so the composition is proven
  * equivalent to the real thing, not just self-consistent.
  */
object SessionQueries {

  /** As-of join: for every "reading" event attach the most recent "mark"
    * value at or before its timestamp, per user — via the library
    * operator [[graft.operators.TemporalOps.asofJoin]] (union + ordered
    * last-non-null window; one shuffle on the user key, no
    * range-condition join blow-up), so the REUSABLE operator is what the
    * driver proves against DuckDB's native ASOF LEFT JOIN.
    *
    * Scale: this is the 100 TB shape for as-of enrichment — a union +
    * keyed window beats a theta-join (which Spark would execute as a
    * broadcast-nested-loop) whenever both sides are large. */
  def q38AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val readings = ev.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("event_id"), col("ts"))
    // dedup marks to one per (user, ts) — ties would make as-of ambiguous
    val marks = graft.operators.TemporalOps.dedupeKeepLast(
      ev.filter(col("event_id") % 2 === 1), Seq("user_id", "ts"), Seq("event_id"))
      .select(col("user_id"), col("ts"), col("value").as("mark_value"))
    graft.operators.TemporalOps
      .asofJoin(readings, marks, Seq("user_id"), "ts", Seq("mark_value"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("r_us"), col("mark_value").as("asof_value"))
  }

  val q38AsofJoinSql: String =
    """WITH readings AS (
      |  SELECT user_id, event_id, ts FROM events WHERE event_id % 2 = 0
      |),
      |marks AS (
      |  SELECT user_id, ts, value FROM (
      |    SELECT user_id, ts, value,
      |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_id % 2 = 1
      |  ) WHERE rn = 1
      |)
      |SELECT r.user_id, r.event_id, epoch_us(r.ts) AS r_us, m.value AS asof_value
      |FROM readings r
      |ASOF LEFT JOIN marks m ON r.user_id = m.user_id AND r.ts >= m.ts""".stripMargin

  /** Batch gap-based sessionization (30-minute gap) via the library
    * operator [[graft.operators.TemporalOps.sessionize]] (lag +
    * cumulative session counter), then per-session aggregates — the
    * batch twin of [[graft.streaming.StreamingOps.sessionize]]. Sums in
    * exact cents, timestamps as epoch-µs (cross-engine determinism). */
  def q39Sessionize(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TemporalOps.sessionize(
      Tables.events(spark, dir), Seq("user_id"), "ts",
      gapMicros = 30L * 60L * 1000000L, tieBreak = Seq("event_id"))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))

  val q39SessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |sessions AS (
      |  SELECT user_id, event_id, ts, value,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id,
      |  count(*) AS n_events,
      |  sum(round(value*100)::BIGINT)::BIGINT AS value_cents,
      |  min(epoch_us(ts)) AS start_us,
      |  max(epoch_us(ts)) AS end_us
      |FROM sessions
      |GROUP BY 1, 2""".stripMargin

  /** Range (interval) join via bucket decomposition: parts within ±1.0
    * of each other's retail price. A naive theta-join plans as a
    * nested-loop cartesian in Spark; bucketing the range predicate into
    * unit bands turns it into an equi-join on the band key + a residual
    * filter (the band explode covers ⌊a⌋−1..⌊a⌋+1, a superset of the true
    * range, so the filter decides membership — bucket fp edges cannot
    * affect correctness). Oracle: DuckDB's native inequality join
    * (IEJoin) over the same BETWEEN predicate. */
  def q40RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_retailprice"))
    val b = p.select(col("p_partkey").as("b_key"), col("p_retailprice").as("b_price"))
    // band width derived from the build side's value density (the result
    // is width-invariant, so the oracle pins semantics, not the knob):
    // at 10× the corpus over the same price domain, bands shrink 10× and
    // per-band candidates stay ~targetPerBand instead of growing linearly.
    // Derived ONCE per (process, dir) — bandWidthFor runs an eager stats
    // job, which per bandWidthFor's own contract should be paid per
    // snapshot, not per query construction (bench reps, plan inspections)
    val w = bandWidths.computeIfAbsent(dir,
      _ => graft.operators.TemporalOps.bandWidthFor(b, "b_price", radius = 1.0))
    graft.operators.TemporalOps
      .bandRangeJoin(p, b, "p_retailprice", "b_price", radius = 1.0, bandWidth = w)
      .filter(col("b_key") =!= col("p_partkey"))
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("n_close"), min("b_key").as("min_neighbor"))
  }

  private val bandWidths = new java.util.concurrent.ConcurrentHashMap[String, Double]()

  val q40RangeJoinSql: String =
    """SELECT a.p_partkey, count(*) AS n_close, min(b.p_partkey) AS min_neighbor
      |FROM part a JOIN part b
      |  ON b.p_retailprice >= a.p_retailprice - 1.0
      | AND b.p_retailprice <= a.p_retailprice + 1.0
      | AND b.p_partkey <> a.p_partkey
      |GROUP BY 1""".stripMargin

  /** Sequential-pattern funnel: per user, count purchases preceded (in
    * event order) by a click that was itself preceded by a view — the
    * MATCH_RECOGNIZE-style workload expressed as two staged running-flag
    * windows (each a max-of-boolean over the ordered prefix, strictly
    * before the current row). One keyed shuffle; no self-join chain. */
  def q47Funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val stage1 = Tables.events(spark, dir)
      .withColumn("seen_view",
        coalesce(max(when(col("event_type") === "view", 1).otherwise(0)).over(w), lit(0)))
    val stage2 = stage1
      .withColumn("seen_click_after_view",
        coalesce(max(when(col("event_type") === "click" && col("seen_view") === 1, 1)
          .otherwise(0)).over(w), lit(0)))
    stage2
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("seen_click_after_view")).as("n_converted"))
  }

  val q47FunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    coalesce(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seen_view
      |  FROM events
      |),
      |s2 AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    coalesce(max(CASE WHEN event_type = 'click' AND seen_view = 1 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seen_click_after_view
      |  FROM s1
      |)
      |SELECT user_id,
      |  count(*) AS n_purchases,
      |  sum(seen_click_after_view)::BIGINT AS n_converted
      |FROM s2
      |WHERE event_type = 'purchase'
      |GROUP BY 1""".stripMargin

  /** q96: streaming WINDOWED AGGREGATION under the oracle gate — the
    * watermarked 15-minute tumbling usage aggregation (the shape of
    * [[graft.streaming.StreamingOps.bucketUsage]], cents-exact here)
    * driven through a LIVE Structured Streaming query over the events
    * table, emitted append-mode into a parquet file sink as each window
    * finalizes past the watermark, read back, and hash-proved against
    * the DuckDB batch recompute — stream ≡ batch, exact (integer counts
    * and cent sums, no fp drift).
    *
    * Events replay as two ts-ordered micro-batches; the watermark is
    * then flushed the streaming-correct way, with punctuation rows past
    * max(ts)+2h (no forced `complete` mode, no unbounded result state —
    * sentinel rows filter out by `user_id < 0`). At scale state is one
    * counter per (open window, user), purged as the watermark passes;
    * the `collect` feeding MemoryStream is harness wiring (q93
    * precedent) — the per-batch plan is source-agnostic. */
  def q96StreamingBucketUsage(spark: SparkSession, dir: String): DataFrame = {
    val root = streamWinRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("strwin", d)
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rows = Tables.events(spark, d).select("ts", "user_id", "value")
        .as[(java.sql.Timestamp, Long, Double)]
        .collect().sortBy(_._1.getTime)
      require(rows.nonEmpty, s"no events under $d — cannot drive the streaming replay")
      val midMs = rows(rows.length / 2)._1.getTime
      val maxMs = rows.last._1.getTime
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, Long, Double)]
      // shared body with the file-source twin q112 — same plan, two sources
      val agg = graft.streaming.StreamingOps.bucketUsageCents(
        in.toDF().toDF("ts", "user_id", "value"))
      val q = agg.writeStream.outputMode("append").format("parquet")
        .option("path", r).option("checkpointLocation", s"${r}_ckpt").start()
      try {
        val (b1, b2) = rows.partition(_._1.getTime <= midMs)
        in.addData(b1.toSeq); q.processAllAvailable()
        in.addData(b2.toSeq); q.processAllAvailable()
        // punctuation advances the watermark past every real window end;
        // the second one forces the micro-batch in which they all emit
        in.addData(Seq((new java.sql.Timestamp(maxMs + 2L * 3600 * 1000), -1L, 0.0)))
        q.processAllAvailable()
        in.addData(Seq((new java.sql.Timestamp(maxMs + 4L * 3600 * 1000), -1L, 0.0)))
        q.processAllAvailable()
      } finally q.stop()
      r
    })
    spark.read.parquet(root).filter(col("user_id") >= 0)
  }

  private val streamWinRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  val q96StreamingBucketUsageSql: String =
    """SELECT time_bucket(INTERVAL '15 minutes', ts)::TIMESTAMP AS bucket_start,
      |  user_id,
      |  count(*)::BIGINT AS n,
      |  sum(round(value * 100))::BIGINT AS value_cents
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** STREAMING SESSIONIZATION under the oracle gate — the
    * `flatMapGroupsWithState` tier's q93/q96/q102 moment: q39's gap
    * sessionize driven through a LIVE streaming query with
    * [[graft.streaming.StreamingOps.sessionizeExact]] (all-integer
    * state, the batch gap rule and tie order, per-user session ordinals
    * carried in state), hash-proven against the SAME DuckDB oracle as
    * batch q39. Events replay as two ts-split micro-batches (a session
    * spanning the batch boundary is the case that matters — its state
    * crosses the restart boundary); one punctuation event per user past
    * the gap closes the final real sessions, and the punctuation's own
    * open session is never emitted — no sentinel filtering.
    *
    * At scale: state is one open session + counter per user (purged by
    * gap timeout in a production deployment); the `collect` feeding
    * MemoryStream is harness wiring (q93's note) — the per-batch plan
    * never sees its source. */
  def q103StreamingSessionize(spark: SparkSession, dir: String): DataFrame = {
    val root = streamSessRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("strsess", d)
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val gapUs = 30L * 60L * 1000000L
      val rows = Tables.events(spark, d).select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
      require(rows.nonEmpty, s"no events under $d — cannot drive the streaming replay")
      val midUs = rows(rows.length / 2)._2
      val maxUs = rows.last._2
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, Long)]
      val sessions = graft.streaming.StreamingOps.sessionizeExact(
        in.toDS(), gapUs)
      val q = sessions.toDF().writeStream.outputMode("append").format("parquet")
        .option("path", r).option("checkpointLocation", s"${r}_ckpt").start()
      try {
        val (b1, b2) = rows.partition(_._2 <= midUs)
        in.addData(b1.toSeq); q.processAllAvailable()
        in.addData(b2.toSeq); q.processAllAvailable()
        // one punctuation per user closes that user's final session; its
        // own session stays open in state and never emits
        val users = rows.map(_._1).distinct.toSeq
        in.addData(users.map(u => (u, maxUs + 10L * gapUs, -1L, 0L)))
        q.processAllAvailable()
      } finally q.stop()
      r
    })
    spark.read.parquet(root)
      .select("user_id", "session_id", "n_events", "value_cents",
        "start_us", "end_us")
  }

  private val streamSessRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** STREAMING AS-OF ENRICHMENT under the oracle gate — q38's as-of
    * join driven through a LIVE streaming query with
    * [[graft.streaming.StreamingOps.asofEnrichExact]] (µs-exact state,
    * marks-before-readings at an equal instant), hash-proven against
    * the SAME DuckDB native-ASOF-JOIN oracle as batch q38. Marks are
    * pre-deduped per (user, ts) exactly like the batch prep; events
    * replay as two ts-split micro-batches, so mark state crosses the
    * batch boundary (readings in batch 2 enrich from marks seen in
    * batch 1). No punctuation needed — readings emit immediately.
    *
    * At scale: state is one latest mark per user; the `collect` feeding
    * MemoryStream is harness wiring (q93's note). */
  def q104StreamingAsof(spark: SparkSession, dir: String): DataFrame = {
    val root = streamAsofRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("strasof", d)
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ev = Tables.events(spark, d)
      val readings = ev.filter(col("event_id") % 2 === 0)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), lit(false).as("is_mark"), lit(0.0).as("value"))
      val marks = graft.operators.TemporalOps.dedupeKeepLast(
          ev.filter(col("event_id") % 2 === 1), Seq("user_id", "ts"), Seq("event_id"))
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          lit(-1L).as("event_id"), lit(true).as("is_mark"), col("value"))
      val rows = readings.unionByName(marks)
        .as[(Long, Long, Long, Boolean, Double)].collect().sortBy(_._2)
      require(rows.nonEmpty, s"no events under $d — cannot drive the streaming replay")
      val midUs = rows(rows.length / 2)._2
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, Boolean, Double)]
      val enriched = graft.streaming.StreamingOps.asofEnrichExact(in.toDS())
      val q = enriched.toDF().writeStream.outputMode("append").format("parquet")
        .option("path", r).option("checkpointLocation", s"${r}_ckpt").start()
      try {
        val (b1, b2) = rows.partition(_._2 <= midUs)
        in.addData(b1.toSeq); q.processAllAvailable()
        in.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      r
    })
    spark.read.parquet(root)
      .select("user_id", "event_id", "r_us", "asof_value")
  }

  private val streamAsofRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** STREAM-STREAM WINDOWED JOIN under the oracle gate — the attribution
    * join ([[graft.streaming.StreamingOps.windowedStreamJoin]]: each
    * click joins its impression within 10 minutes, watermarks on both
    * sides bound the buffered state) driven through a LIVE two-source
    * streaming query and hash-proven against the relational interval
    * join. Impressions are the even events, clicks the odd events linked
    * to their preceding even id — so matches, non-matches (outside the
    * window), and orphan clicks all occur. Both sources replay in two
    * ts-split micro-batches: pairs whose click lands in batch 2 while
    * the impression arrived in batch 1 exercise the cross-batch join
    * buffer. Inner stream-stream joins emit on match (watermarks only
    * bound state), so no punctuation is needed.
    *
    * Output times are epoch-µs (events.ts ns-truncation rule);
    * latency_s is whole seconds (both engines floor positive epochs). */
  def q107StreamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val root = streamJoinRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("strjoin", d)
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ev = Tables.events(spark, d)
      val imps = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id").as("imp_id"), col("ts").as("imp_ts"))
        .as[(Long, java.sql.Timestamp)].collect().sortBy(_._2.getTime)
      val clicks = ev.filter(col("event_id") % 2 === 1)
        .select((col("event_id") - 1L).as("click_imp_id"), col("ts").as("click_ts"))
        .as[(Long, java.sql.Timestamp)].collect().sortBy(_._2.getTime)
      val impIn = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp)]
      val clkIn = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp)]
      val joined = graft.streaming.StreamingOps.windowedStreamJoin(
        impIn.toDF().toDF("imp_id", "imp_ts"),
        clkIn.toDF().toDF("click_imp_id", "click_ts"))
      val q = joined.writeStream.outputMode("append").format("parquet")
        .option("path", r).option("checkpointLocation", s"${r}_ckpt").start()
      try {
        require(imps.nonEmpty, s"no impression events under $d — cannot drive the streaming replay")
        val midMs = imps(imps.length / 2)._2.getTime
        impIn.addData(imps.filter(_._2.getTime <= midMs).toSeq)
        clkIn.addData(clicks.filter(_._2.getTime <= midMs).toSeq)
        q.processAllAvailable()
        impIn.addData(imps.filter(_._2.getTime > midMs).toSeq)
        clkIn.addData(clicks.filter(_._2.getTime > midMs).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      r
    })
    spark.read.parquet(root)
      .select(col("imp_id"), unix_micros(col("imp_ts")).as("imp_us"),
        unix_micros(col("click_ts")).as("click_us"), col("latency_s"))
  }

  private val streamJoinRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** STREAMING KEYED DEDUP under the oracle gate — watermarked
    * `dropDuplicates` on (user_id, ts)
    * ([[graft.streaming.StreamingOps.dedup]]: keep first seen, state
    * purged past the watermark). Every micro-batch is fed TWICE — once
    * with an intra-batch duplicate of itself, once replayed as the next
    * micro-batch — so suppression is exercised both inside a batch and
    * across the state-store boundary (the at-least-once-delivery
    * reality this operator exists for). The streamed survivors are the
    * DISTINCT keys, which is exactly what the relational oracle
    * computes; emission is immediate on first arrival, so no
    * punctuation is needed. */
  def q108StreamingDedup(spark: SparkSession, dir: String): DataFrame = {
    val root = streamDedupRoots.computeIfAbsent(dir, { d =>
      val r = graft.core.StorePaths.root("strdedup", d)
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val rows = Tables.events(spark, d).select("user_id", "ts")
        .as[(Long, java.sql.Timestamp)].collect().sortBy(_._2.getTime)
      require(rows.nonEmpty, s"no events under $d — cannot drive the streaming replay")
      val midMs = rows(rows.length / 2)._2.getTime
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp)]
      val deduped = graft.streaming.StreamingOps.dedup(
        in.toDF().toDF("user_id", "ts"))
      val q = deduped.writeStream.outputMode("append").format("parquet")
        .option("path", r).option("checkpointLocation", s"${r}_ckpt").start()
      try {
        val (b1, b2) = rows.partition(_._2.getTime <= midMs)
        in.addData(b1.toSeq ++ b1.toSeq); q.processAllAvailable() // intra-batch dups
        in.addData(b1.toSeq); q.processAllAvailable()             // cross-batch replay
        in.addData(b2.toSeq ++ b2.toSeq); q.processAllAvailable()
        in.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      r
    })
    spark.read.parquet(root)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
  }

  private val streamDedupRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  val q108StreamingDedupSql: String =
    """SELECT DISTINCT user_id, epoch_us(ts) AS ts_us FROM events""".stripMargin

  val q107StreamStreamJoinSql: String =
    """WITH imp AS (
      |  SELECT event_id AS imp_id, ts AS imp_ts
      |  FROM events WHERE event_id % 2 = 0
      |),
      |clk AS (
      |  SELECT event_id - 1 AS imp_id, ts AS click_ts
      |  FROM events WHERE event_id % 2 = 1
      |)
      |SELECT i.imp_id,
      |  epoch_us(i.imp_ts) AS imp_us,
      |  epoch_us(c.click_ts) AS click_us,
      |  (epoch_us(c.click_ts) // 1000000 - epoch_us(i.imp_ts) // 1000000)
      |    AS latency_s
      |FROM imp i JOIN clk c ON i.imp_id = c.imp_id
      |WHERE c.click_ts >= i.imp_ts
      |  AND c.click_ts <= i.imp_ts + INTERVAL 10 MINUTE""".stripMargin

  /** CLOSED-FORM OLS TREND — model fitting as pure aggregation (the
    * "ML on the engine" shape): per-user simple linear regression of
    * event value (cents) against day index, solved in closed form
    * from five sufficient statistics (n, Σx, Σy, Σxy, Σx²):
    *
    *   slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)
    *
    * both emitted in exact basis points via the decimal(38) ratio layer
    * (`ExactDecimal.halfUpRatioBig`) — no float summation anywhere, so
    * the result is independent of partition/summation order (a double
    * Σxy would hash-differently per shuffle layout) and hash-exact
    * cross-engine. x is CENTERED per user (day − min day): raw epoch
    * days (~20k) square into Σx² ≈ n·4·10⁸ — at corpus-scale n that
    * overflows even the HUGEINT-widened oracle side, while centered
    * day offsets stay bounded by the observation window. This is the
    * q49-overflow lesson applied at design time. A single-day group
    * (denominator 0) yields slope = intercept = 0 by convention.
    *
    * 100 TB shape: one broadcast join of the per-key min frame + ONE
    * keyed aggregation with map-side combine — sufficient statistics
    * are what make regression distributable; nothing downstream of the
    * agg exceeds one row per user. */
  def q100OlsTrend(spark: SparkSession, dir: String): DataFrame =
    olsTrendFrom(Tables.events(spark, dir).select(
      col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      round(col("value") * 100).cast("long").as("y")))

  /** The regression core of [[q100OlsTrend]] over a (user_id, day, y)
    * frame — separable so the closed form is spec-checkable against
    * hand-computed fixtures (OlsTrendSpec). */
  private[graft] def olsTrendFrom(base: DataFrame): DataFrame = {
    import graft.functions.ExactDecimal
    def big(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val d0 = base.groupBy("user_id").agg(min("day").as("d0"))
    // every sufficient statistic widens to decimal(38) BEFORE the sum:
    // centering bounds x, but y (cents) is unbounded, so Σy/Σxy would
    // overflow a long exactly at the corpus scales the closed form is
    // for — the oracle's integer sums widen to HUGEINT automatically,
    // making a long-typed Spark sum the only silent-wrap site
    val agg = base.join(broadcast(d0), Seq("user_id"))
      .withColumn("x", col("day") - col("d0"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(big(col("x"))).as("sx"), sum(big(col("y"))).as("sy"),
        sum(big(col("x")) * big(col("y"))).as("sxy"),
        sum(big(col("x")) * big(col("x"))).as("sxx"))
    val den = big(col("n")) * big(col("sxx")) - big(col("sx")) * big(col("sx"))
    val slopeNum = (big(col("n")) * big(col("sxy")) - big(col("sx")) * big(col("sy"))) * lit(10000L)
    val interNum = (big(col("sy")) * big(col("sxx")) - big(col("sx")) * big(col("sxy"))) * lit(10000L)
    agg.select(col("user_id"), col("n"),
      when(den === 0, lit(0L))
        .otherwise(ExactDecimal.halfUpRatioBig(slopeNum, den, 0).cast("long"))
        .as("slope_bp"),
      when(den === 0, lit(0L))
        .otherwise(ExactDecimal.halfUpRatioBig(interNum, den, 0).cast("long"))
        .as("intercept_bp"))
  }

  val q100OlsTrendSql: String = {
    import graft.functions.ExactDecimal
    val den = "n::HUGEINT * sxx - sx::HUGEINT * sx"
    val slopeNum = "(n::HUGEINT * sxy - sx::HUGEINT * sy) * 10000"
    val interNum = "(sy::HUGEINT * sxx - sx::HUGEINT * sxy) * 10000"
    s"""WITH base AS (
       |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
       |    round(value * 100)::BIGINT AS y
       |  FROM events
       |),
       |d0 AS (SELECT user_id, min(day) AS d0 FROM base GROUP BY user_id),
       |ag AS (
       |  SELECT b.user_id,
       |    count(*)::BIGINT AS n,
       |    sum(b.day - d0.d0) AS sx,
       |    sum(b.y) AS sy,
       |    sum((b.day - d0.d0)::HUGEINT * b.y) AS sxy,
       |    sum((b.day - d0.d0)::HUGEINT * (b.day - d0.d0)) AS sxx
       |  FROM base b JOIN d0 ON b.user_id = d0.user_id
       |  GROUP BY b.user_id
       |)
       |SELECT user_id, n,
       |  CASE WHEN $den = 0 THEN 0
       |    ELSE (${ExactDecimal.ddbHalfUpRatio(slopeNum, den, 0)})::BIGINT
       |  END AS slope_bp,
       |  CASE WHEN $den = 0 THEN 0
       |    ELSE (${ExactDecimal.ddbHalfUpRatio(interNum, den, 0)})::BIGINT
       |  END AS intercept_bp
       |FROM ag""".stripMargin
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_asof_join" -> (q38AsofJoin _),
    "q39_sessionize" -> (q39Sessionize _),
    "q40_range_join" -> (q40RangeJoin _),
    "q47_funnel" -> (q47Funnel _),
    "q78_interval_merge" -> (q78IntervalMerge _),
    "q96_streaming_bucket_usage" -> (q96StreamingBucketUsage _),
    "q100_ols_trend" -> (q100OlsTrend _),
    "q103_streaming_sessionize" -> (q103StreamingSessionize _),
    "q104_streaming_asof" -> (q104StreamingAsof _),
    "q107_stream_stream_join" -> (q107StreamStreamJoin _),
    "q108_streaming_dedup" -> (q108StreamingDedup _)
  )

  /** Interval coalescing — the interval-union sibling of q39's gap
    * sessionize: each event opens an explicit [ts, ts+5min) interval,
    * and overlapping-or-touching intervals per user merge into one
    * (the classic running-max sweep: an interval starts a new merged
    * group iff its start lies strictly after the max end seen so far).
    * Gap sessionize can't express this — overlap is a property of the
    * interval END, not of inter-event gaps (a long event covers later
    * short ones that a gap rule would split). The building block of
    * contaminated-span coalescing, downtime windows, and coverage maps.
    *
    * All arithmetic in epoch µs (the q39 output convention — both
    * engines truncate the parquet ns identically). 100 TB shape: one
    * keyed window + one keyed aggregation, shuffling on user_id only. */
  def q78IntervalMerge(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir).select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("s_us"),
      (unix_micros(col("ts")) + 300000000L).as("e_us"))
    val w = Window.partitionBy("user_id").orderBy("s_us", "event_id")
    val prevMax = max("e_us").over(w.rowsBetween(Window.unboundedPreceding, -1))
    iv
      .withColumn("is_new",
        when(col("s_us") > coalesce(prevMax, lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("merge_id", sum("is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "merge_id")
      .agg(
        count(lit(1)).as("n_intervals"),
        min("s_us").as("start_us"),
        max("e_us").as("end_us"))
      .withColumn("span_us", col("end_us") - col("start_us"))
  }

  val q78IntervalMergeSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id,
      |    epoch_us(ts) AS s_us, epoch_us(ts) + 300000000 AS e_us
      |  FROM events
      |),
      |flagged AS (
      |  SELECT user_id, event_id, s_us, e_us,
      |    CASE WHEN s_us > coalesce(
      |        max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |        -9223372036854775808)
      |      THEN 1 ELSE 0 END AS is_new
      |  FROM iv
      |),
      |grouped AS (
      |  SELECT user_id, s_us, e_us,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY s_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS merge_id
      |  FROM flagged
      |)
      |SELECT user_id, merge_id,
      |  count(*)::BIGINT AS n_intervals,
      |  min(s_us) AS start_us,
      |  max(e_us) AS end_us,
      |  max(e_us) - min(s_us) AS span_us
      |FROM grouped
      |GROUP BY user_id, merge_id""".stripMargin

  def sql: Map[String, String] = Map(
    "q38_asof_join" -> q38AsofJoinSql,
    "q39_sessionize" -> q39SessionizeSql,
    "q40_range_join" -> q40RangeJoinSql,
    "q47_funnel" -> q47FunnelSql,
    "q78_interval_merge" -> q78IntervalMergeSql,
    "q96_streaming_bucket_usage" -> q96StreamingBucketUsageSql,
    "q100_ols_trend" -> q100OlsTrendSql,
    // stream ≡ batch: the streamed sessions hash against q39's oracle
    "q103_streaming_sessionize" -> q39SessionizeSql,
    // stream ≡ batch: the streamed enrichment hashes against q38's
    // native-ASOF-JOIN oracle
    "q104_streaming_asof" -> q38AsofJoinSql,
    "q107_stream_stream_join" -> q107StreamStreamJoinSql,
    "q108_streaming_dedup" -> q108StreamingDedupSql
  )
}
