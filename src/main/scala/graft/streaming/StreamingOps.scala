package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming upgrades of the reference's batch patterns
  * (SURVEY §2.9 — the reference itself has no streaming; these are the
  * extensions it points at):
  *
  *  - the manual incremental Drive sync (micro-batching by hand with an
  *    id-set) → a file-source stream with checkpointed state;
  *  - overlapping daily sensor exports (late/duplicate rows handled by
  *    the full-outer merge) → watermark + `dropDuplicates`;
  *  - the 15-minute downsample → watermarked tumbling-window aggregation;
  *  - block grouping (P4) → `flatMapGroupsWithState` sessionization.
  *
  * All transforms are source-agnostic: they take a streaming DataFrame
  * (rate, file, kafka, or MemoryStream in tests) with the event schema
  * `(ts TIMESTAMP, user_id LONG, value DOUBLE)`-ish and return a
  * streaming result. At scale each is a keyed stateful operator whose
  * state is bounded by the watermark — no unbounded driver state.
  */
/** Session record emitted by [[StreamingOps.sessionize]]. Top-level: the
  * Dataset encoder's generated code instantiates these reflectively. */
case class Session(user_id: Long, n_events: Long, value_sum: Double,
                   start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

case class SessionState(n: Long, total: Double, startMs: Long, lastMs: Long)

/** Closed session emitted by [[StreamingOps.sessionizeExact]] — the exact
  * (all-integer) schema of the batch sessionize aggregate (q39), so the
  * streamed result can hash-compare against the same oracle. */
case class SessionRow(user_id: Long, session_id: Long, n_events: Long,
                      value_cents: Long, start_us: Long, end_us: Long)

/** Open-session state for [[StreamingOps.sessionizeExact]]: the per-user
  * session ordinal plus the running aggregate of the open session. */
case class ExactSessionState(sid: Long, n: Long, cents: Long,
                             startUs: Long, lastUs: Long)

/** Enriched reading emitted by [[StreamingOps.asofEnrichExact]] — q38's
  * exact output schema (epoch-µs reading time), oracle-comparable. */
case class AsofRowExact(user_id: Long, event_id: Long, r_us: Long,
                        asof_value: Option[Double])

/** Latest-mark state for [[StreamingOps.asofEnrichExact]] (epoch µs). */
case class MarkStateUs(tsUs: Long, value: Double)

/** Input event for [[StreamingOps.asofEnrich]] (top-level for encoders):
  * a mark (is_mark=true) updates per-key state; a reading is emitted
  * enriched with the latest at-or-before mark value. */
case class AsofEvent(user_id: Long, ts: java.sql.Timestamp, is_mark: Boolean, value: Double)

/** Enriched reading from [[StreamingOps.asofEnrich]]. */
case class AsofOut(user_id: Long, ts: java.sql.Timestamp, value: Double,
                   asof_value: Option[Double])

/** Latest-mark state for [[StreamingOps.asofEnrich]]. */
case class MarkState(tsMs: Long, value: Double)

object StreamingOps {

  /** Watermarked tumbling 15-minute usage per user — the streaming form
    * of the electricity bucket aggregation. Late rows beyond 30 minutes
    * are dropped; state is purged as the watermark passes each window. */
  def bucketUsage(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "15 minutes").as("bucket"), col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum("value").as("value_sum"))
      .select(col("bucket.start").as("bucket_start"), col("user_id"), col("n"), col("value_sum"))

  /** Cents-exact watermarked 15-minute usage — [[bucketUsage]]'s
    * oracle-comparable sibling (integer counts + cent sums, so the
    * streamed result hash-compares against the relational oracle with no
    * fp drift). This is the ONE aggregation body behind both the
    * MemoryStream-driven q96 and the file-source-driven q112 — the two
    * oracle queries prove the same plan from two different sources. */
  def bucketUsageCents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(graft.functions.ExactDecimal.cents(col("value"))).as("value_cents"))
      .select(col("w.start").as("bucket_start"), col("user_id"),
        col("n"), col("value_cents"))

  /** Watermarked exact dedup on (user_id, ts) — the streaming form of the
    * sensor merge's duplicate-timestamp rule (keep first seen; state
    * bounded by the watermark). */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicates(Seq("user_id", "ts"))

  /** Windowed token frequencies — the streaming form of q62's heavy
    * hitters: explode tokens (the same stateless [[graft.functions
    * .TextFns.tokens]] expression as batch), then a watermarked tumbling
    * hourly count per token. State is one counter per (window, live
    * token), purged as the watermark passes each window; top-k selection
    * stays at the consumer (a global streaming sort would force complete
    * mode — unbounded result state). Per-window counts equal the batch
    * explode+groupBy on the same rows (StreamingOpsSpec parity). */
  def tokenFreqStream(docs: DataFrame): DataFrame =
    docs
      .withWatermark("ts", "30 minutes")
      .select(col("ts"), explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("token"))
      .agg(count(lit(1)).as("freq"))
      .select(col("w.start").as("window_start"), col("token"), col("freq"))

  /** Streaming corpus-prep front-end: the SAME stateless quality/lang
    * columns as batch q54 ([[graft.queries.CorpusPrepQueries
    * .scoreAndLang]] — pure column expressions apply to a streaming
    * frame unchanged), then content-hash dedup keeping the FIRST
    * arrival, state bounded by the watermark
    * (`dropDuplicatesWithinWatermark`: the hash key carries no event
    * time, so plain dropDuplicates would hold state forever). Batch q54
    * keeps the MIN doc_id per hash; when arrival order follows doc_id
    * the survivor sets coincide — StreamBatchParitySpec asserts it. */
  def corpusPrepStream(docs: DataFrame, threshold: Double = 0.7): DataFrame =
    graft.queries.CorpusPrepQueries.scoreAndLang(docs)
      .filter(col("quality_score") >= threshold)
      .withColumn("text_hash", sha2(lower(trim(col("text"))), 256))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("text_hash"))
      .select("doc_id", "pred_lang", "quality_score", "text_hash")

  /** Stream-stream inner join with event-time bounds — the attribution
    * shape (each click joins its impression within a 10-minute window).
    * The time-range predicate is what makes unbounded-stream joins
    * executable: watermarks on BOTH sides plus the bound let Spark drop
    * buffered impressions once no qualifying click can still arrive, so
    * state is O(window), not O(stream). Batch parity asserted in
    * StreamingOpsSpec. */
  def windowedStreamJoin(impressions: DataFrame, clicks: DataFrame): DataFrame =
    impressions.withWatermark("imp_ts", "10 minutes")
      .join(
        clicks.withWatermark("click_ts", "10 minutes"),
        expr("""imp_id = click_imp_id AND
                click_ts >= imp_ts AND
                click_ts <= imp_ts + interval 10 minutes"""))
      .select(col("imp_id"), col("imp_ts"), col("click_ts"),
        (unix_timestamp(col("click_ts")) - unix_timestamp(col("imp_ts"))).as("latency_s"))

  /** Gap-based sessionization via `flatMapGroupsWithState` — the custom-
    * state operator of SURVEY §2.9's extension list. A session closes
    * when no event arrives for `gapMinutes` (processing-time timeout —
    * deterministic enough for tests via explicit close on timeout). */
  def sessionize(events: Dataset[(Long, java.sql.Timestamp, Double)],
                 gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.n, s.total,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs)))
          } else {
            val evs = rows.toSeq.sortBy(_._2.getTime)
            val gapMs = gapMinutes.toLong * 60000L
            var cur = state.getOption
            val closed = scala.collection.mutable.ListBuffer.empty[Session]
            evs.foreach { case (_, ts, v) =>
              val t = ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(n = s.n + 1, total = s.total + v, lastMs = math.max(s.lastMs, t)))
                case Some(s) =>
                  closed += Session(userId, s.n, s.total,
                    new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs))
                  cur = Some(SessionState(1, v, t, t))
                case None =>
                  cur = Some(SessionState(1, v, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(s"$gapMinutes minutes")
            }
            closed.iterator
          }
      }
  }

  /** EXACT gap sessionization — the oracle-comparable sibling of
    * [[sessionize]]: all-integer arithmetic (epoch-µs timestamps, cent
    * values), the batch operator's exact gap rule (`gap > gapUs` opens a
    * session) and tie order ((ts_us, event_id) within a micro-batch),
    * and a per-user session ORDINAL carried in state — so a stream
    * delivered in event-time order emits byte-identical rows to the
    * batch q39 aggregate. A session closes when a later event breaks the
    * gap; the caller flushes the final open sessions with one
    * punctuation event per user past the gap (the punctuation's own
    * session stays open in state and is never emitted, so no sentinel
    * filtering is needed downstream).
    *
    * Input: (user_id, ts_us, event_id, cents). State per user is ONE
    * open session + a counter — O(users), not O(events). */
  def sessionizeExact(events: Dataset[(Long, Long, Long, Long)],
                      gapUs: Long): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[ExactSessionState, SessionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[ExactSessionState]) =>
          val evs = rows.toSeq.sortBy(t => (t._2, t._3))
          var cur = state.getOption
          val closed = scala.collection.mutable.ListBuffer.empty[SessionRow]
          evs.foreach { case (_, tsUs, _, cents) =>
            cur match {
              case Some(s) if tsUs - s.lastUs <= gapUs =>
                cur = Some(s.copy(n = s.n + 1, cents = s.cents + cents,
                  lastUs = math.max(s.lastUs, tsUs)))
              case Some(s) =>
                closed += SessionRow(userId, s.sid, s.n, s.cents, s.startUs, s.lastUs)
                cur = Some(ExactSessionState(s.sid + 1, 1, cents, tsUs, tsUs))
              case None =>
                cur = Some(ExactSessionState(1, 1, cents, tsUs, tsUs))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** EXACT streaming as-of enrichment — the oracle-comparable sibling of
    * [[asofEnrich]] (which works at Timestamp-ms granularity — fine for
    * its parity spec, but the batch operator and DuckDB's native ASOF
    * JOIN compare at µs, so ms rounding could flip a boundary match):
    * epoch-µs timestamps throughout, marks processed BEFORE readings at
    * an equal instant (the `r.ts >= m.ts` inclusive-boundary rule), and
    * the caller pre-dedupes marks per (user, ts) exactly as the batch
    * query does, so no mark-tie ambiguity exists. A stream delivered in
    * event-time order then emits byte-identical rows to batch q38.
    *
    * Input: (user_id, ts_us, event_id, is_mark, value). State per user
    * is ONE latest mark — O(users). */
  def asofEnrichExact(events: Dataset[(Long, Long, Long, Boolean, Double)])
  : Dataset[AsofRowExact] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[MarkStateUs, AsofRowExact](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[MarkStateUs]) =>
          var cur = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[AsofRowExact]
          // marks first at an equal µs instant: !is_mark sorts false<true
          rows.toSeq.sortBy(e => (e._2, !e._4, e._3)).foreach {
            case (_, tsUs, eventId, isMark, value) =>
              if (isMark) {
                if (cur.forall(_.tsUs <= tsUs)) cur = Some(MarkStateUs(tsUs, value))
              } else {
                out += AsofRowExact(userId, eventId, tsUs,
                  cur.filter(_.tsUs <= tsUs).map(_.value))
              }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming as-of enrichment — the streaming twin of
    * [[graft.operators.TemporalOps.asofJoin]]: per-key state holds the
    * latest mark; each reading emits with the most recent at-or-before
    * mark value. Within a micro-batch events are processed in event-time
    * order (marks before readings at equal ts, like the batch
    * operator); across batches the mark state persists, so a stream
    * delivered in event-time order reproduces the batch join exactly
    * (parity-tested). A mark older than the held state is ignored —
    * out-of-order marks beyond a batch boundary are the documented
    * approximation (bound it upstream with a watermark + sorted source,
    * e.g. a compacted changelog topic). */
  def asofEnrich(events: Dataset[AsofEvent]): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MarkState, AsofOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[MarkState]) =>
          var cur = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[AsofOut]
          rows.toSeq
            .sortBy(e => (e.ts.getTime, !e.is_mark, e.value))
            .foreach { e =>
              if (e.is_mark) {
                if (cur.forall(_.tsMs <= e.ts.getTime))
                  cur = Some(MarkState(e.ts.getTime, e.value))
              } else {
                out += AsofOut(userId, e.ts, e.value,
                  cur.filter(_.tsMs <= e.ts.getTime).map(_.value))
              }
            }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Checkpointed streaming upsert of the EAV cache — the full streaming
    * twin of [[graft.pipelines.FileStoreSync.sync]]: the file source's
    * checkpoint IS the processed-file id-set (restarts resume, already-
    * read files never re-parse), and each micro-batch appends only rows
    * whose source file is not yet in the cache (idempotent against batch
    * replay after a sink-side failure). */
  def syncStream(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                 cachePath: String, checkpoint: String): Unit = {
    val q = weightTxtStream(spark, storeDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val existing =
          if (new java.io.File(cachePath).exists())
            batch.sparkSession.read.parquet(cachePath)
              .select(col("source_file_id")).distinct()
          else batch.sparkSession.emptyDataFrame.withColumn("source_file_id", lit(""))
            .limit(0)
        batch.join(existing, Seq("source_file_id"), "left_anti")
          .write.mode("append").parquet(cachePath)
        ()
      }
      .start()
    q.awaitTermination(120000)
    ()
  }

  /** Incremental file-source stream of weight TXT EAV rows — the
    * streaming form of [[graft.pipelines.FileStoreSync]]: Spark's file
    * source tracks processed files in the checkpoint (the reference's
    * id-set), `Trigger.AvailableNow` gives the same catch-up-then-stop
    * batch semantics. */
  def weightTxtStream(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream
      .option("wholetext", "true")
      .option("maxFilesPerTrigger", "16")
      .text(dir)
      .select(input_file_name().as("path"), col("value").as("content"))
      .as[(String, String)]
      .flatMap { case (path, content) =>
        val fileId = path.substring(path.lastIndexOf('/') + 1)
        graft.sources.WeightTxt.parseContent(content, fileId)
      }
      .toDF()
  }
}
