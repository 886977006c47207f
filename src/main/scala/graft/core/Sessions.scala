package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard config (SURVEY §7.1).
  *
  * UTC session TZ (oracle parity), AQE on (runtime re-plan / skew-join at
  * scale), shuffle partitions sized to the local core count rather than the
  * 200 default, and the legacy nanos flag so a TIMESTAMP(NANOS) parquet
  * `events.ts` column stays readable (see [[Tables.events]]).
  *
  * `inferTimestampNTZ` is OFF: the testdata parquet carries naive
  * (unannotated) timestamps, and DuckDB — the correctness oracle — reads
  * those as plain TIMESTAMP. With a UTC session TZ, reading them as
  * TimestampType (instant, walltime-as-UTC) is value-identical to the
  * oracle AND keeps `unix_micros`/interval arithmetic applicable, whereas
  * the Spark 4 default would surface TIMESTAMP_NTZ and break both. Doing
  * this at the scan (not a post-read cast) keeps parquet predicate
  * pushdown on timestamp columns intact.
  */
object Sessions {
  /** Hash-mode key budget for `ObjectHashAggregateExec` (every
    * TypedImperativeAggregate here: TopKAgg, the sketches). Spark's
    * default fallback threshold is 128 keys — past it the operator
    * abandons the hash map and EXTERNALLY SORTS the rest of its input
    * by group key. For the ADC candidate rerank that input is the
    * |probes_in_cell|×|cell| join output, so the 128-key default turned
    * the bounded-state top-k into a full candidate-stream sort (the
    * 343 GiB disk spill of the r12 sf10 spill gate, and the staged
    * ~170 GB of the q136 sf100 retry — BASELINE.md). The buffers the
    * hash map holds are small by construction (a TopKBuffer is
    * 2·k·8 B + headers ≈ 400 B at the suite's k; sketch buffers are
    * fixed-size), so the honest memory cap for 512k keys is ~200 MB
    * per task — far cheaper than sorting billions of candidate rows,
    * and still a real fallback guard for a pathological group count
    * (TypedImperativeAggregate buffers are JVM objects the memory
    * manager does not track, which is why the knob exists at all).
    * Per-task group counts in this suite stay ≤ ~tens of thousands:
    * probes spread across cells, so a partial-agg task sees only the
    * probes that probed ITS cells. Env `SPARK_GRAFT_OHA_FALLBACK`
    * overrides for A/B measurement.
    *
    * Scope note: the raised threshold is session-wide, so it also
    * governs collect_list / sketch / `first(embedding)` ride-along
    * ObjectHashAggregates whose buffers are likewise untracked JVM
    * memory (~0.5 KB per group for an embedding `first`, ≈ +270 MB at
    * the cap on the assign path). Measured green under the 4×4 GiB
    * spill gate (PARITY_spill_sf10_v3); if a future query family adds a
    * genuinely large-state object aggregate (multi-KB buffers ×
    * high group counts), scope the raise to the ANN paths with a
    * `withSQLConf`-style wrapper instead of the session default. */
  val ObjectAggFallbackKeys: Int = 524288

  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK", ObjectAggFallbackKeys.toString))
      // AQE coalescing floor left at its 1 MB default: an r15 A/B with a
      // 64 KB session-wide floor sped the single-task-rerank queries up
      // (q141 −59%) but taxed every many-tiny-stage query with extra
      // task overhead (q74/q119/q137 +19–39%) — the compute-dense
      // stages are instead widened LOCALLY with an explicit keyed
      // repartition (see IncrementalIvfPq.adcTopK). Env override kept
      // for A/B (SPARK_GRAFT_MIN_COALESCE, bytes).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "1048576"))
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores.toString).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Corpus-derived shuffle width: `ceil(inputBytes / 256 MiB)`, floored
    * at `cores` — the `bucketsFor(N)`/`kFor(N)` sizing pattern applied to
    * the one knob that was still a fixed pin. A fixed `cores`-wide
    * shuffle is correct while per-partition working sets fit one task
    * (true through sf10 here), but at sf100 it put >100M-row working
    * sets on single tasks (BASELINE.md "maintained-ANN at sf100" — the
    * q127/q136 failure mechanism), which a data-scaled width dissolves
    * (the q136 retry measurement). 256 MiB per post-shuffle partition is
    * the classic budget (same constant as
    * `spark.sql.files.maxPartitionBytes`'s spirit); AQE coalescing
    * shrinks over-wide small stages back down at runtime, so a generous
    * width costs little. At the gate SFs (≤ sf0.1, ≤ 20 MB on disk) the
    * data term is 1 and the floor wins — the width IS the pinned core
    * count, so every oracle/parity hash is byte-identical to the pinned
    * layout. Capped at 65536 (the shuffle-partition practical ceiling;
    * 16 TiB input before the cap binds). */
  def partitionsFor(inputBytes: Long, cores: Int): Int = {
    val target = 256L << 20
    val byData = ((inputBytes + target - 1) / target).min(65536L).max(1L).toInt
    math.max(cores, byData)
  }

  /** Apply the derived width to a live session from the data dir's actual
    * on-disk footprint (recursive parquet bytes). Precedence:
    * `SPARK_GRAFT_SHUFFLE` pins the width outright (the explicit-retry
    * recipe); otherwise the width is `max(cores, derived)` so an operator
    * never runs NARROWER than the core count it was given. Returns the
    * width applied. Runtime `conf.set` is sufficient — shuffle width is
    * a per-query planning config, not a session-construction one. */
  def deriveShuffle(spark: SparkSession, dataDir: String, cores: Int): Int = {
    val w = sys.env.get("SPARK_GRAFT_SHUFFLE").map(_.toInt).getOrElse(
      partitionsFor(graft.operators.Compaction.treeBytes(spark, dataDir), cores))
    spark.conf.set("spark.sql.shuffle.partitions", w.toString)
    w
  }
}
