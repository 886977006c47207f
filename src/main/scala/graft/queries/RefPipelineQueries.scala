package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipelines._
import graft.sources.WeightTxt

/** The reference pipelines (P1-P5) surfaced through the driver contract.
  *
  * These run on the reference's own fixtures (or inline/synthetic data),
  * not the sfDir tables. Every one now carries a DuckDB oracle: p2/p3
  * read the same reference files from SQL; p1 inlines its EAV rows as
  * VALUES; p4/p5 stage their non-SQL decode outputs as parquet during
  * the Spark run and oracle the relational tail (the decode stages are
  * covered by golden/differential specs — JobReportPipelineSpec,
  * MediaCodecSpec's javax.imageio diff, WeightTxtSpec).
  */
object RefPipelineQueries {

  /** P1: weight TXT → EAV → pivot → weekly resample with period change.
    * `period_end` is cast to timestamp to mirror the reference's pandas
    * datetime64 resample index (and the q21/q22 oracle convention). */
  def p1Weight(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def file(date: String, w: String, bmi: String) =
      s"hdr\nTime:08:00, Mon,$date\nWeight:${w}kg ↑ Overweight\nBMI:$bmi ↑\nBMR:1800kcal"
    val eav = (WeightTxt.parseContent(file("2025-11-24", "91.0", "27.4"), "a.txt") ++
      WeightTxt.parseContent(file("2025-12-01", "90.4", "27.3"), "b.txt") ++
      WeightTxt.parseContent(file("2025-12-08", "89.9", "27.1"), "c.txt")).toDF()
    WeightPipeline.weeklyResample(WeightPipeline.pivoted(eav))
      .withColumn("period_end", col("period_end").cast("timestamp"))
  }

  /** DuckDB twin of p1: the same EAV rows as VALUES (the TXT parse itself
    * is not SQL-expressible — it is covered by WeightTxtSpec), then the
    * identical pivot → weekly-resample → desc period-change chain. */
  val p1WeightSql: String =
    """WITH eav(date_time, attribute, value) AS (VALUES
      |  (TIMESTAMP '2025-11-24 08:00:00', 'Weight', '91.0'),
      |  (TIMESTAMP '2025-11-24 08:00:00', 'BMI', '27.4'),
      |  (TIMESTAMP '2025-11-24 08:00:00', 'BMR', '1800'),
      |  (TIMESTAMP '2025-12-01 08:00:00', 'Weight', '90.4'),
      |  (TIMESTAMP '2025-12-01 08:00:00', 'BMI', '27.3'),
      |  (TIMESTAMP '2025-12-01 08:00:00', 'BMR', '1800'),
      |  (TIMESTAMP '2025-12-08 08:00:00', 'Weight', '89.9'),
      |  (TIMESTAMP '2025-12-08 08:00:00', 'BMI', '27.1'),
      |  (TIMESTAMP '2025-12-08 08:00:00', 'BMR', '1800')),
      |wide AS (
      |  SELECT date_time,
      |    max(CASE WHEN attribute = 'Weight' THEN value END)::DOUBLE AS weight,
      |    max(CASE WHEN attribute = 'BMI' THEN value END)::DOUBLE AS bmi
      |  FROM eav GROUP BY date_time),
      |weekly AS (
      |  SELECT (date_time::DATE + INTERVAL 1 DAY * ((7 - dayofweek(date_time::DATE)) % 7))::TIMESTAMP AS period_end,
      |    round(avg(weight), 1) AS average_weight,
      |    round(avg(bmi), 1) AS average_bmi
      |  FROM wide GROUP BY 1)
      |SELECT period_end, average_weight, average_bmi,
      |  round(average_weight - lead(average_weight) OVER (ORDER BY period_end DESC), 1) AS weight_change
      |FROM weekly""".stripMargin

  /** P2: one real sensor's exports merged into the wide series.
    *
    * Default path is the single-shuffle [[SensorMergePipeline.mergeAllUnioned]]
    * (the 100 TB shape — one union + one hash-aggregate instead of
    * `files−1` sequential full-outer shuffle joins; the fold was the
    * slowest, most eviction-sensitive line in the r7 sweep at 7.3 s
    * median / 11.4 s spread vs 1.7 s for this plan). The sequential fold
    * remains the semantics baseline: select it with
    * `-Dgraft.p2.path=fold`, and the fold≡union property spec in
    * SensorMergePipelineSpec proves the two equal column-for-column
    * including conflict materialization. */
  def p2SensorMerge(spark: SparkSession, dir: String): DataFrame = {
    val groups = SensorMergePipeline.discover("/root/reference/data")
    val (_, paths) = groups.minBy(_._1)
    if (sys.props.get("graft.p2.path").contains("fold"))
      SensorMergePipeline.finalize(SensorMergePipeline.mergeSensor(spark, paths).get)
    else {
      val frames = paths.flatMap(p => SensorMergePipeline.readNormalized(spark, p))
      SensorMergePipeline.finalize(SensorMergePipeline.mergeAllUnioned(frames))
    }
  }

  /** DuckDB twin of p2, generated from the same `discover` listing so the
    * file set and fold order stay in sync with the Spark side. Each file
    * is normalized (skip BOM header, try-parse timestamps, TRY_CAST
    * doubles — the reference's `pd.to_numeric(errors='coerce')`), then
    * folded left-to-right through full-outer joins with coalesce fill,
    * exactly mirroring `mergeStepProvisional`. The provisional conflict
    * columns are omitted: on this fixture the seven exports are pairwise
    * disjoint in `Timestamp` (verified — 10041 unique stamps, 0 overlap
    * rows), so every conflict column is all-null and `finalize` drops it;
    * the conflict path itself is oracle-proven by q35. Output column
    * names replicate the reference headers byte-for-byte (leading space,
    * U+00A0 non-breaking spaces). */
  // lazy: runs `discover` on the reference data dir — if that fixture is
  // absent, a strict val would turn ANY touch of this object into an
  // ExceptionInInitializerError; lazy degrades it to a per-query failure
  // that Verify's try/catch can report individually.
  lazy val p2SensorMergeSql: String = {
    val paths = SensorMergePipeline.discover("/root/reference/data").minBy(_._1)._2
    val tryTs = (c: String) => Seq("%Y-%m-%d %H:%M:%S", "%Y/%m/%d %H:%M:%S", "%d/%m/%Y %H:%M:%S")
      .map(f => s"try_strptime($c, '$f')").mkString("coalesce(", ", ", ")")
    val reads = paths.zipWithIndex.map { case (p, i) =>
      s"""f$i AS (
         |  SELECT ts, t, h FROM (
         |    SELECT ${tryTs("c0")} AS ts, TRY_CAST(c1 AS DOUBLE) AS t, TRY_CAST(c2 AS DOUBLE) AS h
         |    FROM read_csv('$p', header = false, skip = 1,
         |                  columns = {'c0': 'VARCHAR', 'c1': 'VARCHAR', 'c2': 'VARCHAR'}))
         |  WHERE ts IS NOT NULL)""".stripMargin
    }
    val folds = (1 until paths.length).map { i =>
      s"""m$i AS (
         |  SELECT coalesce(a.ts, b.ts) AS ts, coalesce(a.t, b.t) AS t, coalesce(a.h, b.h) AS h
         |  FROM m${i - 1} a FULL JOIN f$i b ON a.ts = b.ts)""".stripMargin
    }
    val nbsp = "\u00a0" // reference headers use non-breaking spaces
    val tempName = s" Temperature_Celsius(calibrated$nbsp+0.3${nbsp}deg${nbsp}C)"
    val humName = s"Relative_Humidity(calibrated$nbsp-2.2%)"
    (Seq(reads.mkString("WITH ", ",\n", ","), "m0 AS (SELECT * FROM f0),") ++
      Seq(folds.mkString("", ",\n", "")) :+
      s"""SELECT ts AS "Timestamp", t AS "$tempName", h AS "$humName"
         |FROM m${paths.length - 1}""".stripMargin).mkString("\n")
  }

  /** q51: the 100 TB-shape sensor merge — `mergeAllUnioned` (ONE shuffle,
    * full conflict semantics) on the same files as p2, driver-proven
    * against the SAME DuckDB oracle as the sequential fold. Together with
    * the fold≡union property spec this pins the scale path to the
    * reference semantics end-to-end. */
  def q51SensorMergeUnioned(spark: SparkSession, dir: String): DataFrame = {
    val paths = SensorMergePipeline.discover("/root/reference/data").minBy(_._1)._2
    val frames = paths.flatMap(p => SensorMergePipeline.readNormalized(spark, p))
    SensorMergePipeline.finalize(SensorMergePipeline.mergeAllUnioned(frames))
  }

  /** P3: the electricity chain on the reference CSV → 15-minute usage. */
  def p3Electricity(spark: SparkSession, dir: String): DataFrame =
    ElectricityPipeline.run(spark,
      "/root/reference/utils/For Pandas and Polars --- Electricity.csv")

  /** DuckDB twin of p3 — the reference's own 10-stage CTE chain (ref:
    * utils/duckdb_electricity_1-minute.py:5-173) reading the same CSV,
    * re-expressed without the `INTERVAL * expr` forms that trip the
    * installed DuckDB binder (date-minus-int for the last-Sunday step,
    * `time_bucket` for the 15-minute floor — both proven idioms from the
    * q15/q17/q34 oracles). Output aliased to the Spark column names. */
  val p3ElectricitySql: String =
    """WITH raw AS (
      |  SELECT strptime(Date || ' ' || Time, '%d/%m/%Y %H:%M:%S') AS ldt, P, OP
      |  FROM read_csv('/root/reference/utils/For Pandas and Polars --- Electricity.csv',
      |                header = true,
      |                columns = {'Date': 'VARCHAR', 'Time': 'VARCHAR', 'P': 'DOUBLE', 'OP': 'DOUBLE'})),
      |years AS (SELECT DISTINCT year(ldt) AS yr FROM raw),
      |bst AS (
      |  SELECT yr,
      |    ((make_date(yr, 4, 1) - 1) - (dayofweek(make_date(yr, 4, 1) - 1))::INT)::TIMESTAMP
      |      + INTERVAL 1 HOUR AS bst_start,
      |    ((make_date(yr, 11, 1) - 1) - (dayofweek(make_date(yr, 11, 1) - 1))::INT)::TIMESTAMP
      |      + INTERVAL 2 HOUR AS bst_end
      |  FROM years),
      |utc AS (
      |  SELECT CASE WHEN r.ldt >= b.bst_start AND r.ldt < b.bst_end
      |              THEN r.ldt - INTERVAL 1 HOUR ELSE r.ldt END AS utc_dt, r.P, r.OP
      |  FROM raw r JOIN bst b ON year(r.ldt) = b.yr),
      |deltas AS (
      |  SELECT utc_dt,
      |    lead(utc_dt) OVER w AS next_dt,
      |    lead(P) OVER w - P AS dp,
      |    lead(OP) OVER w - OP AS dop
      |  FROM utc WINDOW w AS (ORDER BY utc_dt)),
      |grid AS (
      |  SELECT utc_dt, dp, dop,
      |    unnest(generate_series(utc_dt + INTERVAL 1 MINUTE, next_dt, INTERVAL 1 MINUTE)) AS m
      |  FROM deltas WHERE next_dt IS NOT NULL),
      |cat AS (
      |  SELECT *, CASE WHEN m::TIME > TIME '06:30:00' AND m::TIME <= TIME '23:30:00'
      |                 THEN 'P' ELSE 'OP' END AS category
      |  FROM grid),
      |counted AS (
      |  SELECT *,
      |    sum(CASE WHEN category = 'P' THEN 1 ELSE 0 END) OVER (PARTITION BY utc_dt) AS pmins,
      |    sum(CASE WHEN category = 'OP' THEN 1 ELSE 0 END) OVER (PARTITION BY utc_dt) AS opmins
      |  FROM cat),
      |per_interval AS (
      |  SELECT time_bucket(INTERVAL '15 minutes', m - INTERVAL 1 MINUTE) AS bucket, utc_dt,
      |    min(m) AS fm, max(m) AS lm, count(*) AS mins,
      |    sum(CASE WHEN category = 'P' THEN 1 ELSE 0 END) AS cnt_p,
      |    sum(CASE WHEN category = 'OP' THEN 1 ELSE 0 END) AS cnt_op,
      |    any_value(dp) AS dp, any_value(dop) AS dop,
      |    any_value(pmins) AS pmins, any_value(opmins) AS opmins
      |  FROM counted GROUP BY 1, 2),
      |subs AS (
      |  SELECT bucket, utc_dt, fm, lm, mins,
      |    CASE WHEN cnt_p > 0 AND pmins > 0
      |         THEN dp * cnt_p::DOUBLE / pmins::DOUBLE END AS p_sub,
      |    CASE WHEN cnt_op > 0 AND opmins > 0
      |         THEN dop * cnt_op::DOUBLE / opmins::DOUBLE END AS op_sub
      |  FROM per_interval)
      |SELECT bucket AS "Bucket",
      |  min(fm) AS "First_Minute",
      |  max(lm) AS "Last_Minute",
      |  sum(mins)::BIGINT AS "Minutes",
      |  CASE WHEN count(p_sub) > 0 THEN list_reduce(
      |    list_prepend(0.0::DOUBLE, list(p_sub ORDER BY utc_dt) FILTER (WHERE p_sub IS NOT NULL)),
      |    (a, b) -> a + b) END AS "P_Usage",
      |  CASE WHEN count(op_sub) > 0 THEN list_reduce(
      |    list_prepend(0.0::DOUBLE, list(op_sub ORDER BY utc_dt) FILTER (WHERE op_sub IS NOT NULL)),
      |    (a, b) -> a + b) END AS "OP_Usage"
      |FROM subs
      |GROUP BY 1""".stripMargin

  /** P4: the MHTML job snapshots → deduped, grouped activity table.
    *
    * Oracle strategy (same as p1's VALUES staging): the MIME walk +
    * HTML→text decode is not SQL-expressible — it is covered by
    * JobReportPipelineSpec's golden tests — so the parsed blocks are
    * STAGED as parquet and both engines compute the relational tail
    * (cutoff → first-seen dedup → group → desc-sorted snapshots) from
    * the identical staged bytes. Snapshots are serialized with control-
    * char separators (not to_json: cross-engine JSON formatting is not
    * byte-stable) so the driver's pandas hash can compare them. */
  def p4JobReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stage = P4Stage
    stageOnce(stage) {
      JobReportPipeline.readBlocks(spark, "/root/reference/utils/job_search_mhtml")
        .toDF().coalesce(1).write.mode("overwrite").parquet(stage)
    }
    val blocks = spark.read.parquet(stage)
      .as[graft.pipelines.JobBlock]
    JobReportPipeline.grouped(blocks, cutoff = "2020-01-01")
      .select(
        col("job"),
        col("n_snapshots"),
        col("latest_date").cast("timestamp").as("latest_date"),
        array_join(
          transform(col("snapshots"), s => concat_ws("|",
            s("block_date").cast("string"), s("file_label"), s("status"),
            array_join(s("lines"), "\u001f"))),
          "\u001e").as("snapshots"))
  }

  // pid-isolated like every other snapshot store (StorePaths): a second
  // concurrent JVM must not overwrite the stage while this process's
  // oracle SQL (which interpolates the path) is mid-read
  private val P4Stage = graft.core.StorePaths.root("stage", "p4_blocks")

  /** Write-once guard for the decode-output stages (p4 blocks, p5/q90
    * features): the staged bytes are pure functions of fixed inputs
    * (reference fixtures / the deterministic synthetic lake), so one
    * write per process serves every later run — bench reps and the
    * multiple consumers read the tiny parquet instead of re-decoding.
    * Same snapshot-store discipline as the edge/centroid stores.
    * `computeIfAbsent` (not a Set.add guard) for the same reasons those
    * stores use it: a failed first write does NOT record the key (the
    * next caller retries instead of reading a missing/partial stage),
    * and concurrent callers block until the in-flight write finishes. */
  private val stagedOnce = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stageOnce(path: String)(write: => Unit): Unit = {
    stagedOnce.computeIfAbsent(path, { _ => write; path })
    ()
  }

  /** DuckDB twin of p4's relational tail over the staged blocks. The
    * snapshot sort is (block_date, file_label, status, lines) DESC —
    * Spark's reverse(sort_array(struct(...))); full ties are impossible
    * (lines are unique after dedup) and both engines compare lists
    * element-wise with binary string order. */
  val p4JobReportSql: String =
    s"""WITH b AS (
       |  SELECT block_date, file_label, status, lines,
       |    row_number() OVER (PARTITION BY lines ORDER BY file_label, block_date) AS rn
       |  FROM read_parquet('$P4Stage/*.parquet')
       |  WHERE block_date >= DATE '2020-01-01'
       |),
       |d AS (SELECT lines[1] AS job, block_date, file_label, status, lines FROM b WHERE rn = 1)
       |SELECT job,
       |  count(*)::BIGINT AS n_snapshots,
       |  max(block_date)::TIMESTAMP AS latest_date,
       |  string_agg(
       |    block_date::VARCHAR || '|' || file_label || '|' || status || '|' ||
       |      array_to_string(lines, chr(31)),
       |    chr(30)
       |    ORDER BY block_date DESC, file_label DESC, status DESC, lines DESC) AS snapshots
       |FROM d
       |GROUP BY job""".stripMargin

  /** P5/multimodal: synthetic media → distributed feature extraction →
    * LSH buckets.
    *
    * Oracle strategy mirrors p4: the codec stage (PNG/WAV decode →
    * histogram features) is not SQL-expressible — it is differentially
    * verified against javax.imageio in MediaCodecSpec — so the extracted
    * features are STAGED as parquet and both engines compute the
    * similarity tail from identical bytes: the RHP-LSH bucket (same LCG
    * arithmetic as the q32 oracle) and a quantized feature signature
    * (round(x·10⁴) — float→double is exact, IEEE multiply + half-away
    * rounding agree cross-engine; raw float formatting would not). */
  def p5MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = spark.read.parquet(stagedMediaFeatures(spark))
    graft.multimodal.MediaOps.featureBuckets(feats)
      .select(col("media_id"), col("kind"), col("n_bytes"), col("bucket"),
        array_join(
          transform(col("features"),
            x => round(x.cast("double") * 10000).cast("long").cast("string")),
          ",").as("feat_q"))
  }

  private val P5Stage = graft.core.StorePaths.root("stage", "p5_features")

  /** The shared media-feature stage: deterministic synthetic lake →
    * decode → features, written once per process ([[stageOnce]] makes
    * the write order-independent, so p5 and q90 share one stage instead
    * of each decoding its own identical copy). */
  private def stagedMediaFeatures(spark: SparkSession): String = {
    stageOnce(P5Stage) {
      graft.multimodal.MediaOps.imageFeatures(
        graft.multimodal.MediaOps.syntheticMedia(spark, 2000))
        // the feature stage is corpus-sized at target scale (one row per
        // media object) — no single-task write funnel; media_id-range
        // layout keeps downstream bucket joins id-local
        .repartitionByRange(
          spark.sessionState.conf.numShufflePartitions, col("media_id"))
        .write.mode("overwrite").parquet(P5Stage)
    }
    P5Stage
  }

  /** q90: multimodal near-dup dedup — closes p5's feature→bucket loop
    * into a full dedup operator ([[graft.multimodal.MediaOps
    * .nearDupComponents]]): bucket equi-join → L1-threshold pairs → star
    * closure, the image/audio analogue of q53. Reads the shared
    * [[stagedMediaFeatures]] stage and oracles the full relational tail
    * including the closure.
    *
    * Pairs are same-kind with per-kind thresholds: image/video
    * histograms at 0.004 (mid-gap: largest same-kind L1 gap 0.00222 →
    * 0.00573, image floor for distinct content 0.0176), audio RMS-energy
    * envelopes at 0.001 (retake pairs measured ≤ 6.7e-4, distinct-signal
    * floor 1.46e-3 — the fixture lake carries genuine audio retake
    * pairs, see [[graft.multimodal.MediaOps.syntheticMedia]]). Both
    * engines fold L1 in index order over float→double-exact values, so
    * the comparison is bit-identical regardless of margin. */
  def q90MediaNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.MediaOps.nearDupComponents(
      spark.read.parquet(stagedMediaFeatures(spark)), nPlanes = 8, l1Threshold = 0.004)

  val q90MediaNearDupSql: String = {
    val dim = graft.multimodal.MediaOps.FeatureDim
    val bucket = graft.functions.VecFns.ddbRhpBucket("features", dim, 8)
    val l1 = graft.functions.VecFns.ddbL1("a.features", "b.features", dim)
    s"""WITH RECURSIVE f AS (
       |  SELECT media_id, kind, features, $bucket AS bucket
       |  FROM read_parquet('$P5Stage/*.parquet')
       |),
       |cand AS (
       |  SELECT a.media_id AS va, b.media_id AS vb
       |  FROM f a JOIN f b
       |    ON a.bucket = b.bucket AND a.kind = b.kind AND a.media_id < b.media_id
       |  WHERE $l1 < CASE WHEN a.kind = 'audio' THEN 0.001 ELSE 0.004 END
       |),
       |bi AS (
       |  SELECT va AS s, vb AS t FROM cand
       |  UNION
       |  SELECT vb AS s, va AS t FROM cand
       |),
       |reach(s, t) AS (
       |  SELECT s, t FROM bi
       |  UNION
       |  SELECT r.s, bi.t FROM reach r JOIN bi ON r.t = bi.s
       |)
       |SELECT v.media_id, v.kind,
       |  least(v.media_id, coalesce(min(r.t), v.media_id)) AS canonical_id,
       |  v.media_id <> least(v.media_id, coalesce(min(r.t), v.media_id)) AS is_duplicate
       |FROM f v LEFT JOIN reach r ON r.s = v.media_id
       |GROUP BY v.media_id, v.kind""".stripMargin
  }

  val p5MediaFeaturesSql: String = {
    val bucket = graft.functions.VecFns.ddbRhpBucket("features",
      graft.multimodal.MediaOps.FeatureDim, 8)
    s"""SELECT media_id, kind, n_bytes,
       |  $bucket AS bucket,
       |  array_to_string(list_transform(features,
       |    x -> round(x::DOUBLE * 10000)::BIGINT::VARCHAR), ',') AS feat_q
       |FROM read_parquet('$P5Stage/*.parquet')""".stripMargin
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_weight_weekly" -> (p1Weight _),
    "p2_sensor_merge" -> (p2SensorMerge _),
    "p3_electricity_15min" -> (p3Electricity _),
    "p4_job_report" -> (p4JobReport _),
    "p5_media_features" -> (p5MediaFeatures _),
    "q51_sensor_merge_unioned" -> (q51SensorMergeUnioned _),
    "q90_media_neardup" -> (q90MediaNearDup _)
  )

  /** DuckDB oracles for every pipeline. p1 stages its EAV rows as VALUES;
    * p4/p5 stage their non-SQL decode outputs (MIME blocks, media
    * features) as parquet during the Spark run — the decode stages stay
    * spec-proven (golden/differential), the relational tails become
    * driver-proven. */
  def sql: Map[String, String] = {
    // per-entry guard: p2's SQL is derived from the reference fixture dir
    // at build time — if that dir is missing, drop just the affected
    // oracles (driver downgrades them to rows-only) instead of failing
    // the whole oracle dump.
    def entry(k: String, v: => String): Option[(String, String)] =
      try Some(k -> v)
      catch { case e: Throwable =>
        System.err.println(s"[oracle] $k unavailable: ${e.getMessage}"); None
      }
    (entry("p1_weight_weekly", p1WeightSql) ++
      entry("p2_sensor_merge", p2SensorMergeSql) ++
      entry("p3_electricity_15min", p3ElectricitySql) ++
      entry("p4_job_report", p4JobReportSql) ++
      entry("p5_media_features", p5MediaFeaturesSql) ++
      entry("q51_sensor_merge_unioned", p2SensorMergeSql) ++
      entry("q90_media_neardup", q90MediaNearDupSql)).toMap
  }
}
