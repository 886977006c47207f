package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{ExactDecimal, TimeFns}

/** Whole-pipeline compositions over the testdata tables — each query is a
  * reference pipeline's full operator chain (not a single operator), with a
  * DuckDB oracle twin.
  *
  * q34 is the electricity pipeline of SURVEY §7.2 end-to-end: BST→UTC shift,
  * LEAD deltas, 1-minute grid explode, peak classification, per-interval
  * rate allocation (window, not the reference's self-join), end-labeled
  * 15-minute buckets. Re-keyed by user_id so every window is partitioned —
  * the single-partition global window of the reference (SURVEY §7.4 item 8)
  * never appears.
  *
  * Scale notes: the only shuffles are the per-user window and the final
  * bucket aggregation; the year→BST-boundary table is always tiny →
  * broadcast. The grid explode multiplies rows ~interval-minutes× but is
  * generated distributed (no driver materialization).
  */
object PipelineQueries {

  /** Electricity pipeline end-to-end (ref: utils/duckdb_electricity_1-minute.py:5-173).
    * Events are spread across 12 months (event_id % 12) so the BST shift has
    * both GMT and BST rows; `value` plays the cumulative counter, its LEAD
    * delta allocated over the interval's peak/off-peak minutes.
    */
  def q34ElectricityE2e(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("ts2", col("ts") + expr("make_interval(0, CAST(event_id % 12 AS INT))"))
    val yrs = ev.select(year(col("ts2")).as("yr")).distinct()
      .withColumn("bst_start", TimeFns.bstStart(col("yr")))
      .withColumn("bst_end", TimeFns.bstEnd(col("yr")))
    val utc = ev.join(broadcast(yrs), year(col("ts2")) === col("yr"))
      .withColumn("utc", TimeFns.localToUtc(col("ts2"), col("bst_start"), col("bst_end")))
    val w = Window.partitionBy("user_id").orderBy("utc", "event_id")
    val deltas = utc
      // pin the window/explode chain's width: AQE's byte-based coalescing
      // ran the LEAD window + grid explode 2-wide at gate SFs (0.6 s, the
      // dominant warm stage — StageProbe r15). hash(user_id) is exactly
      // the window's required distribution, so this replaces (not adds)
      // the window's exchange, and the per-interval window + explode
      // downstream cluster by (user_id, utc) ⊇ user_id — no new shuffle.
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("user_id"))
      .withColumn("vc", round(col("value") * 100).cast("long"))
      .withColumn("next_utc", lead("utc", 1).over(w))
      .withColumn("delta_c", lead("vc", 1).over(w) - col("vc"))
      .filter(col("next_utc") >= col("utc") + expr("INTERVAL 1 MINUTE")
        && col("next_utc") <= col("utc") + expr("INTERVAL 6 HOURS"))
    val grid = deltas.select(col("user_id"), col("utc"), col("delta_c"),
        explode(sequence(col("utc") + expr("INTERVAL 1 MINUTE"), col("next_utc"),
          expr("INTERVAL 1 MINUTE"))).as("m"))
      .withColumn("cat", TimeFns.peakCategory(col("m")))
    // per-interval minute counts via window — replaces the reference's
    // interval_counts self-join (duckdb_electricity_1-minute.py:112-142).
    // Rate allocation is exact-integer: `value` is a 2-decimal quantity, so
    // deltas are whole cents; per-minute rates are half-up-rounded micro-
    // cents (integer ops only) and bucket sums stay exact longs — a double
    // sum of cent-rationals lands exactly on round-half boundaries where
    // Spark's and DuckDB's last fp bit disagree.
    val wc = Window.partitionBy("user_id", "utc")
    val rates = grid
      .withColumn("p_mins", sum(when(col("cat") === "P", 1).otherwise(0)).over(wc))
      .withColumn("op_mins", sum(when(col("cat") === "OP", 1).otherwise(0)).over(wc))
      .withColumn("sgn", when(col("delta_c") < 0, lit(-1L)).otherwise(lit(1L)))
      .withColumn("pv_u", when(col("cat") === "P" && col("p_mins") > 0,
        col("sgn") * expr("(abs(delta_c) * 1000000 * 2 + p_mins) div (2 * p_mins)")))
      .withColumn("ov_u", when(col("cat") === "OP" && col("op_mins") > 0,
        col("sgn") * expr("(abs(delta_c) * 1000000 * 2 + op_mins) div (2 * op_mins)")))
    rates.withColumn("bucket", TimeFns.timeBucket15EndLabeled(col("m")))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_minutes"),
        (sum("pv_u") / 1e8).as("p_usage"),
        (sum("ov_u") / 1e8).as("op_usage"))
  }

  val q34ElectricityE2eSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, value,
      |    ts::TIMESTAMP + to_months((event_id % 12)::INT) AS ts2
      |  FROM events
      |),
      |yrs AS (
      |  SELECT DISTINCT year(ts2) AS yr,
      |    (last_day(make_date(year(ts2), 3, 1))
      |       - INTERVAL 1 DAY * dayofweek(last_day(make_date(year(ts2), 3, 1))))::TIMESTAMP
      |       + INTERVAL 1 HOUR AS bst_start,
      |    (last_day(make_date(year(ts2), 10, 1))
      |       - INTERVAL 1 DAY * dayofweek(last_day(make_date(year(ts2), 10, 1))))::TIMESTAMP
      |       + INTERVAL 2 HOUR AS bst_end
      |  FROM ev
      |),
      |utc AS (
      |  SELECT event_id, user_id, value,
      |    CASE WHEN ts2 >= bst_start AND ts2 < bst_end
      |         THEN ts2 - INTERVAL 1 HOUR ELSE ts2 END AS utc
      |  FROM ev JOIN yrs ON year(ts2) = yr
      |),
      |deltas AS (
      |  SELECT user_id, utc,
      |    lead(utc) OVER (PARTITION BY user_id ORDER BY utc, event_id) AS next_utc,
      |    lead(round(value*100)::BIGINT) OVER (PARTITION BY user_id ORDER BY utc, event_id)
      |      - round(value*100)::BIGINT AS delta_c
      |  FROM utc
      |),
      |grid AS (
      |  SELECT user_id, utc, delta_c,
      |    unnest(generate_series(utc + INTERVAL 1 MINUTE, next_utc, INTERVAL 1 MINUTE)) AS m
      |  FROM deltas
      |  WHERE next_utc >= utc + INTERVAL 1 MINUTE AND next_utc <= utc + INTERVAL 6 HOUR
      |),
      |cat AS (
      |  SELECT user_id, utc, delta_c, m,
      |    CASE WHEN m::TIME > TIME '06:30:00' AND m::TIME <= TIME '23:30:00'
      |         THEN 'P' ELSE 'OP' END AS cat
      |  FROM grid
      |),
      |rates AS (
      |  SELECT m, cat, delta_c,
      |    CASE WHEN delta_c < 0 THEN -1 ELSE 1 END AS sgn,
      |    sum(CASE WHEN cat = 'P'  THEN 1 ELSE 0 END) OVER (PARTITION BY user_id, utc) AS p_mins,
      |    sum(CASE WHEN cat = 'OP' THEN 1 ELSE 0 END) OVER (PARTITION BY user_id, utc) AS op_mins
      |  FROM cat
      |)
      |SELECT time_bucket(INTERVAL '15 minutes', m - INTERVAL 1 MINUTE) AS bucket,
      |  count(*) AS n_minutes,
      |  sum(CASE WHEN cat = 'P' AND p_mins > 0
      |           THEN sgn * ((abs(delta_c) * 1000000 * 2 + p_mins) // (2 * p_mins)) END) / 1e8 AS p_usage,
      |  sum(CASE WHEN cat = 'OP' AND op_mins > 0
      |           THEN sgn * ((abs(delta_c) * 1000000 * 2 + op_mins) // (2 * op_mins)) END) / 1e8 AS op_usage
      |FROM rates
      |GROUP BY 1""".stripMargin

  /** Sensor-merge conflict semantics (ref: utils/20251223-csv-to-separate-sensors.py:
    * 108-121,186-194): two per-(user,minute) series full-outer aligned,
    * missing filled by coalesce, a conflict flagged only when BOTH sides
    * are present AND differ beyond tolerance — the conflict value
    * materialized as its own column (the `!A! col` analogue).
    *
    * The per-minute mean is computed as ExactDecimal.halfUpRatio over
    * summed cents, never `round(avg(double))`: avg = cents/(100n) lands
    * exactly on a 7-decimal half boundary whenever n = 2^a·5^b ≥ 32 with
    * an odd cent sum, where Spark's binary-double round and DuckDB's
    * decimal round disagree (the q34/quality_score failure mode). */
  def q35SensorConflict(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("minute", date_trunc("minute", col("ts")))
    def exactAvg6(as: String) =
      ExactDecimal.halfUpRatio(
        sum(ExactDecimal.cents(col("value"))), count(lit(1)) * lit(100L), 6).as(as)
    val a = ev.filter(col("event_id") % 2 === 0)
      .groupBy("user_id", "minute").agg(exactAvg6("val_a"))
    val b = ev.filter(col("event_id") % 2 === 1)
      .groupBy("user_id", "minute").agg(exactAvg6("val_b"))
    a.join(b, Seq("user_id", "minute"), "full_outer")
      .withColumn("merged", coalesce(col("val_a"), col("val_b")))
      .withColumn("is_conflict",
        col("val_a").isNotNull && col("val_b").isNotNull
          && abs(col("val_a") - col("val_b")) > lit(1e-5))
      .withColumn("conflict_value", when(col("is_conflict"), col("val_b")))
      .select("user_id", "minute", "merged", "is_conflict", "conflict_value")
  }

  val q35SensorConflictSql: String =
    s"""WITH ev AS (
      |  SELECT user_id, date_trunc('minute', ts)::TIMESTAMP AS minute, event_id, value
      |  FROM events
      |),
      |a AS (SELECT user_id, minute,
      |        ${ExactDecimal.ddbHalfUpRatio(s"sum(${ExactDecimal.ddbCents("value")})", "count(*) * 100", 6)} AS val_a
      |      FROM ev WHERE event_id % 2 = 0 GROUP BY 1, 2),
      |b AS (SELECT user_id, minute,
      |        ${ExactDecimal.ddbHalfUpRatio(s"sum(${ExactDecimal.ddbCents("value")})", "count(*) * 100", 6)} AS val_b
      |      FROM ev WHERE event_id % 2 = 1 GROUP BY 1, 2)
      |SELECT coalesce(a.user_id, b.user_id) AS user_id,
      |  coalesce(a.minute, b.minute) AS minute,
      |  coalesce(val_a, val_b) AS merged,
      |  val_a IS NOT NULL AND val_b IS NOT NULL AND abs(val_a - val_b) > 1e-5 AS is_conflict,
      |  CASE WHEN val_a IS NOT NULL AND val_b IS NOT NULL AND abs(val_a - val_b) > 1e-5
      |       THEN val_b END AS conflict_value
      |FROM a FULL OUTER JOIN b ON a.user_id = b.user_id AND a.minute = b.minute""".stripMargin

  /** ROLLUP hierarchy totals — beyond the reference's flat GROUP BYs;
    * Catalyst expands to grouping sets with one shuffle. */
  def q36Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"))

  val q36RollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** The 28-day rolling trendline as a true time-RANGE window (ref:
    * utils/20251223-weight-for-streamlit.py:300-310 `window='28D'`),
    * partitioned per user. Frame bounds in exact epoch-µs so both engines
    * agree on membership; the mean is computed in exact integer cents with
    * half-up rounding to 4 decimals (cent-valued inputs make a double
    * `avg` land exactly on round-half boundaries — see q34 note). */
  def q37RangeTrendline(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(-28L * 86400L * 1000000L, 0L)
    Tables.events(spark, dir)
      .withColumn("vc", round(col("value") * 100).cast("long"))
      .withColumn("s_c", sum("vc").over(w))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sgn", when(col("s_c") < 0, lit(-1L)).otherwise(lit(1L)))
      // trend = S/(100 n) half-up at 4 decimals = sgn·⌊(2·|S|·100 + n) / (2n)⌋ / 1e4
      .withColumn("r", col("sgn") * expr("(abs(s_c) * 100 * 2 + n_win) div (2 * n_win)"))
      .select(col("user_id"), col("event_id"), (col("r") / 1e4).as("trend28d"))
  }

  val q37RangeTrendlineSql: String =
    """WITH t AS (
      |  SELECT user_id, event_id,
      |    sum(round(value*100)::BIGINT) OVER w AS s_c,
      |    count(*) OVER w AS n_win
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 2419200000000 PRECEDING AND CURRENT ROW)
      |)
      |SELECT user_id, event_id,
      |  (CASE WHEN s_c < 0 THEN -1 ELSE 1 END
      |     * ((abs(s_c) * 100 * 2 + n_win) // (2 * n_win))) / 1e4 AS trend28d
      |FROM t""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_electricity_e2e" -> (q34ElectricityE2e _),
    "q35_sensor_conflict" -> (q35SensorConflict _),
    "q36_rollup" -> (q36Rollup _),
    "q37_range_trendline" -> (q37RangeTrendline _)
  )

  def sql: Map[String, String] = Map(
    "q34_electricity_e2e" -> q34ElectricityE2eSql,
    "q35_sensor_conflict" -> q35SensorConflictSql,
    "q36_rollup" -> q36RollupSql,
    "q37_range_trendline" -> q37RangeTrendlineSql
  )
}
