package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{ExactDecimal, TimeFns}

/** Temporal / scalar-function queries (SURVEY §2.8, §7.4): the reference's
  * electricity-pipeline semantics (BST windows, minute-grid explode,
  * end-labeled buckets) and weight-pipeline resampling, re-expressed over
  * the testdata tables with DuckDB oracle twins.
  *
  * Oracle parity notes: Spark `dayofweek` is Sunday=1, DuckDB Sunday=0;
  * DuckDB `date_trunc` on the ns `events.ts` yields TIMESTAMP_NS → every
  * timestamp output in oracle SQL is cast `::TIMESTAMP` (µs) to match
  * Spark's parquet output.
  */
object TimeQueries {

  /** Date-part extraction + month grouping (SURVEY §2.8 date/time). */
  def q14DateParts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
      .withColumn("month_end", last_day(make_date(col("order_year"), col("order_month"), lit(1))).cast("timestamp"))
      .withColumn("quarter", quarter(col("month_end")))

  val q14DatePartsSql: String =
    """SELECT year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
      |  count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  last_day(make_date(year(o_orderdate), month(o_orderdate), 1))::TIMESTAMP AS month_end,
      |  quarter(last_day(make_date(year(o_orderdate), month(o_orderdate), 1))) AS quarter
      |FROM orders
      |GROUP BY 1, 2""".stripMargin

  /** The electricity BST classification re-keyed to orders: per year,
    * derive last-Sunday BST boundaries and count rows in/out of the
    * window. Ref: utils/duckdb_electricity_1-minute.py:21-55 (naive local
    * wall-time rule, NOT a tz conversion — SURVEY §7.4 item 6). */
  def q15BstClassify(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).withColumn("yr", year(col("o_orderdate")))
    val bst = o.select("yr").distinct()
      .withColumn("bst_start", TimeFns.bstStart(col("yr")))
      .withColumn("bst_end", TimeFns.bstEnd(col("yr")))
    o.join(broadcast(bst), Seq("yr"))
      .groupBy(col("yr"), date_trunc("day", col("bst_start")).as("bst_start_day"), date_trunc("day", col("bst_end")).as("bst_end_day"))
      .agg(
        sum(when(col("o_orderdate") >= col("bst_start") && col("o_orderdate") < col("bst_end"), 1).otherwise(0)).as("n_bst"),
        sum(when(col("o_orderdate") < col("bst_start") || col("o_orderdate") >= col("bst_end"), 1).otherwise(0)).as("n_gmt"))
  }

  val q15BstClassifySql: String =
    """WITH bst AS (
      |  SELECT DISTINCT year(o_orderdate) AS yr,
      |    (last_day(make_date(year(o_orderdate), 3, 1))
      |       - INTERVAL 1 DAY * dayofweek(last_day(make_date(year(o_orderdate), 3, 1))))::TIMESTAMP
      |       + INTERVAL 1 HOUR AS bst_start,
      |    (last_day(make_date(year(o_orderdate), 10, 1))
      |       - INTERVAL 1 DAY * dayofweek(last_day(make_date(year(o_orderdate), 10, 1))))::TIMESTAMP
      |       + INTERVAL 2 HOUR AS bst_end
      |  FROM orders
      |)
      |SELECT yr, date_trunc('day', bst_start) AS bst_start_day, date_trunc('day', bst_end) AS bst_end_day,
      |  sum(CASE WHEN o_orderdate >= bst_start AND o_orderdate < bst_end THEN 1 ELSE 0 END)::BIGINT AS n_bst,
      |  sum(CASE WHEN o_orderdate < bst_start OR o_orderdate >= bst_end THEN 1 ELSE 0 END)::BIGINT AS n_gmt
      |FROM orders JOIN bst ON year(o_orderdate) = yr
      |GROUP BY 1, 2, 3""".stripMargin

  /** The 1-minute grid explode (utils/duckdb_electricity_1-minute.py:85-89):
    * per user, explode each ≤6h inter-event interval into minutes and
    * classify peak/off-peak. `explode(sequence(...))` is the distributed
    * replacement for the reference's row loop — the generate side never
    * materializes on the driver. */
  def q16MinuteGrid(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(spark, dir)
      .withColumn("next_ts", lead("ts", 1).over(w))
      .filter(col("next_ts") >= col("ts") + expr("INTERVAL 1 MINUTE"))
      .filter(col("next_ts") <= col("ts") + expr("INTERVAL 6 HOURS"))
    pairs
      // spread the narrow interval rows BEFORE the up-to-360× fanout
      // explode: AQE coalesces the window's tiny-bytes exchange to one
      // partition, which serialized the whole grid expansion + map-side
      // partial agg in a single task (1.3 s, ~100% of the warm wall —
      // StageProbe r15). Same pattern (and rationale comment) as p3's
      // grid-spread; result-invariant — the groupBy below re-shuffles
      // by user_id.
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("user_id"),
        explode(sequence(col("ts") + expr("INTERVAL 1 MINUTE"), col("next_ts"), expr("INTERVAL 1 MINUTE"))).as("m"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_minutes"),
        sum(when(TimeFns.minuteOfDay(col("m")) > 390 && TimeFns.minuteOfDay(col("m")) <= 1410, 1).otherwise(0)).as("n_peak"),
        sum(when(TimeFns.minuteOfDay(col("m")) > 390 && TimeFns.minuteOfDay(col("m")) <= 1410, 0).otherwise(1)).as("n_offpeak"))
  }

  val q16MinuteGridSql: String =
    """WITH pairs AS (
      |  SELECT user_id, ts,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      |  FROM events
      |), grid AS (
      |  SELECT user_id,
      |    unnest(generate_series(ts + INTERVAL 1 MINUTE, next_ts, INTERVAL 1 MINUTE)) AS m
      |  FROM pairs
      |  WHERE next_ts >= ts + INTERVAL 1 MINUTE AND next_ts <= ts + INTERVAL 6 HOUR
      |)
      |SELECT user_id, count(*) AS n_minutes,
      |  sum(CASE WHEN hour(m)*60 + minute(m) > 390 AND hour(m)*60 + minute(m) <= 1410 THEN 1 ELSE 0 END)::BIGINT AS n_peak,
      |  sum(CASE WHEN hour(m)*60 + minute(m) > 390 AND hour(m)*60 + minute(m) <= 1410 THEN 0 ELSE 1 END)::BIGINT AS n_offpeak
      |FROM grid
      |GROUP BY user_id""".stripMargin

  /** End-labeled 15-minute buckets (utils/duckdb_electricity_1-minute.py:
    * 149-172): a minute stamped 07:00 belongs to the 06:45 bucket —
    * SURVEY §7.4 item 3. */
  def q17Bucket15(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("bucket", TimeFns.timeBucket15EndLabeled(col("ts")))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        round(sum("value"), 2).as("value_sum"))

  val q17Bucket15Sql: String =
    """SELECT time_bucket(INTERVAL '15 minutes', ts - INTERVAL 1 MINUTE)::TIMESTAMP AS bucket,
      |  count(*) AS n,
      |  round(sum(value), 2) AS value_sum
      |FROM events
      |GROUP BY 1""".stripMargin

  /** JSON extraction from the events `props` column (SURVEY §2.8 JSON). */
  def q18Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        sum("k").as("k_sum"),
        countDistinct(col("k")).as("k_distinct"),
        sum(col("k").cast("long")).as("k_sum_l"),
        count(col("k")).as("k_n"))
      .select(col("event_type"), col("k_sum"), col("k_distinct"),
        ExactDecimal.halfUpRatio(col("k_sum_l"), col("k_n"), 4).as("k_avg"))

  val q18JsonSql: String =
    s"""SELECT event_type,
       |  sum(json_extract_string(props, '$$.k')::INT)::BIGINT AS k_sum,
       |  count(DISTINCT json_extract_string(props, '$$.k')::INT) AS k_distinct,
       |  ${ExactDecimal.ddbHalfUpRatio(
             "sum(json_extract_string(props, '$.k')::BIGINT)",
             "count(json_extract_string(props, '$.k'))", 4)} AS k_avg
       |FROM events
       |GROUP BY event_type""".stripMargin

  /** String-function battery over part (SURVEY §2.8 string): regex
    * extract/replace, split, case, length, concat. */
  def q19StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
      split(col("p_name"), " ").getItem(0).as("first_word"),
      upper(col("p_name")).as("name_upper"),
      length(col("p_name")).as("name_len"),
      concat_ws("-", col("p_type"), col("p_brand")).as("label"),
      regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
      substring(col("p_name"), 1, 3).as("prefix3"),
      trim(lower(col("p_type"))).as("type_lc"))

  val q19StringFuncsSql: String =
    """SELECT p_partkey,
      |  regexp_extract(p_brand, 'Brand#(\d+)', 1)::INT AS brand_num,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  upper(p_name) AS name_upper,
      |  length(p_name) AS name_len,
      |  concat_ws('-', p_type, p_brand) AS label,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
      |  substring(p_name, 1, 3) AS prefix3,
      |  trim(lower(p_type)) AS type_lc
      |FROM part""".stripMargin

  /** Mixed-format timestamp parsing with errors→null — the reference's
    * pd.to_datetime(format='mixed', errors='coerce')
    * (utils/20251223-weight-for-streamlit.py:249-253). Strings are built
    * in three formats keyed by orderkey, then re-parsed via the
    * try-format chain. */
  def q20MultiFormatTs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("s",
        when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
          .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "dd/MM/yyyy HH:mm:ss"))
          .otherwise(date_format(col("o_orderdate"), "MM/dd/yyyy HH:mm")))
      .select(col("o_orderkey"), col("s"),
        TimeFns.tryToTimestampMulti(col("s"), TimeFns.ReferenceFormats).as("parsed"))

  val q20MultiFormatTsSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |       WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
      |       ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M') END AS s,
      |  coalesce(
      |    try_strptime(CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |                      WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
      |                      ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M') END, '%Y-%m-%d %H:%M:%S'),
      |    try_strptime(CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |                      WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
      |                      ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M') END, '%d/%m/%Y %H:%M:%S'),
      |    try_strptime(CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |                      WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
      |                      ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M') END, '%m/%d/%Y %H:%M'),
      |    try_strptime(CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |                      WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
      |                      ELSE strftime(o_orderdate, '%m/%d/%Y %H:%M') END, '%Y-%m-%d')
      |  ) AS parsed
      |FROM orders""".stripMargin

  /** pandas resample('W-SUN') with right-closed, end-labeled bins
    * (utils/20251223-weight-for-streamlit.py:327-345; SURVEY §7.4 item 4). */
  def q21WeeklyResample(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("week_end", TimeFns.weekEndSunday(to_date(col("ts"))).cast("timestamp"))
      .groupBy("week_end")
      .agg(
        count(lit(1)).as("n"),
        sum(ExactDecimal.cents(col("value"))).as("vc"))
      .select(col("week_end"), col("n"),
        ExactDecimal.halfUpRatio(col("vc"), col("n") * 100, 4).as("avg_value"))

  val q21WeeklyResampleSql: String =
    s"""SELECT (ts::DATE + INTERVAL 1 DAY * ((7 - dayofweek(ts::DATE)) % 7))::TIMESTAMP AS week_end,
       |  count(*) AS n,
       |  ${ExactDecimal.ddbHalfUpRatio(s"sum(${ExactDecimal.ddbCents("value")})", "count(*) * 100", 4)} AS avg_value
       |FROM events
       |GROUP BY 1""".stripMargin

  /** pandas resample('ME') + desc-sorted period-over-period change
    * (weight_change sign convention — SURVEY §7.4 item 5): monthly mean,
    * then current − previous month via lead over the desc order. */
  def q22MonthlyChange(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(last_day(col("o_orderdate")).cast("timestamp").as("month_end"))
      .agg(sum(ExactDecimal.cents(col("o_totalprice"))).as("pc"), count(lit(1)).as("n"))
      .select(col("month_end"),
        ExactDecimal.halfUpRatio(col("pc"), col("n") * 100, 4).as("avg_price"))
    val w = Window.orderBy(col("month_end").desc)
    monthly.withColumn("price_change", round(col("avg_price") - lead("avg_price", 1).over(w), 4))
  }

  val q22MonthlyChangeSql: String =
    s"""WITH monthly AS (
       |  SELECT last_day(o_orderdate)::TIMESTAMP AS month_end,
       |    ${ExactDecimal.ddbHalfUpRatio(s"sum(${ExactDecimal.ddbCents("o_totalprice")})", "count(*) * 100", 4)} AS avg_price
       |  FROM orders GROUP BY 1
       |)
      |SELECT month_end, avg_price,
      |  round(avg_price - lead(avg_price) OVER (ORDER BY month_end DESC), 4) AS price_change
      |FROM monthly""".stripMargin

  /** OHLC-style temporal resample: per (user, hour) the opening/closing
    * values (first/last by (ts, event_id) — explicit tiebreak, since
    * min_by/arg_min tie behavior is engine-defined) and the high/low in
    * exact cents. The downsample family's missing member next to the
    * mean-based resamples (q21/q22). */
  def q50Ohlc(spark: SparkSession, dir: String): DataFrame = {
    val hour_ = date_trunc("hour", col("ts"))
    val wAsc = Window.partitionBy("user_id", "hr").orderBy(col("ts").asc, col("event_id").asc)
    val wDesc = Window.partitionBy("user_id", "hr").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("hr", hour_)
      .withColumn("vc", round(col("value") * 100).cast("long"))
      .withColumn("rn_a", row_number().over(wAsc))
      .withColumn("rn_d", row_number().over(wDesc))
      .groupBy("user_id", "hr")
      .agg(
        max(when(col("rn_a") === 1, col("vc"))).as("open_c"),
        max(when(col("rn_d") === 1, col("vc"))).as("close_c"),
        max("vc").as("high_c"),
        min("vc").as("low_c"),
        count(lit(1)).as("n"))
  }

  val q50OhlcSql: String =
    """WITH t AS (
      |  SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS hr,
      |    round(value*100)::BIGINT AS vc,
      |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |                       ORDER BY ts ASC, event_id ASC) AS rn_a,
      |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |                       ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM events
      |)
      |SELECT user_id, hr,
      |  max(CASE WHEN rn_a = 1 THEN vc END) AS open_c,
      |  max(CASE WHEN rn_d = 1 THEN vc END) AS close_c,
      |  max(vc) AS high_c,
      |  min(vc) AS low_c,
      |  count(*) AS n
      |FROM t
      |GROUP BY 1, 2""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_ohlc" -> (q50Ohlc _),
    "q14_date_parts" -> (q14DateParts _),
    "q15_bst_classify" -> (q15BstClassify _),
    "q16_minute_grid" -> (q16MinuteGrid _),
    "q17_bucket15" -> (q17Bucket15 _),
    "q18_json" -> (q18Json _),
    "q19_string_funcs" -> (q19StringFuncs _),
    "q20_multi_format_ts" -> (q20MultiFormatTs _),
    "q21_weekly_resample" -> (q21WeeklyResample _),
    "q22_monthly_change" -> (q22MonthlyChange _)
  )

  def sql: Map[String, String] = Map(
    "q50_ohlc" -> q50OhlcSql,
    "q14_date_parts" -> q14DatePartsSql,
    "q15_bst_classify" -> q15BstClassifySql,
    "q16_minute_grid" -> q16MinuteGridSql,
    "q17_bucket15" -> q17Bucket15Sql,
    "q18_json" -> q18JsonSql,
    "q19_string_funcs" -> q19StringFuncsSql,
    "q20_multi_format_ts" -> q20MultiFormatTsSql,
    "q21_weekly_resample" -> q21WeeklyResampleSql,
    "q22_monthly_change" -> q22MonthlyChangeSql
  )
}
