package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.ExactDecimal

/** Relational queries over the testdata star schema, one per operator
  * family in SURVEY.md §2. Each has a DuckDB-oracle SQL twin in `sql`.
  *
  * Conventions for oracle parity (driver hash-compares after sorting
  * columns by name):
  *  - every computed column is aliased identically on both sides;
  *  - aggregates over doubles are rounded to a fixed scale so fp
  *    summation-order noise cannot flip the hash;
  *  - every query output is deterministic (explicit tiebreaks);
  *  - raw `events.ts` (parquet ns) is never emitted — Spark truncates to
  *    µs, DuckDB keeps ns; always `date_trunc` or epoch-µs it.
  *
  * Scale notes (100 TB design): dimension joins are broadcast; windows
  * are always partitioned by a key (never a global `Window.orderBy`);
  * aggregations rely on Catalyst's partial/final split.
  */
object CoreQueries {

  // ---------------------------------------------------------------- 2.4 aggs

  /** TPC-H Q1-shaped pricing summary: groupBy multi-agg with partial
    * aggregation (map-side combine).
    * Ref behavior: utils/duckdb_electricity_1-minute.py:163-172 (multi-agg).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        // price·(1−disc) in exact 10^-4 units; see ExactDecimal
        sum(ExactDecimal.cents(col("l_extendedprice"))
          * (lit(100L) - ExactDecimal.cents(col("l_discount")))).as("disc4"),
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"), col("sum_base_price"),
        ExactDecimal.halfUpRatio(col("disc4"), lit(10000L), 2).as("sum_disc_price"),
        ExactDecimal.halfUpRatio(col("qty_sum"), col("count_order"), 4).as("avg_qty"),
        col("count_order"))

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  round(sum(l_quantity), 2) AS sum_qty,
       |  round(sum(l_extendedprice), 2) AS sum_base_price,
       |  ${ExactDecimal.ddbHalfUpRatio(
             s"sum(${ExactDecimal.ddbCents("l_extendedprice")} * (100 - ${ExactDecimal.ddbCents("l_discount")}))",
             "10000", 2)} AS sum_disc_price,
       |  ${ExactDecimal.ddbHalfUpRatio("sum(l_quantity::BIGINT)", "count(*)", 4)} AS avg_qty,
       |  count(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Star-schema join chain with broadcast dims: revenue per nation in one
    * region (TPC-H Q5 shape). Ref analogue: the year/BST broadcast join,
    * utils/duckdb_electricity_1-minute.py:54.
    * Scale: customer/nation/region are tiny → `broadcast()`; the
    * lineitem⋈orders join shuffles on orderkey (the only big shuffle).
    */
  def q2JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(r("r_name") === "EUROPE")
      .groupBy("n_name")
      .agg(sum(ExactDecimal.cents(col("l_extendedprice"))
             * (lit(100L) - ExactDecimal.cents(col("l_discount")))).as("rev4"),
           count(lit(1)).as("n_lines"))
      .select(col("n_name"),
        ExactDecimal.halfUpRatio(col("rev4"), lit(10000L), 2).as("revenue"),
        col("n_lines"))
  }

  val q2JoinAggSql: String =
    s"""SELECT n_name,
       |  ${ExactDecimal.ddbHalfUpRatio(
             s"sum(${ExactDecimal.ddbCents("l_extendedprice")} * (100 - ${ExactDecimal.ddbCents("l_discount")}))",
             "10000", 2)} AS revenue,
       |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |GROUP BY n_name""".stripMargin

  /** DISTINCT projection (SURVEY §2.4: SELECT DISTINCT year).
    * Ref: utils/duckdb_electricity_1-minute.py:21-23. */
  def q3Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).as("order_year"), col("o_orderstatus"))
      .distinct()

  val q3DistinctSql: String =
    """SELECT DISTINCT year(o_orderdate) AS order_year, o_orderstatus
      |FROM orders""".stripMargin

  /** Conditional aggregation (SUM(CASE WHEN)) per group.
    * Ref: utils/duckdb_electricity_1-minute.py:112-121. */
  def q4CondAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        sum(when(col("value") > 10.0, 1).otherwise(0)).as("n_big"),
        sum(when(col("value") <= 10.0, 1).otherwise(0)).as("n_small"),
        round(sum(when(col("value") > 10.0, col("value")).otherwise(0.0)), 2).as("big_value_sum"),
        count(lit(1)).as("n"))

  val q4CondAggSql: String =
    """SELECT event_type,
      |  sum(CASE WHEN value > 10.0 THEN 1 ELSE 0 END)::BIGINT AS n_big,
      |  sum(CASE WHEN value <= 10.0 THEN 1 ELSE 0 END)::BIGINT AS n_small,
      |  round(sum(CASE WHEN value > 10.0 THEN value ELSE 0.0 END), 2) AS big_value_sum,
      |  count(*) AS n
      |FROM events
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- 2.3 joins

  /** Anti join — incremental-sync "skip already processed" pattern.
    * Ref: utils/20251223-weight-for-streamlit.py:144,155. */
  def q5AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  val q5AntiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin

  /** Semi join — EXISTS. Completes the join-type surface. */
  def q6SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val s  = Tables.supplier(spark, dir)
    val li = Tables.lineitem(spark, dir)
    s.join(li.filter(col("l_quantity") > 45.0), s("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
  }

  val q6SemiJoinSql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 45.0)""".stripMargin

  /** Full-outer join + coalesce — the heart of the sensor merge
    * (utils/20251223-csv-to-separate-sensors-polars.py:156-201): two
    * per-minute series aligned on their union of keys, missing filled. */
  def q7FullOuterCoalesce(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("minute", date_trunc("minute", col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("minute").agg(count(lit(1)).as("click_n"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("minute").agg(count(lit(1)).as("view_n"))
    clicks.join(views, Seq("minute"), "full_outer")
      .select(col("minute"),
        coalesce(col("click_n"), lit(0L)).as("click_n"),
        coalesce(col("view_n"), lit(0L)).as("view_n"),
        (coalesce(col("click_n"), lit(0L)) + coalesce(col("view_n"), lit(0L))).as("total_n"))
  }

  val q7FullOuterCoalesceSql: String =
    """WITH clicks AS (
      |  SELECT date_trunc('minute', ts)::TIMESTAMP AS minute, count(*) AS click_n
      |  FROM events WHERE event_type = 'click' GROUP BY 1
      |), views AS (
      |  SELECT date_trunc('minute', ts)::TIMESTAMP AS minute, count(*) AS view_n
      |  FROM events WHERE event_type = 'view' GROUP BY 1
      |)
      |SELECT coalesce(clicks.minute, views.minute) AS minute,
      |  coalesce(click_n, 0) AS click_n,
      |  coalesce(view_n, 0) AS view_n,
      |  coalesce(click_n, 0) + coalesce(view_n, 0) AS total_n
      |FROM clicks FULL OUTER JOIN views ON clicks.minute = views.minute""".stripMargin

  // ------------------------------------------------------------- 2.5 windows

  /** LEAD delta per partition key — the electricity next-reading delta
    * (utils/duckdb_electricity_1-minute.py:60-69), re-keyed by user so the
    * window is NOT a single global partition (SURVEY §7.4 item 8).
    */
  def q8WindowLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("next_value", lead("value", 1).over(w))
      .withColumn("next_ts", lead("ts", 1).over(w))
      .filter(col("next_ts").isNotNull)
      .select(
        col("user_id"), col("event_id"),
        round(col("next_value") - col("value"), 4).as("value_delta"),
        (unix_micros(col("next_ts")) - unix_micros(col("ts"))).as("gap_us"))
  }

  val q8WindowLeadSql: String =
    """SELECT user_id, event_id,
      |  round(next_value - value, 4) AS value_delta,
      |  epoch_us(next_ts) - epoch_us(ts) AS gap_us
      |FROM (
      |  SELECT user_id, event_id, ts, value,
      |    lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
      |    lead(ts)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      |  FROM events
      |) WHERE next_ts IS NOT NULL""".stripMargin

  /** Rolling mean over a row frame per key — the 28-day trendline
    * (utils/20251223-weight-for-streamlit.py:300-310) expressed as a
    * partitioned rows-frame (deterministic for the oracle; the
    * time-range variant lives in WeightPipeline). */
  def q9RollingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        round(avg("value").over(w), 4).as("rolling_avg7"))
  }

  val q9RollingAvgSql: String =
    """SELECT user_id, event_id,
      |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS rolling_avg7
      |FROM events""".stripMargin

  /** Dedupe-keep-last via row_number — sensor duplicate-timestamp rule
    * (utils/20251223-csv-to-separate-sensors.py:75). */
  def q10DedupKeepLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "value")
  }

  val q10DedupKeepLastSql: String =
    """SELECT user_id, event_type, event_id, value
      |FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) WHERE rn = 1""".stripMargin

  // ---------------------------------------------------- 2.6 sorts / limits

  /** Top-N by recency with deterministic tiebreak —
    * utils/20251223-weight-for-streamlit.py:272-276. */
  def q11TopN(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  val q11TopNSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------- 2.7 set ops

  /** Union + distinct — master-cache append
    * (utils/20251223-weight-for-streamlit.py:176) made set-semantic. */
  def q12Union(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val a = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey", "c_nationkey")
    val b = c.filter(col("c_acctbal") > 5000.0).select("c_custkey", "c_nationkey")
    a.unionByName(b).distinct()
  }

  val q12UnionSql: String =
    """SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |UNION
      |SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000.0""".stripMargin

  // ------------------------------------------------------------- 2.4 pivot

  /** Pivot long→wide with a pinned value set — the EAV pivot
    * (utils/20251223-weight-for-streamlit.py:256-261). Values pinned for a
    * deterministic schema (SURVEY §7.4 item 7); `first` replaced by an
    * order-independent agg for oracle determinism. */
  def q13Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum("value"), 2))
      .na.fill(0.0, Seq("click", "error", "purchase", "signup", "view"))

  val q13PivotSql: String =
    """SELECT user_id,
      |  coalesce(round(sum(CASE WHEN event_type = 'click'    THEN value END), 2), 0.0) AS click,
      |  coalesce(round(sum(CASE WHEN event_type = 'error'    THEN value END), 2), 0.0) AS error,
      |  coalesce(round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2), 0.0) AS purchase,
      |  coalesce(round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2), 0.0) AS signup,
      |  coalesce(round(sum(CASE WHEN event_type = 'view'     THEN value END), 2), 0.0) AS view
      |FROM events
      |GROUP BY user_id""".stripMargin

  // ----------------------------------------------------------- registry

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_join_agg" -> (q2JoinAgg _),
    "q3_distinct" -> (q3Distinct _),
    "q4_cond_agg" -> (q4CondAgg _),
    "q5_anti_join" -> (q5AntiJoin _),
    "q6_semi_join" -> (q6SemiJoin _),
    "q7_full_outer_coalesce" -> (q7FullOuterCoalesce _),
    "q8_window_lead" -> (q8WindowLead _),
    "q9_rolling_avg" -> (q9RollingAvg _),
    "q10_dedup_keep_last" -> (q10DedupKeepLast _),
    "q11_topn" -> (q11TopN _),
    "q12_union" -> (q12Union _),
    "q13_pivot" -> (q13Pivot _)
  )

  def sql: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q2_join_agg" -> q2JoinAggSql,
    "q3_distinct" -> q3DistinctSql,
    "q4_cond_agg" -> q4CondAggSql,
    "q5_anti_join" -> q5AntiJoinSql,
    "q6_semi_join" -> q6SemiJoinSql,
    "q7_full_outer_coalesce" -> q7FullOuterCoalesceSql,
    "q8_window_lead" -> q8WindowLeadSql,
    "q9_rolling_avg" -> q9RollingAvgSql,
    "q10_dedup_keep_last" -> q10DedupKeepLastSql,
    "q11_topn" -> q11TopNSql,
    "q12_union" -> q12UnionSql,
    "q13_pivot" -> q13PivotSql
  )
}
