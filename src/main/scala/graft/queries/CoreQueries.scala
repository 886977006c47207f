package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational queries over the testdata star schema, one per operator
  * family in SURVEY.md §2. Each has a DuckDB-oracle SQL twin in `sql`.
  *
  * Conventions for oracle parity (driver hash-compares after sorting
  * columns by name):
  *  - every computed column is aliased identically on both sides;
  *  - aggregates over doubles are rounded to a fixed scale so fp
  *    summation-order noise cannot flip the hash;
  *  - every query output is deterministic (explicit tiebreaks).
  */
object CoreQueries {

  /** TPC-H Q1-shaped pricing summary: groupBy multi-agg with partial
    * aggregation (map-side combine) — SURVEY §2.4.
    * Ref behavior: utils/duckdb_electricity_1-minute.py:163-172 (multi-agg).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, d) => q1Agg(s, d))
  )

  def sql: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
