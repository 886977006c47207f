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

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_bucketed_join" -> (q55BucketedJoin _)
  )

  def sql: Map[String, String] = Map(
    "q55_bucketed_join" -> q55BucketedJoinSql
  )
}
