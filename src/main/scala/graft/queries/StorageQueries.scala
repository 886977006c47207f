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

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_bucketed_join" -> (q55BucketedJoin _),
    "q56_bloom_pruned_join" -> (q56BloomPrunedJoin _)
  )

  def sql: Map[String, String] = Map(
    "q55_bucketed_join" -> q55BucketedJoinSql,
    "q56_bloom_pruned_join" -> q56BloomPrunedJoinSql
  )
}
