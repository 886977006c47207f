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

  /** Z-order clustering key (the layout operator's arithmetic, driver-
    * proven): min/max-scale l_partkey and l_suppkey to 16 bits each and
    * Morton-interleave them. [[graft.operators.ZOrder.writeZOrdered]]
    * range-partitions + sorts on this key; ZOrderSpec proves the written
    * layout bounds every dimension's per-file span (the property parquet
    * min/max skipping needs). Integer bit arithmetic on IEEE-exact scaled
    * ranks — DuckDB reproduces z-values bit-identically. */
  def q57ZOrder(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ZOrder.withZ(
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Seq("l_partkey", "l_suppkey"), bits = 16)
      .select(col("l_orderkey"), col("l_linenumber"), col("z").as("zval"))

  val q57ZOrderSql: String =
    """WITH s AS (
      |  SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
      |         min(l_suppkey) AS mns, max(l_suppkey) AS mxs
      |  FROM lineitem
      |),
      |scaled AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN mxp = mnp THEN 0 ELSE floor((l_partkey - mnp)::DOUBLE * 65535 / (mxp - mnp)::DOUBLE)::BIGINT END AS sp,
      |    CASE WHEN mxs = mns THEN 0 ELSE floor((l_suppkey - mns)::DOUBLE * 65535 / (mxs - mns)::DOUBLE)::BIGINT END AS ss
      |  FROM lineitem, s
      |)
      |SELECT l_orderkey, l_linenumber,
      |  list_sum(list_transform(range(16), b ->
      |    (((sp >> b) & 1) << (b * 2)) + (((ss >> b) & 1) << (b * 2 + 1))))::BIGINT AS zval
      |FROM scaled""".stripMargin

  /** Incremental aggregate maintenance — the nightly-ETL algebra: keep a
    * materialized partial-aggregate state (key, sum, count), aggregate
    * only the newly-arrived delta, and MERGE (union + re-aggregate of the
    * partials) instead of recomputing history. Sums and counts are
    * commutative monoids, so merged state ≡ full recompute — which is
    * exactly what the oracle asserts: the DuckDB side is the blind full
    * recompute over all rows. At 100 TB the delta path reads one day, not
    * five years; the merge shuffles `keys × 2` partial rows, not data. */
  def q58IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val cut = "1999-01-01"
    def partial(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("o_orderpriority")
      .agg(
        sum(ExactDecimal.cents(col("o_totalprice"))).as("tp_cents"),
        count(lit(1)).as("n_orders"))
    val o = Tables.orders(spark, dir)
    val state = partial(o.filter(col("o_orderdate") < cut))  // the stored MV
    val delta = partial(o.filter(col("o_orderdate") >= cut)) // today's batch
    state.unionByName(delta)
      .groupBy("o_orderpriority")
      .agg(sum("tp_cents").as("tp_cents"), sum("n_orders").as("n_orders"))
  }

  val q58IncrementalAggSql: String =
    s"""SELECT o_orderpriority,
       |  sum(${ExactDecimal.ddbCents("o_totalprice")})::BIGINT AS tp_cents,
       |  count(*)::BIGINT AS n_orders
       |FROM orders
       |GROUP BY 1""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_bucketed_join" -> (q55BucketedJoin _),
    "q56_bloom_pruned_join" -> (q56BloomPrunedJoin _),
    "q57_zorder" -> (q57ZOrder _),
    "q58_incremental_agg" -> (q58IncrementalAgg _)
  )

  def sql: Map[String, String] = Map(
    "q55_bucketed_join" -> q55BucketedJoinSql,
    "q56_bloom_pruned_join" -> q56BloomPrunedJoinSql,
    "q57_zorder" -> q57ZOrderSql,
    "q58_incremental_agg" -> q58IncrementalAggSql
  )
}
