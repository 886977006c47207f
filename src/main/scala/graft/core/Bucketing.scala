package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support — the shuffle-free co-located join path for
  * repeatedly-joined big tables (builder spec: "bucketing for co-located
  * joins"; SURVEY §4: at 100 TB the lineitem⋈orders shuffle is the one
  * big exchange, and bucketing both sides on the join key removes it
  * from every downstream query).
  *
  * Parquet bucketing is metastore-backed: `bucketBy` requires
  * `saveAsTable`. Reading the saved tables back, a join on the bucket
  * key plans as SortMergeJoin over the co-located buckets with NO
  * Exchange on either side (asserted in BucketingSpec).
  */
object Bucketing {

  /** Save as a bucketed (and sorted-within-bucket) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket-load the two big fact tables of the testdata star schema.
    * One-time shuffle cost; every later orderkey join is exchange-free. */
  def bucketFacts(spark: SparkSession, dir: String, buckets: Int = 32): Unit = {
    writeBucketed(Tables.lineitem(spark, dir), "lineitem_b", "l_orderkey", buckets)
    writeBucketed(Tables.orders(spark, dir), "orders_b", "o_orderkey", buckets)
  }

  /** The co-located join: both sides read bucket-aligned. */
  def colocatedJoin(spark: SparkSession): DataFrame = {
    val li = spark.table("lineitem_b")
    val o = spark.table("orders_b")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
  }
}
