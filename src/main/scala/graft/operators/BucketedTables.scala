package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage for co-located big-big joins.
  *
  * At 100 TB the dominant cost of a fact⨝fact equi-join is shuffling both
  * sides on the key. Writing each side `bucketBy(n, key)` once amortizes
  * that shuffle into the write: every later join on the key reads
  * bucket i of each side into the same task — a SortMergeJoin with NO
  * Exchange on either side (PlanQualitySpec asserts this). The classic
  * Spark deployment pattern for repeatedly-joined tables (lineitem ⨝
  * orders every night): pay the partitioning once, join shuffle-free
  * forever after.
  *
  * `sortBy(key)` inside each bucket also drops the per-task Sort before
  * the merge join when Spark can prove one file per bucket.
  *
  * Bucket COUNT is the scale knob: it bounds per-task input size
  * (buckets ≈ data size / target partition size) and is fixed at write
  * time — both sides must agree (Spark joins tables with equal bucket
  * counts without exchange; a mismatch re-shuffles the smaller side).
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted managed table unless it already
    * exists in this session's catalog (idempotent per session — repeated
    * queries reuse the layout, which is the point of bucketing). */
  def ensureBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      df.write
        .bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .option("path", s"${sys.props("java.io.tmpdir")}/graft_bucketed/$table")
        .saveAsTable(table)
    }
  }

  /** Co-located equi-join of two tables previously written via
    * [[ensureBucketed]] with the same bucket count. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))
  }
}
