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

  /** Corpus-derived bucket count — the write-time scale knob made a
    * derivation (the `kFor`/`lshBitsFor` pattern): one bucket per
    * ~`targetRowsPerBucket` rows of the LARGER side, floored at 16.
    * A count pinned at 16 is the silent scale wall the sf100 sweep
    * measured (q55: 37M rows/task on 16 of 32 cores, per-task sort
    * spill, 99.8 s); at 600M rows this derives 300 buckets (~2M-row,
    * tens-of-MB files — healthy parquet sizes), and on a 1000-executor
    * cluster the same rule lands in the thousands. Both join sides must
    * be written with the SAME derived count (Spark only elides the
    * exchange for equal bucket counts), so derive from the larger side
    * once and reuse. */
  def bucketsFor(rows: Long, targetRowsPerBucket: Long = 2000000L): Int =
    math.max(16L, (rows + targetRowsPerBucket - 1) / targetRowsPerBucket)
      .min(1 << 16).toInt

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
