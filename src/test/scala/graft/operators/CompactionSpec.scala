package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  import spark.implicits._

  test("compaction collapses a many-tiny-files directory, preserving the row multiset") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // simulate an incremental writer: 32 separate appends → ≥32 files
    graft.core.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
      .repartition(32)
      .write.mode("overwrite").parquet(dir)
    val before = Compaction.dataFileCount(spark, dir)
    assert(before >= 32)
    val totalBytes = Compaction.dirBytes(spark, dir)
    val expected = spark.read.parquet(dir)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq

    val after = Compaction.compact(spark, dir, targetBytes = totalBytes / 4 + 1)
    assert(after <= 6, s"expected ~4 files, got $after")
    val got = spark.read.parquet(dir)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(got == expected, "compaction must not change the data")
  }

  test("compaction with sortCols keeps the clustering (per-file spans stay tight)") {
    val dir = java.nio.file.Files.createTempDirectory("compactsort").toString + "/t"
    graft.core.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
      .repartition(32) // destroys any order
      .write.mode("overwrite").parquet(dir)
    val bytes = Compaction.dirBytes(spark, dir)
    val n = Compaction.compact(spark, dir, targetBytes = bytes / 4 + 1, sortCols = Seq("l_orderkey"))
    assert(n >= 2)
    val rd = spark.read.parquet(dir).withColumn("f", input_file_name())
    val global = rd.agg((max("l_orderkey") - min("l_orderkey")).cast("double")).head().getDouble(0)
    val avgSpan = rd.groupBy("f")
      .agg((max("l_orderkey") - min("l_orderkey")).cast("double").as("d"))
      .agg(avg("d")).head().getDouble(0)
    assert(avgSpan / global < 0.6,
      f"range-compacted files must stay clustered, avg span ${avgSpan / global}%.2f of range")
  }

  test("fold crash mid-swap is fail-stop AND recoverable: parked copy restored, fold completes") {
    val base = java.nio.file.Files.createTempDirectory("foldcrash").toString + "/t"
    val df = (0L until 100L).map(i => (i, i % 4, 7L)).toDF("id", "band_bucket", "ingest_batch")
    df.write.partitionBy("ingest_batch", "band_bucket").parquet(base)
    val expected = spark.read.parquet(base).select("id").collect().map(_.getLong(0)).sorted.toSeq
    // simulate a crash between rename 1 and rename 2: store missing,
    // pre-fold copy parked under __folded_old
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(base),
      new org.apache.hadoop.fs.Path(base + "__folded_old"))
    intercept[Exception](spark.read.parquet(base).count()) // fail-stop, loud
    // the next fold call recovers, then folds
    Compaction.foldIngestBatches(spark, base,
      innerPartCols = Seq("band_bucket"), rangeCols = Nil)
    val got = spark.read.parquet(base).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected, "recovery + fold must preserve the row multiset")
    assert(spark.read.parquet(base).filter(col("ingest_batch") =!= -1L).count() == 0,
      "all rows folded into the base partition")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base + "__folded_old")))
  }

  test("fold splits a HOT inner partition across files per targetBytes (no single-task funnel)") {
    val base = java.nio.file.Files.createTempDirectory("foldhot").toString + "/t"
    // one hot bucket (0) with ~95% of rows, three cold ones
    val rows = (0L until 20000L).map(i => (i, if (i % 20 == 0) 1L + i % 3 else 0L, 1L))
    rows.toDF("id", "band_bucket", "ingest_batch")
      .write.partitionBy("ingest_batch", "band_bucket").parquet(base)
    val bytes = Compaction.treeBytes(spark, base)
    Compaction.foldIngestBatches(spark, base,
      innerPartCols = Seq("band_bucket"), rangeCols = Nil,
      targetBytes = bytes / 8 + 1) // force multi-file widths for the hot bucket
    val perBucket = spark.read.parquet(base)
      .withColumn("f", input_file_name())
      .groupBy("band_bucket").agg(countDistinct("f").as("nf")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    assert(perBucket(0L) > 1,
      s"hot bucket must split across files, got ${perBucket(0L)}")
    assert((perBucket - 0L).values.forall(_ == 1L),
      s"cold buckets stay single-file: $perBucket")
    assert(spark.read.parquet(base).count() == 20000)
  }

  test("maintenance lease: a held lock fails the second fold loudly; breakLease clears it") {
    val base = java.nio.file.Files.createTempDirectory("foldlease").toString + "/t"
    val df = (0L until 50L).map(i => (i, i % 2, 3L)).toDF("id", "band_bucket", "ingest_batch")
    df.write.partitionBy("ingest_batch", "band_bucket").parquet(base)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // maintainer A is mid-fold: its lease marker is on disk
    val lock = Compaction.acquireLease(fs, base)
    assert(fs.exists(lock))
    val e = intercept[IllegalArgumentException] {
      Compaction.foldIngestBatches(spark, base, innerPartCols = Seq("band_bucket"), rangeCols = Nil)
    }
    assert(e.getMessage.contains("lease"), s"second maintainer must fail on the lease: $e")
    // store untouched by the refused maintainer
    assert(spark.read.parquet(base).count() == 50)
    // operator breaks the stale lease after a crash; the rerun proceeds
    Compaction.breakLease(spark, base)
    Compaction.foldIngestBatches(spark, base, innerPartCols = Seq("band_bucket"), rangeCols = Nil)
    assert(spark.read.parquet(base).filter(col("ingest_batch") =!= -1L).count() == 0)
    assert(!fs.exists(lock), "lease released after a successful fold")
  }

  test("fold of an all-zero-row store is a no-op (crc files don't count as data)") {
    val base = java.nio.file.Files.createTempDirectory("foldzero").toString + "/t"
    // a partition whose part files hold only footers: zero rows, nonzero
    // bytes (written directly into the partition dir — a partitionBy write
    // of an empty frame emits nothing at all)
    (0L until 10L).map(i => Tuple1(i)).toDF("id")
      .filter(col("id") < 0) // empty, but schema-bearing
      .write.parquet(base + "/ingest_batch=5")
    Compaction.foldIngestBatches(spark, base, innerPartCols = Nil, rangeCols = Seq("id"))
    // schema-less read still works — the store was NOT rewritten to a bare dir
    assert(spark.read.parquet(base).count() == 0)
    assert(spark.read.parquet(base).columns.contains("id"))
  }

  test("failed-looking state never truncates: temp dir is separate until rename") {
    // contract check: compact() writes to <dir>__compacting then swaps —
    // after success the temp dir is gone and the target exists
    val base = java.nio.file.Files.createTempDirectory("compactswap").toString + "/t"
    Seq((1L, 2.0), (3L, 4.0)).toDF("k", "v").write.parquet(base)
    Compaction.compact(spark, base, targetBytes = Long.MaxValue)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(base + "__compacting")))
    assert(spark.read.parquet(base).count() == 2)
  }
}
