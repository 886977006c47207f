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
