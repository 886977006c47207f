package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the unglamorous operator every long-running
  * ingest needs: streaming/incremental writers leave thousands of tiny
  * files per partition, and at 100 TB the resulting per-file open/footer
  * overhead (plus driver-side listing) dominates scan cost long before
  * the data does. Compaction rewrites a directory into ≈`targetBytes`
  * files.
  *
  * File count is derived from the ACTUAL on-disk bytes (not row counts —
  * compression ratios vary wildly across columns), so the operator is
  * self-tuning: `ceil(dirBytes / targetBytes)`. The rewrite uses
  * `repartition(n)` (round-robin) for size balance; pass `sortCols` to
  * restore/keep a clustering (then `repartitionByRange` + local sort, so
  * compaction composes with [[ZOrder]]-style layouts instead of
  * destroying them).
  *
  * The write goes to a sibling temp dir first and swaps in atomically-ish
  * (rename) so a failed compaction never leaves the directory truncated.
  */
object Compaction {

  /** Total bytes of data files under `dir` (non-recursive parquet dirs). */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
  }

  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite `dir` into ≈`targetBytes` parquet files. Returns the new
    * file count. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
              sortCols: Seq[String] = Nil): Int = {
    val bytes = dirBytes(spark, dir)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val arranged =
      if (sortCols.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    val tmp = dir.stripSuffix("/") + "__compacting"
    arranged.write.mode("overwrite").parquet(tmp)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.rename(new Path(tmp), p)
    dataFileCount(spark, dir)
  }
}
