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

  /** Recursive data-file bytes under `dir` (partitioned layouts). */
  def treeBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var total = 0L
      while (it.hasNext) {
        val s = it.next()
        if (!s.getPath.getName.startsWith("_")) total += s.getLen
      }
      total
    }
  }

  /** Recursive parquet data-file count under `dir`. */
  def treeDataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
  }

  /** Fold an `ingest_batch`-partitioned store table into its BASE
    * partition (`ingest_batch=-1`) — the maintenance pass for the
    * incremental stores ([[IncrementalDedup]], [[IncrementalIvf]]):
    * per-micro-batch dynamic overwrites leave one `ingest_batch=N`
    * partition per batch, and after thousands of batches the partition
    * listing + per-file footer overhead dominates scan cost (the classic
    * streaming small-file wall). The fold rewrites ALL rows under the
    * base partition, preserving `innerPartCols` as the inner partition
    * level (so DPP layouts like `band_bucket` survive) and
    * range-clustering data files on `rangeCols`.
    *
    * SAFE-POINT CONTRACT: call only when every folded batch's offset is
    * committed in the streaming checkpoint. A replay of a folded batch id
    * AFTER the fold would dynamic-overwrite a now-empty partition and
    * duplicate its rows next to the base copy. (Batch ids are
    * monotonically increasing per checkpoint, so NEW batches can never
    * collide with folded ones.)
    *
    * Reads with `schema` when given (a zero-row store has no data files
    * to infer from); an empty table is a no-op. The rewrite goes to a
    * sibling temp dir and swaps in by rename, like [[compact]]. */
  def foldIngestBatches(spark: SparkSession, dir: String,
                        innerPartCols: Seq[String], rangeCols: Seq[String],
                        schema: Option[org.apache.spark.sql.types.StructType] = None,
                        targetBytes: Long = 128L << 20): Unit = {
    val bytes = treeBytes(spark, dir)
    if (bytes == 0L) return
    val reader = schema.map(spark.read.schema).getOrElse(spark.read)
    val df = reader.parquet(dir).withColumn("ingest_batch", lit(-1L))
    val arranged =
      if (innerPartCols.nonEmpty)
        // one write task per inner partition value — each inner dir gets
        // a single consolidated file instead of one per folded batch
        df.repartition(innerPartCols.map(c => col(s"`$c`")): _*)
      else {
        val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        df.repartitionByRange(nFiles, rangeCols.map(c => col(s"`$c`")): _*)
      }
    val tmp = dir.stripSuffix("/") + "__folding"
    arranged.write.mode("overwrite")
      .partitionBy(("ingest_batch" +: innerPartCols): _*).parquet(tmp)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.rename(new Path(tmp), p)
    ()
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
