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

  /** Single-maintainer lease for the swap-based maintenance passes
    * ([[foldIngestBatches]], [[IncrementalIvf.retrain]]): two concurrent
    * maintainers on one store can destroy the only intact copy — caller B's
    * crash-recovery branch sees caller A's parked `__folded_old` while A is
    * between its two renames and deletes it. `FileSystem.createNewFile` is
    * atomic on HDFS and local FS, so exactly one caller wins the marker.
    * A CRASHED maintainer leaves the marker behind by design (fail-stop):
    * the operator confirms no maintenance process is live, then calls
    * [[breakLease]] before rerunning — the rerun's recovery branch restores
    * the store.
    *
    * LOCK GRANULARITY: maintainers that can touch the WHOLE store (a
    * retrain renames `root` itself) and maintainers that fold one
    * sub-directory must contend on the SAME marker, so every store
    * operator derives its lease from the STORE ROOT (`IncrementalIvf
    * .retrain` and `.compactIndex` both lock `root__maintenance_lock`,
    * not `root/index__...`) — otherwise a retrain can rename the root
    * away mid-fold and the fold's recovery branch resurrects a nested
    * mixed store.
    *
    * BACKEND RESTRICTION: the lease is only sound where `createNewFile`
    * is ATOMIC — HDFS, local FS, and real-filesystem semantics in
    * general. S3-style object stores implement create as a plain PUT
    * (last-writer-wins, no create-exclusive), so two maintainers could
    * both "win" the marker and the destroy-the-only-copy race returns
    * silently; those schemes are rejected loudly here. Run store
    * maintenance against HDFS (or any FS with atomic create) — which is
    * also the only class of FS whose `rename` gives the fail-stop swap
    * its atomicity. */
  private val NonAtomicCreateSchemes =
    Set("s3", "s3a", "s3n", "gs", "oss", "cos", "cosn", "swift", "wasb", "wasbs")

  def acquireLease(fs: org.apache.hadoop.fs.FileSystem, dir: String): Path = {
    // fs.getUri.getScheme, NOT fs.getScheme: the FileSystem base class's
    // getScheme default THROWS UnsupportedOperationException, so an
    // otherwise-fine FS that never overrode it would crash maintenance
    // here; the URI scheme is always available
    val scheme = fs.getUri.getScheme
    require(!NonAtomicCreateSchemes.contains(scheme),
      s"store maintenance lease is unsound on '$scheme' (object-store create " +
        "is not atomic — two maintainers could both win the marker); run maintenance " +
        "against HDFS or another filesystem with atomic create/rename")
    val lock = new Path(dir.stripSuffix("/") + "__maintenance_lock")
    require(fs.createNewFile(lock),
      s"maintenance lease $lock already held — another fold/retrain is live on $dir, " +
        "or a previous one crashed (verify, then Compaction.breakLease and rerun)")
    lock
  }

  /** Remove a stale maintenance lease after a crashed maintainer (see
    * [[acquireLease]]); only call once no maintenance process is live. */
  def breakLease(spark: SparkSession, dir: String): Unit = {
    val lock = new Path(dir.stripSuffix("/") + "__maintenance_lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(lock, false)
    ()
  }

  /** Delete `dir` only when it is empty; a concurrent write that lands
    * mid-call leaves the directory in place instead of crashing. The
    * non-recursive `fs.delete(dir, false)` is NOT safe for this: on a
    * non-empty directory it THROWS IOException (PathIsNotEmptyDirectory
    * on HDFS, "Directory not empty" locally) rather than returning
    * false, so a delete batch landing mid-fold would crash the caller
    * after its swaps — with state already consistent, swallowing the
    * race is the correct outcome (the surviving batch stays visible to
    * the live views and the next compaction applies it). Emptiness check
    * + delete is not atomic, so a writer can still slip between the two
    * calls — hence the additional catch. */
  def deleteIfEmpty(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Boolean =
    try fs.listStatus(dir).isEmpty && fs.delete(dir, false)
    catch {
      case _: java.io.FileNotFoundException => true // already gone
      case _: java.io.IOException           => false // filled mid-call: keep it
    }

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
        val n = s.getPath.getName
        // skip metadata (_SUCCESS, _spark_metadata) AND hidden checksum
        // files (.part-*.crc) — LocalFileSystem writes the latter, and
        // counting them as data would make an all-zero-row store look
        // non-empty to the fold's bytes > 0 gate
        if (!n.startsWith("_") && !n.startsWith(".")) total += s.getLen
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
    * sibling temp dir and swaps in by a FAIL-STOP two-rename protocol:
    * `dir` → `dir__folded_old`, then `dir__folding` → `dir` (a crash
    * between the renames leaves `dir` MISSING — reads fail loudly
    * instead of serving a half-swapped store — and the next fold call
    * restores the intact pre-fold copy from `__folded_old` before doing
    * anything else; the old delete-then-rename left the same missing-dir
    * window with no recovery path).
    *
    * `lockDir` is the lease target (default: `dir` itself). Store
    * operators whose root has OTHER maintainers (a retrain that renames
    * the whole root) must pass the STORE ROOT here so all maintenance on
    * the store contends on one marker — see [[acquireLease]].
    *
    * `transform` rewrites the folded frame before it lands — the hook
    * delete-aware folds purge tombstoned rows through
    * ([[IncrementalIvfPq.compactIndex]], [[IncrementalDedup
    * .compactStore]]). The transform receives the store rows with their
    * ORIGINAL `ingest_batch` values and is responsible for the OUTPUT
    * `ingest_batch` values (the default maps every row to the base −1).
    * Row-level tombstone semantics need the original batch twice: the
    * purge predicate compares a row's batch against its doc's tombstone
    * batch, and SURVIVORS of a superseded doc must KEEP their original
    * batch in the folded output — folding them to −1 while their
    * tombstone is still on disk (the crash window between swap and
    * tombstone truncation) would make the liveness filter re-kill them,
    * and a re-run of the fold would purge them permanently. Keeping the
    * batch makes purge + truncation IDEMPOTENT: a stale tombstone
    * re-applies as a no-op, and the kept rows fold to −1 on the next
    * pass once the tombstone is gone. Returns TRUE iff the swap
    * actually happened (an empty store — before OR after the transform
    * — is a no-op and returns false), so a caller with post-fold
    * bookkeeping (tombstone truncation) knows whether its transform was
    * applied. */
  def foldIngestBatches(spark: SparkSession, dir: String,
                        innerPartCols: Seq[String], rangeCols: Seq[String],
                        schema: Option[org.apache.spark.sql.types.StructType] = None,
                        targetBytes: Long = 128L << 20,
                        lockDir: Option[String] = None,
                        transform: DataFrame => DataFrame = FoldToBase): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = acquireLease(fs, lockDir.getOrElse(dir))
    try foldLocked(spark, dir, innerPartCols, rangeCols, schema, targetBytes, p, fs, transform)
    finally { fs.delete(lock, false); () }
  }

  /** [[foldIngestBatches]] WITHOUT lease acquisition — for a caller that
    * already holds the STORE-ROOT lease across several sub-directory
    * folds (e.g. [[IncrementalDedup.compactStore]] folding `bands/`,
    * `sets/` and `edges/` as one maintenance pass: per-fold leases would
    * let another maintainer interleave between the folds). Callers MUST
    * hold a [[acquireLease]] on the store root for the duration. */
  /** The default fold transform: every surviving row lands in the base
    * partition. Custom transforms replace this wholesale and must set
    * `ingest_batch` themselves — see [[foldIngestBatches]]. */
  val FoldToBase: DataFrame => DataFrame =
    _.withColumn("ingest_batch", lit(-1L))

  def foldIngestBatchesLeased(spark: SparkSession, dir: String,
                              innerPartCols: Seq[String], rangeCols: Seq[String],
                              schema: Option[org.apache.spark.sql.types.StructType] = None,
                              targetBytes: Long = 128L << 20,
                              transform: DataFrame => DataFrame = FoldToBase): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    foldLocked(spark, dir, innerPartCols, rangeCols, schema, targetBytes, p, fs, transform)
  }

  private def foldLocked(spark: SparkSession, dir: String,
                         innerPartCols: Seq[String], rangeCols: Seq[String],
                         schema: Option[org.apache.spark.sql.types.StructType],
                         targetBytes: Long, p: Path,
                         fs: org.apache.hadoop.fs.FileSystem,
                         transform: DataFrame => DataFrame): Boolean = {
    val old = new Path(dir.stripSuffix("/") + "__folded_old")
    // crash recovery: a previous fold died between its two renames
    // (store missing, pre-fold copy parked) — restore, then proceed
    if (!fs.exists(p) && fs.exists(old))
      require(fs.rename(old, p), s"fold recovery rename $old -> $p failed")
    else if (fs.exists(old)) fs.delete(old, true) // died after rename 2
    val bytes = treeBytes(spark, dir)
    if (bytes == 0L) return false
    val reader = schema.map(spark.read.schema).getOrElse(spark.read)
    // the transform sees ORIGINAL ingest_batch values and sets the output
    // ones (default: everything → −1) — see the contract on foldIngestBatches
    val df = transform(reader.parquet(dir))
    // zero-ROW guard for both branches: byte-counted part files can hold
    // only parquet footers (zero rows) — rewriting that to a bare dir
    // breaks subsequent schema-less reads of the store. A transform that
    // drops EVERY row (all vectors tombstoned) also lands here: the fold
    // declines (returns false) rather than truncate the store to a bare
    // dir — the caller must then keep its tombstones so reads stay
    // filtered.
    val total = df.count()
    if (total == 0L) return false
    val arranged =
      if (innerPartCols.nonEmpty) {
        // one write task per (inner value, salt): small inner values
        // still consolidate to one file, but a HOT value (skewed LSH
        // bucket, large IVF cell) gets ceil(itsBytes / targetBytes)
        // salt slots instead of funneling through a single task — the
        // per-value width comes from a row-share estimate (one small
        // agg + broadcast join), the salt from a deterministic
        // all-column hash so placement is stable across task retries
        val innerCols = innerPartCols.map(c => col(s"`$c`"))
        val widths = df.groupBy(innerCols: _*)
          .agg(count(lit(1)).as("__rows"))
          .withColumn("__salt_w", greatest(lit(1L),
            ceil(col("__rows").cast("double") * bytes / total / targetBytes).cast("long")))
          .drop("__rows")
        val allColsHash = hash(df.columns.toIndexedSeq.map(c => col(s"`$c`")): _*).cast("long")
        // explicit partition count: a user-specified repartition is NOT
        // re-coalesced by AQE, so the (value, salt) spread survives even
        // when the shuffle is small
        val nTasks = spark.sessionState.conf.numShufflePartitions
        df.join(broadcast(widths), innerPartCols)
          .withColumn("__salt", pmod(allColsHash, col("__salt_w")))
          .repartition(nTasks, (innerCols :+ col("__salt")): _*)
          .drop("__salt", "__salt_w")
      } else {
        val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        df.repartitionByRange(nFiles, rangeCols.map(c => col(s"`$c`")): _*)
      }
    val tmp = dir.stripSuffix("/") + "__folding"
    arranged.write.mode("overwrite")
      .partitionBy(("ingest_batch" +: innerPartCols): _*).parquet(tmp)
    // Hadoop rename reports most failures by returning FALSE (and renaming
    // onto an existing dir would nest the source inside it) — an unchecked
    // false here is exactly the mixed-store state the fail-stop protocol
    // exists to prevent, so each rename is require()'d loud
    require(fs.rename(p, old), s"fold swap rename $p -> $old failed")
    require(fs.rename(new Path(tmp), p), s"fold swap rename $tmp -> $p failed")
    fs.delete(old, true)
    true
  }

  /** SINGLE-RENAME batch commit — the reader-consistency primitive the
    * incremental stores ingest through: stage `df` as a sibling of
    * `table` (`table__staging_<batchId>`, partitioned by
    * `innerPartCols`; the batch level itself comes from the committed
    * directory name, so the on-disk layout matches a
    * `partitionBy(partCol, innerPartCols…)` write exactly), then commit
    * with ONE atomic rename to `table/<partCol>=<batchId>`. A reader
    * listing the table concurrently sees the whole batch or none of it;
    * the dynamic-partition-overwrite commit this replaces renamed one
    * staged dir per (batch, innerValue) pair, exposing torn subsets of
    * a batch mid-commit (ConcurrentIngestSpec drives the guarantee).
    *
    * Replays replace their own batch: an existing target is deleted
    * before the rename (a concurrent reader may transiently miss the
    * REPLAYED batch — pre-replay rows, never a mix — until the commit
    * restores it). A crash mid-stage leaves only the staging sibling,
    * which the next attempt deletes before writing; a crash between
    * delete and rename re-runs under at-least-once delivery. */
  def commitBatch(spark: SparkSession, table: String, df: DataFrame,
                  partCol: String, batchId: Long,
                  innerPartCols: Seq[String] = Nil): Unit = {
    val p = new Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new Path(s"${table.stripSuffix("/")}__staging_$batchId")
    val target = new Path(s"${table.stripSuffix("/")}/$partCol=$batchId")
    if (fs.exists(staged)) fs.delete(staged, true) // crashed prior attempt
    val w = df.write.mode("overwrite")
    (if (innerPartCols.nonEmpty) w.partitionBy(innerPartCols: _*) else w)
      .parquet(staged.toString)
    if (!fs.exists(p)) {
      // distinguish "genuinely fresh table" from "a fold renamed the table
      // away mid-swap": the fold's fail-stop window parks the pre-fold
      // copy as `table__folded_old`, so its presence means a maintenance
      // swap is in flight — recreating the dir here would make the fold's
      // rename(tmp, p) nest the new store INSIDE the recreated dir
      // (Hadoop rename-into-existing-dir semantics): silent corruption
      // where the safe-point contract violation should fail loudly.
      require(!fs.exists(new Path(table.stripSuffix("/") + "__folded_old")),
        s"table $table is missing but its __folded_old sibling exists — a fold " +
          "swap is in flight (or crashed mid-swap); ingest during maintenance " +
          "violates the safe-point contract. Re-run the fold to recover first.")
      fs.mkdirs(p) // first batch of a genuinely fresh table
    }
    if (fs.exists(target)) fs.delete(target, true) // replay replaces its batch
    require(fs.rename(staged, target),
      s"batch commit rename $staged -> $target failed")
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
