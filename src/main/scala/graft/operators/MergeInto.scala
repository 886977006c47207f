package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch MERGE (CDC upsert) — the Delta/Iceberg `MERGE INTO` semantics as
  * one composable operator: apply a change set to a base snapshot keyed by
  * `key`, where each change row carries `op` ∈ {'I','U','D'} plus the full
  * payload. Matched `U` rows take the change payload, matched `D` rows are
  * dropped, `I` rows are appended; unmatched base rows pass through.
  *
  * Precondition (same as Delta's MERGE): at most ONE change row per key —
  * multiple matches make the result order-dependent, so upstream CDC
  * compaction (e.g. [[graft.operators.TemporalOps.dedupeKeepLast]] on the
  * change stream) must run first. ENFORCED, like Delta's
  * multiple-source-rows-matched error: a duplicated key in the change set
  * fails the merge job loudly (lazy `raise_error` riding the existing
  * plan — no extra driver action) instead of silently fanning out base
  * rows into a corrupted snapshot.
  *
  * 100 TB shape: ONE key-keyed shuffle join (the change set is
  * delta-sized, so Spark broadcasts it under the threshold — the steady
  * state of a CDC ingest); the insert branch anti-joins the key column
  * only. No full-table rewrite logic here by design — pair with
  * partition-level dynamic overwrite (the
  * [[IncrementalDedup.ingestBatch]] recipe) to localize the physical
  * write at scale.
  */
object MergeInto {

  /** Returns the merged snapshot with a `merge_status` column
    * ('kept' | 'updated' | 'inserted'). `changes` must contain `key`,
    * `op`, and every column in `payload`; `base` must not carry the
    * reserved `op` / `_chg_*` names (they would be ambiguous after the
    * join — checked eagerly so the error is actionable).
    *
    * `I` means insert-IF-ABSENT (Delta's `whenNotMatched`): an insert
    * whose key already exists in the base is a no-op, which makes the
    * whole merge idempotent — re-applying the same change set yields the
    * same snapshot. That property is what lets [[applyStream]] survive an
    * at-least-once foreachBatch replay. */
  def merge(base: DataFrame, changes: DataFrame, key: String,
            payload: Seq[String]): DataFrame = {
    require(!base.columns.contains("op") && !base.columns.exists(_.startsWith("_chg_")),
      "base must not contain reserved columns 'op' or '_chg_*' — rename them before merging")
    // duplicate-key guard: wrap `op` so any change row whose key appears
    // more than once raises when evaluated. Every downstream branch reads
    // `op` (the D-filter, the U-case, the I-filter), so no duplicate can
    // slip through either path; the window shuffles only the delta-sized
    // change set.
    val dupW = org.apache.spark.sql.expressions.Window.partitionBy(key)
    val guarded = changes.withColumn("op",
      when(count(lit(1)).over(dupW) > 1,
        raise_error(concat(
          lit("MERGE precondition violated: multiple change rows for key "),
          col(key).cast("string"),
          lit(" — compact the CDC batch (e.g. TemporalOps.dedupeKeepLast) first"))))
        .otherwise(col("op")))
    val ch = guarded.select(
      col(key) +: col("op") +: payload.map(c => col(c).as(s"_chg_$c")): _*)
    val survivors = base.join(ch, Seq(key), "left")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col(key) +:
        payload.map(c => when(col("op") === "U", col(s"_chg_$c")).otherwise(col(c)).as(c)) :+
        when(col("op") === "U", lit("updated")).otherwise(lit("kept")).as("merge_status"): _*)
    val inserts = guarded.filter(col("op") === "I")
      .join(base.select(col(key)), Seq(key), "left_anti")
      .select(col(key) +: payload.map(col) :+ lit("inserted").as("merge_status"): _*)
    survivors.unionByName(inserts)
  }

  // ------------------------------------------------- versioned snapshots
  //
  // The snapshot is a directory of immutable versions plus an atomically-
  // flipped pointer — the minimal table-format commit protocol:
  //
  //   root/v0/  v1/  v2/ ...   immutable parquet versions (job-committed,
  //                            so a complete version has _SUCCESS)
  //   root/_latest             one-line pointer file naming the current
  //                            version; replaced via write-temp + rename
  //
  // Every crash window is recoverable:
  //  - crash while writing v(n+1): pointer still names vn; the replayed
  //    batch overwrites the partial v(n+1) (merge is deterministic).
  //  - crash after v(n+1) commits but before the pointer flip: pointer
  //    names vn; the replay re-merges from vn, producing identical
  //    content (merge is idempotent), then flips.
  //  - crash between pointer delete and rename: no pointer exists;
  //    [[currentVersion]] falls back to the highest version WITH a
  //    _SUCCESS marker — v(n+1), which is complete by construction
  //    (the pointer is only touched after the version commit).
  // All paths go through the Hadoop FileSystem API, so the snapshot can
  // live on any scheme (file:, hdfs:, s3a:, the spec's memfs:) — no
  // java.io.File assumptions.

  private def fsOf(spark: SparkSession, path: String) =
    graft.core.HadoopFs.of(spark, path)._1

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v")) name.drop(1).toLongOption else None

  /** The committed version the snapshot currently points at: the
    * `_latest` pointer if present AND parseable, else the highest `v<N>`
    * directory with a `_SUCCESS` job-commit marker. None = no snapshot
    * yet. The fallback also covers a torn pointer write (empty/truncated
    * `_latest` — close() gives no fsync ordering guarantee) and the
    * read-during-flip race (the pointer vanishing between exists and
    * open) — treating either as "no committed snapshot" would make the
    * next batch silently restart from an empty base. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val pointer = new Path(s"$root/_latest")
    val viaPointer: Option[Long] =
      try {
        if (!fs.exists(pointer)) None
        else {
          val in = fs.open(pointer)
          val line = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
          versionOf(line)
        }
      } catch { case _: java.io.FileNotFoundException => None }
    viaPointer.orElse {
      if (fs.exists(new Path(root)))
        fs.listStatus(new Path(root)).toSeq
          .filter(st => st.isDirectory && fs.exists(new Path(st.getPath, "_SUCCESS")))
          .flatMap(st => versionOf(st.getPath.getName))
          .maxOption
      else None
    }
  }

  /** The current snapshot contents, or None before the first commit.
    * RETENTION CONTRACT: the returned frame is lazy and its version
    * directory is pruned two commits later — consume it before applying
    * further batches, or persist it first. */
  def readSnapshot(spark: SparkSession, root: String): Option[DataFrame] =
    currentVersion(spark, root).map(v => spark.read.parquet(s"$root/v$v"))

  /** Streaming CDC apply: every micro-batch of change rows is MERGEd into
    * the versioned snapshot at `root`. Restart safety = [[merge]]'s
    * idempotence + the versioned commit protocol above: at-least-once
    * foreachBatch delivery yields an exactly-once snapshot, and no crash
    * window can lose committed data.
    *
    * This is the copy-on-write simple form (full snapshot rewrite per
    * batch) — at 100 TB pair it with a partitioned snapshot and dynamic
    * partition overwrite so each batch rewrites only the partitions its
    * keys touch (the [[IncrementalDedup.ingestBatch]] recipe). */
  def applyStream(changes: DataFrame, root: String, key: String,
                  payload: Seq[String], checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) applyBatch(batch, root, key, payload)
      }
      .start()

  /** One CDC batch against the versioned snapshot (shared by the stream
    * and direct callers). Keeps the previous version for the crash-
    * recovery fallback and prunes everything older. */
  def applyBatch(batch: DataFrame, root: String, key: String,
                 payload: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val cur = currentVersion(spark, root)
    val base = cur.map(v => spark.read.parquet(s"$root/v$v")).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        batch.select(col(key) +: payload.map(col): _*).schema))
    val next = cur.getOrElse(-1L) + 1
    merge(base, batch, key, payload).drop("merge_status")
      .write.mode("overwrite").parquet(s"$root/v$next")
    val fs = fsOf(spark, root)
    // atomic pointer flip: single-file rename (atomic on POSIX and HDFS;
    // object stores without atomic rename still recover via the
    // _SUCCESS-scan fallback, since the version commit precedes the flip)
    val tmp = new Path(s"$root/_latest.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"v$next".getBytes("UTF-8")) finally out.close()
    val pointer = new Path(s"$root/_latest")
    fs.delete(pointer, false)
    require(fs.rename(tmp, pointer),
      s"pointer flip failed renaming $tmp -> $pointer; snapshot remains " +
        s"readable via the _SUCCESS fallback, but investigate the FileSystem")
    // prune versions older than the previous one (kept for the fallback)
    fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory && versionOf(st.getPath.getName).exists(_ < next - 1))
      .foreach(st => fs.delete(st.getPath, true))
    ()
  }
}
