package graft.operators

import org.apache.spark.sql.DataFrame
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
  * change stream) must run first.
  *
  * 100 TB shape: ONE key-keyed shuffle join (the change set is
  * delta-sized, so Spark broadcasts it under the threshold — the steady
  * state of a CDC ingest); the insert branch is a union, not a join. No
  * full-table rewrite logic here by design — pair with partition-level
  * dynamic overwrite (the [[IncrementalDedup.ingestBatch]] recipe) to
  * localize the physical write at scale.
  */
object MergeInto {

  /** Returns the merged snapshot with a `merge_status` column
    * ('kept' | 'updated' | 'inserted'). `changes` must contain `key`,
    * `op`, and every column in `payload`.
    *
    * `I` means insert-IF-ABSENT (Delta's `whenNotMatched`): an insert
    * whose key already exists in the base is a no-op, which makes the
    * whole merge idempotent — re-applying the same change set yields the
    * same snapshot. That property is what lets [[applyStream]] survive an
    * at-least-once foreachBatch replay. */
  def merge(base: DataFrame, changes: DataFrame, key: String,
            payload: Seq[String]): DataFrame = {
    val ch = changes.select(
      col(key) +: col("op") +: payload.map(c => col(c).as(s"_chg_$c")): _*)
    val survivors = base.join(ch, Seq(key), "left")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col(key) +:
        payload.map(c => when(col("op") === "U", col(s"_chg_$c")).otherwise(col(c)).as(c)) :+
        when(col("op") === "U", lit("updated")).otherwise(lit("kept")).as("merge_status"): _*)
    val inserts = changes.filter(col("op") === "I")
      .join(base.select(col(key)), Seq(key), "left_anti")
      .select(col(key) +: payload.map(col) :+ lit("inserted").as("merge_status"): _*)
    survivors.unionByName(inserts)
  }

  /** Streaming CDC apply: every micro-batch of change rows is MERGEd into
    * the parquet snapshot at `snapshotPath` (written via a staging-dir
    * swap — the [[FileStoreSync.sync]] recipe — because the new snapshot
    * is a lazy read of the old one). Restart safety follows from
    * [[merge]]'s idempotence: a replayed batch re-applies to the
    * already-merged snapshot and changes nothing, so at-least-once
    * foreachBatch delivery yields an exactly-once snapshot.
    *
    * This is the copy-on-write simple form (full snapshot rewrite per
    * batch) — at 100 TB pair it with a partitioned snapshot and dynamic
    * partition overwrite so each batch rewrites only the partitions its
    * keys touch (the [[IncrementalDedup.ingestBatch]] recipe). */
  def applyStream(changes: DataFrame, snapshotPath: String, key: String,
                  payload: Seq[String], checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) applyBatch(batch, snapshotPath, key, payload)
      }
      .start()

  /** One CDC batch against the parquet snapshot (shared by the stream
    * and direct callers). */
  def applyBatch(batch: DataFrame, snapshotPath: String, key: String,
                 payload: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val base =
      if (new java.io.File(snapshotPath).exists()) spark.read.parquet(snapshotPath)
      else batch.sparkSession.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        batch.select(col(key) +: payload.map(col): _*).schema)
    val merged = merge(base, batch, key, payload).drop("merge_status")
    val tmp = snapshotPath + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(snapshotPath)
    deleteRecursively(new java.io.File(tmp))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
