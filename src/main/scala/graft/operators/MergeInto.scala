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
    * `op`, and every column in `payload`. */
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
      .select(col(key) +: payload.map(col) :+ lit("inserted").as("merge_status"): _*)
    survivors.unionByName(inserts)
  }
}
