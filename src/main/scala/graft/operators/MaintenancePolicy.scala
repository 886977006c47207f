package graft.operators

/** Opt-in maintenance policy for the LIVE streaming operating mode
  * (VERDICT r13 ask #5): without one, `dedupeStream`/`ingestStream`
  * deployments accumulate one `ingest_batch=N` partition per micro-batch
  * forever — compaction, drift checks, and retrains were manual calls
  * someone had to remember. The policy runs them INSIDE foreachBatch,
  * under the stores' existing store-root lease, at batch-count cadences.
  *
  * Safe-point discipline (the part a naive in-stream compaction gets
  * wrong): when the body for batch N runs, batches ≤ N−1 have COMMITTED
  * offsets (Structured Streaming starts N only after N−1 commits) but N
  * itself has NOT — and on a crash-replay, a stale partition for N can
  * already exist on disk. An unbounded fold would merge that uncommitted
  * partition into the base, and the replayed ingest would then write its
  * rows AGAIN next to the folded copy. The policy therefore uses the
  * BOUNDED folds ([[IncrementalDedup.compactStoreBounded]] /
  * [[IncrementalIvfPq.compactIndexBounded]]): partitions with
  * `ingest_batch >= N` pass through the rewrite byte-for-byte in their
  * own partition (so a replay's dynamic overwrite replaces exactly them),
  * only committed batches fold to the base.
  *
  * A held lease (another maintainer live on the store) SKIPS the policy
  * pass rather than failing the stream — opportunistic maintenance
  * defers to explicit maintenance; the next eligible batch retries.
  *
  * @param compactEveryBatches    fold committed ingest partitions into the
  *                               base every K processed batches (0 = never)
  * @param driftCheckEveryBatches measure [[IncrementalIvfPq
  *                               .assignmentDrift]] of the just-ingested
  *                               delta every K batches (0 = never;
  *                               IVF stores only)
  * @param onDrift                called with (batchId, drift) after each
  *                               drift check — wire it to alerting or a
  *                               retrain scheduler; retrain itself renames
  *                               the store root and must run at an offline
  *                               safe point, never inside foreachBatch
  */
final case class MaintenancePolicy(
    compactEveryBatches: Int = 0,
    driftCheckEveryBatches: Int = 0,
    onDrift: (Long, Double) => Unit = (_, _) => ()) {

  def compactDue(batchId: Long): Boolean =
    compactEveryBatches > 0 && (batchId + 1) % compactEveryBatches == 0

  def driftDue(batchId: Long): Boolean =
    driftCheckEveryBatches > 0 && (batchId + 1) % driftCheckEveryBatches == 0
}

object MaintenancePolicy {
  /** The default: no in-stream maintenance — byte-identical behavior to
    * the policy-free streams every existing gate pins. */
  val Off: MaintenancePolicy = MaintenancePolicy()
}
